"""IVF / IVF-PQ / refine eval harness — the nvdb_ivf_eval analogue
(apps/nvdb_ivf_eval.cpp), the reference's most complex app.

Reproduces its methodology: cached-gtbin recall with strict validation
(nvdb_ivf_eval.cpp:355-383), warmup, ANN-vs-total latency split, the
``RESULT key=value ...`` machine-parsable record (lines 729-779), and the
nprobe x refine_k sweep grids (Performance.md:659-689) via repeatable flags.

On TPU there is no H2D/D2H refine staging (candidates are reranked straight
from the HBM store), so the reference's staged/interleaved PIPELINE split
collapses; the refine cost is reported as the ANN-vs-total delta.
"""

from __future__ import annotations

import itertools


import numpy as np

from nvdb_tpu.eval.recall import recall_at_k
from nvdb_tpu.eval.stats import result_line
from nvdb_tpu.formats import gtbin, vecbin
from nvdb_tpu.tools._common import make_parser, setup_jax


def main(argv=None):
    p = make_parser(__doc__)
    p.add_argument("index", help="index .npz from ivf_build")
    p.add_argument("base", help="base vecbin (refine store + GT dims)")
    p.add_argument("query")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--nprobe", type=int, nargs="+", default=[32])
    p.add_argument("--refine-k", type=int, nargs="+", default=[0],
                   help="0 disables refine; sweeps the grid with --nprobe")
    p.add_argument("--gt", default=None, help="cached gtbin (GT_PATH analogue)")
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--batch-q", type=int, default=8)
    p.add_argument("--shards", type=int, default=1,
                   help=">1: shard inverted lists over this many devices "
                        "(ivfflat only; nprobe becomes the TOTAL across shards)")
    args = p.parse_args(argv)
    setup_jax(args)

    from nvdb_tpu.index.ivf_flat import IVFFlatIndex
    from nvdb_tpu.index.ivf_pq import IVFPQIndex
    from nvdb_tpu.store import VectorStore

    # load index (sniff kind from npz contents)
    z = np.load(args.index if args.index.endswith(".npz") else args.index + ".npz")
    is_pq = "codebooks" in z.files
    idx = (IVFPQIndex.load(args.index) if is_pq else IVFFlatIndex.load(args.index))
    kind = "ivfpq" if is_pq else "ivfflat"

    if args.shards > 1:
        if is_pq:
            raise SystemExit("--shards currently supports ivfflat only")
        from nvdb_tpu.dist import mesh as meshmod
        from nvdb_tpu.dist.sharded_ivf import ShardedIVFFlatIndex

        idx = ShardedIVFFlatIndex.from_index(idx, meshmod.row_mesh(args.shards))
        kind = f"ivfflat-sharded{args.shards}"

    qf = vecbin.VecbinFile(args.query)
    queries = qf.rows_f32()
    Q = queries.shape[0]

    gt_ids = None
    if args.gt:
        info, g = gtbin.read_gtbin(args.gt)
        if info.Q != Q or info.k < args.k or info.N != idx.n:
            raise SystemExit(
                f"GT mismatch: gt(Q={info.Q},k={info.k},N={info.N}) vs "
                f"eval(Q={Q},k={args.k},N={idx.n})")
        gt_ids = np.asarray(g)

    refine_store = None
    if max(args.refine_k) > 0:
        refine_store = VectorStore.from_vecbin(args.base)

    print(f"kind={kind} nlist={idx.nlist} lcap={idx.lcap} N={idx.n} d={idx.d} "
          f"Q={Q} k={args.k} index_MB={idx.index_bytes/1e6:.1f}")

    for nprobe, refine_k in itertools.product(args.nprobe, args.refine_k):
        if kind == "ivfflat" and refine_k > 0:
            # the flat payload is already exact — a refine pass would be a
            # no-op; skip the grid point instead of emitting fictitious
            # refine_enabled=1 stats (ADVICE r1)
            continue

        def search_fn(qs, k, nprobe=nprobe, refine_k=refine_k):
            if kind == "ivfpq":
                return idx.search(qs, k, nprobe, refine_k=refine_k,
                                  refine_store=refine_store)
            return idx.search(qs, k, nprobe)

        # ANN-only timing (EVAL_MODE=ann_only analogue)
        def ann_fn(qs, k, nprobe=nprobe):
            return idx.search(qs, k, nprobe)

        from nvdb_tpu.eval.harness import run_benchmark

        ids_ann, ann_stats = run_benchmark(ann_fn, queries, args.k,
                                           batch_q=args.batch_q,
                                           warmup=args.warmup)
        ids, total_stats = run_benchmark(search_fn, queries, args.k,
                                         batch_q=args.batch_q,
                                         warmup=args.warmup)
        recall = recall_at_k(ids, gt_ids, k=args.k) if gt_ids is not None else -1.0

        print(f"\n--- nprobe={nprobe} refine_k={refine_k} ---")
        print("ANN-only:")
        print(ann_stats.render())
        print("TOTAL:")
        print(total_stats.render())
        if recall >= 0:
            print(f"recall@{args.k}={recall:.4f}")
        print(result_line(
            kind=kind, refine_k=refine_k, nprobe=nprobe, Q=Q, k=args.k,
            refine_enabled=int(refine_k > 0), refine_backend="tpu-fused",
            ann_avg_ms=ann_stats.avg_ms, ann_p99_ms=ann_stats.p99_ms,
            total_avg_ms=total_stats.avg_ms, total_p99_ms=total_stats.p99_ms,
            refine_ms_per_q=max(total_stats.avg_ms - ann_stats.avg_ms, 0.0),
            qps=total_stats.qps, recall=recall,
            index_mb=idx.index_bytes / 1e6))


if __name__ == "__main__":
    main()
