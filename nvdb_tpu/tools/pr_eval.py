"""Partition-then-rerank recall/latency eval — the nvdb_hnsw_eval analogue
(apps/nvdb_hnsw_eval.cpp): per-nprobe (efSearch-analogue) timed ANN search,
recall vs exact GT (cached gtbin or built on the fly, untimed), ANN-only and
TOTAL stats."""

from __future__ import annotations

import numpy as np

from nvdb_tpu.eval.harness import run_benchmark
from nvdb_tpu.eval.recall import recall_at_k
from nvdb_tpu.eval.stats import result_line
from nvdb_tpu.formats import gtbin, vecbin
from nvdb_tpu.tools._common import make_parser, setup_jax


def main(argv=None):
    p = make_parser(__doc__)
    p.add_argument("base")
    p.add_argument("query")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--nprobe", type=int, nargs="+", default=[4, 16, 64],
                   help="efSearch-analogue sweep")
    p.add_argument("--nlist", type=int, default=None)
    p.add_argument("--rerank-k", type=int, default=0)
    p.add_argument("--dtype", default="bf16", choices=["f32", "bf16", "i8"])
    p.add_argument("--gt", default=None,
                   help="cached gtbin; omitted = exact GT built on the fly")
    p.add_argument("--batch-q", type=int, default=8)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--tune", type=float, default=None,
                   help="report the smallest nprobe hitting this recall")
    p.add_argument("--shards", type=int, default=1,
                   help=">1: shard partitions over this many devices "
                        "(nprobe becomes the TOTAL across shards)")
    args = p.parse_args(argv)
    setup_jax(args)

    from nvdb_tpu.index.flat import build_ground_truth
    from nvdb_tpu.index.partition import PartitionRerankIndex
    from nvdb_tpu.store import VectorStore

    bf = vecbin.VecbinFile(args.base)
    rows = bf.rows_f32()
    qf = vecbin.VecbinFile(args.query)
    queries = qf.rows_f32()

    idx = PartitionRerankIndex.build(rows, nlist=args.nlist, dtype=args.dtype,
                                     with_refine=args.rerank_k > 0)
    print(f"partitions={idx.ivf.nlist} lcap={idx.ivf.lcap} "
          f"index_MB={idx.index_bytes/1e6:.1f} N={idx.n}")
    kind = "partition-rerank"

    if args.gt:
        info, g = gtbin.read_gtbin(args.gt)
        if info.Q != queries.shape[0] or info.k < args.k:
            raise SystemExit("GT shape mismatch")
        gt_ids = np.asarray(g)
    else:
        # untimed exact GT on the fly (nvdb_hnsw_eval.cpp:151)
        store = VectorStore.from_numpy(rows, "f32")
        gt_ids = build_ground_truth(store, queries, args.k)

    if args.tune is not None:
        best = idx.tune_nprobe(queries, gt_ids, args.k, target_recall=args.tune)
        print(f"tuned nprobe for recall>={args.tune}: {best}")

    if args.shards > 1:
        from nvdb_tpu.dist import mesh as meshmod
        from nvdb_tpu.dist.sharded_ivf import ShardedPartitionIndex

        idx = ShardedPartitionIndex.from_index(
            idx, meshmod.row_mesh(args.shards))
        kind = f"partition-rerank-sharded{args.shards}"

    for np_ in args.nprobe:
        def search_fn(qs, k, np_=np_):
            return idx.search(qs, k, np_, rerank_k=args.rerank_k)

        ids, stats = run_benchmark(search_fn, queries, args.k,
                                   batch_q=args.batch_q, warmup=args.warmup)
        recall = recall_at_k(ids, gt_ids, k=args.k)
        print(f"\n--- nprobe={np_} (rerank_k={args.rerank_k}) ---")
        print(stats.render())
        print(f"recall@{args.k}={recall:.4f}")
        print(result_line(
            kind=kind, nprobe=np_, rerank_k=args.rerank_k,
            Q=queries.shape[0], k=args.k, dtype=args.dtype,
            avg_ms=stats.avg_ms, p99_ms=stats.p99_ms, qps=stats.qps,
            recall=recall, index_mb=idx.index_bytes / 1e6))


if __name__ == "__main__":
    main()
