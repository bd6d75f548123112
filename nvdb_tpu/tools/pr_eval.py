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
    p.add_argument("--refine-dtype", default="f32",
                   choices=["f32", "res_i8"],
                   help="rerank store: exact f32, or residual-i8 vs the "
                        "partition centroids (4x smaller, near-equal "
                        "ranking — the round-4 residual-store trick)")
    p.add_argument("--gt", default=None,
                   help="cached gtbin; omitted = exact GT built on the fly")
    p.add_argument("--batch-q", type=int, default=8)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--tune", type=float, default=None,
                   help="report the smallest nprobe hitting this recall")
    p.add_argument("--shards", type=int, default=1,
                   help=">1: shard partitions over this many devices "
                        "(nprobe becomes the TOTAL across shards)")
    p.add_argument("--chained", action="store_true",
                   help="serving-shaped timing: pre-staged device query "
                        "blocks, batches chained on-device with no host "
                        "sync (the ivf_eval --chained loop) — the "
                        "like-for-like latency row next to the reference's "
                        "HNSW eval table (Performance.md:450-466)")
    p.add_argument("--wave", type=int, default=0,
                   help="with --chained: fetch every WAVE-th batch so "
                        "per-wave completion timestamps yield rtt-inclusive "
                        "p50/p95/p99")
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
                                     with_refine=args.rerank_k > 0,
                                     refine_dtype=args.refine_dtype)
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

    if args.chained and args.shards > 1:
        raise SystemExit("--chained is the single-device serving loop; "
                         "use ivf_eval --shards for sharded timing")

    for np_ in args.nprobe:
        if args.chained:
            import time as _time

            import jax
            import jax.numpy as jnp

            from nvdb_tpu.eval.stats import compute_stats

            b = max(args.batch_q, 1)
            Q = queries.shape[0]
            dp = idx.ivf.centroids.shape[1]
            n_batches = (Q + b - 1) // b
            blocks = []
            for s in range(n_batches):
                blk = np.zeros((b, dp), np.float32)
                qs = queries[s * b:(s + 1) * b]
                blk[: qs.shape[0], : qs.shape[1]] = qs
                blocks.append(jax.device_put(jnp.asarray(blk)))

            def fused(block, np_=np_):
                return idx.search_device(block, args.k, np_,
                                         rerank_k=args.rerank_k)

            np.asarray(fused(blocks[0])[1])   # compile + warm
            for w in range(min(args.warmup, n_batches)):
                np.asarray(fused(blocks[w])[1])
            t0 = _time.perf_counter()
            outs = []
            wave_ts = [t0]
            for s, x in enumerate(blocks):
                outs.append(fused(x))
                if args.wave > 0 and (s + 1) % args.wave == 0:
                    np.asarray(outs[-1][1])   # rtt-inclusive wave close
                    wave_ts.append(_time.perf_counter())
            np.asarray(outs[-1][1])           # trailing fetch
            dt = _time.perf_counter() - t0
            final_ids = np.concatenate(
                [np.asarray(i)[:, : args.k] for _, i in outs])[:Q]
            recall = recall_at_k(final_ids, gt_ids, k=args.k)
            ms_q = dt * 1000.0 / (n_batches * b)
            extra = {}
            if args.wave > 0 and len(wave_ts) > 2:
                wl = np.diff(np.asarray(wave_ts))[1:] * 1000.0
                ws = compute_stats(list(wl), n_queries=len(wl), batch_q=1)
                extra = dict(wave=args.wave, wave_p50_ms=ws.p50_ms,
                             wave_p95_ms=ws.p95_ms, wave_p99_ms=ws.p99_ms,
                             p99_ms_per_q=ws.p99_ms / (args.wave * b))
            print(f"\n--- nprobe={np_} (rerank_k={args.rerank_k}, "
                  f"chained) ---")
            print(f"recall@{args.k}={recall:.4f}")
            print(result_line(
                kind=kind, nprobe=np_, rerank_k=args.rerank_k,
                Q=Q, k=args.k, dtype=args.dtype,
                refine_dtype=args.refine_dtype, batch_q=b, chained=1,
                total_avg_ms=ms_q, qps=1000.0 / ms_q if ms_q > 0 else 0.0,
                recall=recall, index_mb=idx.index_bytes / 1e6, **extra))
            continue

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
            refine_dtype=args.refine_dtype,
            avg_ms=stats.avg_ms, p99_ms=stats.p99_ms, qps=stats.qps,
            recall=recall, index_mb=idx.index_bytes / 1e6))


if __name__ == "__main__":
    main()
