"""The flat-scan benchmark harness — the nvdb_bench analogue (apps/nvdb_bench.cpp).

CLI shape mirrors the reference's ``base query k [mode] [threads] [warmup]
[batch_q] ...`` (nvdb_bench.cpp:256-271) as flags. The reference's st/omp/
async/pool scheduling modes collapse into the kernel backend; its ``threads``
knob becomes ``--shards`` (device count of the row mesh).

Reports Total / Avg / QPS / p50 / p95 / p99 (batch-level when batching),
bytes_per_query and payload_equiv_bandwidth_GBps (nvdb_bench.cpp:369-425),
recall@k against a gtbin file, and a machine-parsable RESULT line.
"""

from __future__ import annotations

import numpy as np

from nvdb_tpu import config
from nvdb_tpu.formats import gtbin, vecbin
from nvdb_tpu.eval.harness import run_benchmark
from nvdb_tpu.eval.recall import recall_at_k
from nvdb_tpu.eval.stats import result_line
from nvdb_tpu.tools._common import make_parser, setup_jax


def main(argv=None):
    p = make_parser(__doc__)
    p.add_argument("base")
    p.add_argument("query")
    p.add_argument("k", type=int)
    p.add_argument("--batch-q", type=int, default=1)
    p.add_argument("--warmup", type=int,
                   default=config.EvalConfig.from_env().warmup)
    p.add_argument("--shards", type=int, default=1,
                   help=">1: row-shard the store over this many devices")
    p.add_argument("--gt", default=None, help="gtbin file for recall@k")
    p.add_argument("--quantize-queries", action="store_true",
                   help="int8 stores: quantize queries and use the native "
                        "int8 MXU matmul (fastest path; adds ~0.4% query "
                        "quantization noise)")
    p.add_argument("--refine-k", type=int, default=0,
                   help="with --quantize-queries: EXACT i8 mode — fused "
                        "f32-query dot rerank of the scan's top-REFINE_K "
                        "(restores the f32-query ranking for ~3% of the "
                        "scan cost)")
    p.add_argument("--device-queries", action="store_true",
                   help="pre-upload the query pool and slice batches on-device "
                        "(excludes host->device transfer from timed loops; the "
                        "honest mode through a remote/relay TPU attachment)")
    args = p.parse_args(argv)
    setup_jax(args)

    import jax

    from nvdb_tpu.index.flat import FlatIndex
    from nvdb_tpu.store import VectorStore

    qf = vecbin.VecbinFile(args.query)
    queries = qf.rows_f32()

    if args.shards > 1:
        from nvdb_tpu.dist import mesh as meshmod
        from nvdb_tpu.dist.sharded import ShardedFlatIndex

        mesh = meshmod.row_mesh(args.shards)
        store = VectorStore.from_vecbin(
            args.base, sharding=meshmod.row_sharding(mesh), n_shards=args.shards)
        index = ShardedFlatIndex(store, mesh=mesh, backend=args.backend)
    else:
        store = VectorStore.from_vecbin(args.base)
        index = FlatIndex(store, backend=args.backend,
                          quantize_queries=args.quantize_queries,
                          refine_k=args.refine_k)

    print(f"N={store.n} dim={store.d} dtype={vecbin.dtype_name(store.dtype_code)} "
          f"Q={qf.count} k={args.k} backend={args.backend} "
          f"device={jax.default_backend()} shards={args.shards}")

    search_fn = index.search
    if args.device_queries and args.shards == 1:
        import jax.numpy as jnp
        import numpy as _np
        from nvdb_tpu.kernels import dispatch
        from nvdb_tpu.utils import round_up as _ru

        b = max(args.batch_q, 1)
        bp = 8
        while bp < b:
            bp *= 2
        qp = store.pad_queries(queries)
        # +bp: dynamic_slice clamps start to pool_rows-bp, so without the tail
        # pad a batch starting near the end would silently return a slice of
        # EARLIER queries (ids/recall mislabeled for the tail batches)
        pool_rows = _ru(max(qp.shape[0], bp), bp) + bp
        pool_host = _np.zeros((pool_rows, qp.shape[1]), _np.float32)
        pool_host[: qp.shape[0]] = qp
        pool = jax.block_until_ready(jax.device_put(jnp.asarray(pool_host)))

        n_valid, k_, backend = store.n, args.k, args.backend

        qq = args.quantize_queries and store.scales is not None

        refine_k = max(args.refine_k, k_) if (qq and args.refine_k) else 0

        @jax.jit
        def step(pool, vectors, scales, start):
            block = jax.lax.dynamic_slice(pool, (start, 0), (bp, pool.shape[1]))
            if qq:
                amax = jnp.max(jnp.abs(block), axis=1)
                qs = jnp.where(amax > 0, amax / 127.0, 1.0)
                q8 = jnp.clip(jnp.round(block / qs[:, None]),
                              -127, 127).astype(jnp.int8)
                kk = refine_k if refine_k else k_
                v, i = dispatch.flat_topk(q8, vectors, scales, n_valid, kk,
                                          backend=backend, query_scales=qs)
                if refine_k:
                    v, i = dispatch.exact_refine(block, i, vectors, scales,
                                                 k_, metric="dot")
                return v, i
            return dispatch.flat_topk(block, vectors, scales, n_valid, k_,
                                      backend=backend)

        base_addr = queries.__array_interface__["data"][0]
        row_stride = queries.strides[0]

        def search_fn(qs, k):
            # recover the batch's start row from the slice's memory offset so
            # warmup calls can't desynchronize ids vs queries
            start = (qs.__array_interface__["data"][0] - base_addr) // row_stride
            v, i = step(pool, store.vectors, store.scales, int(start))
            return _np.asarray(v)[: qs.shape[0]], _np.asarray(i)[: qs.shape[0]]

    ids, stats = run_benchmark(
        search_fn, queries, args.k, batch_q=args.batch_q,
        warmup=args.warmup, bytes_per_query=store.payload_bytes)
    print(stats.render())

    recall = None
    if args.gt:
        info, gt_ids = gtbin.read_gtbin(args.gt)
        if info.Q != qf.count or info.k < args.k:
            raise SystemExit(f"GT shape mismatch: {info} vs Q={qf.count} k={args.k}")
        recall = recall_at_k(ids, np.asarray(gt_ids), k=args.k)
        print(f"recall@{args.k}={recall:.4f}")

    kv = dict(mode="flat", backend=args.backend, shards=args.shards,
              refine_k=args.refine_k,
              N=store.n, dim=store.d, dtype=vecbin.dtype_name(store.dtype_code),
              Q=qf.count, k=args.k, batch_q=args.batch_q,
              avg_ms=stats.avg_ms, qps=stats.qps,
              p50_ms=stats.p50_ms, p95_ms=stats.p95_ms, p99_ms=stats.p99_ms,
              bytes_per_query=int(stats.bytes_per_query),
              bandwidth_gbps=stats.bandwidth_gbps)
    if recall is not None:
        kv["recall"] = recall
    print(result_line(**kv))


if __name__ == "__main__":
    main()
