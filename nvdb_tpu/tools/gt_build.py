"""Exact ground-truth builder: exact top-k for every query -> gtbin file
(the nvdb_gt_build analogue, apps/nvdb_gt_build.cpp:74-127)."""

from __future__ import annotations

import time

from nvdb_tpu import config
from nvdb_tpu.formats import gtbin, vecbin
from nvdb_tpu.tools._common import make_parser, setup_jax


def main(argv=None):
    p = make_parser(__doc__)
    p.add_argument("base")
    p.add_argument("query")
    p.add_argument("out")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--host", action="store_true",
                   default=config.EvalConfig.from_env().gt_host,
                   help="build GT with the native C++ host scan instead of the "
                        "device (independent oracle; GT_MODE=host analogue)")
    p.add_argument("--row-chunk", type=int, default=0,
                   help="stream the base in row chunks of this size (exact "
                        "chunked device scan + host k-merge) — for corpora "
                        "larger than HBM. 0 = auto: chunk when the f32 "
                        "working set exceeds ~12 GB")
    p.add_argument("--metric", default=config.EvalConfig.from_env().exact_metric,
                   choices=["dot", "l2"],
                   help="ranking metric (EXACT_METRIC=DOT|L2 analogue, "
                        "nvdb_ivf_eval.cpp:353): identical ids on normalized "
                        "corpora; l2 is exact on un-normalized ones. l2 is "
                        "device-path only")
    args = p.parse_args(argv)
    if args.host and args.metric == "l2":
        raise SystemExit("--host oracle is dot-metric only; drop --host or "
                         "use --metric dot")

    bf = vecbin.VecbinFile(args.base)
    qf = vecbin.VecbinFile(args.query)
    t0 = time.perf_counter()
    if args.host:
        from nvdb_tpu import native

        _, ids = native.topk_dot_f32(bf.rows_f32(), qf.rows_f32(), args.k)
    else:
        setup_jax(args)

        f32_bytes = bf.count * bf.dim * 4
        row_chunk = args.row_chunk
        if row_chunk == 0 and f32_bytes > 12 * 1024**3:
            row_chunk = 1_000_000
        if row_chunk > 0:
            from nvdb_tpu.index.flat import build_ground_truth_chunked

            ids = build_ground_truth_chunked(args.base, qf.rows_f32(),
                                             args.k, batch=args.batch,
                                             row_chunk=row_chunk,
                                             verbose=True, metric=args.metric)
        else:
            from nvdb_tpu.index.flat import build_ground_truth
            from nvdb_tpu.store import VectorStore

            store = VectorStore.from_vecbin(args.base)
            ids = build_ground_truth(store, qf.rows_f32(), args.k,
                                     batch=args.batch,
                                     backend=args.backend,
                                     metric=args.metric)
    dt = time.perf_counter() - t0
    gtbin.write_gtbin(args.out, ids, dim=bf.dim, N=bf.count)
    print(f"wrote GT [{qf.count} x {args.k}] over N={bf.count} in {dt:.2f}s "
          f"-> {args.out}")


if __name__ == "__main__":
    main()
