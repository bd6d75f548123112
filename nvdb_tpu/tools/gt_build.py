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
    args = p.parse_args(argv)

    bf = vecbin.VecbinFile(args.base)
    qf = vecbin.VecbinFile(args.query)
    t0 = time.perf_counter()
    if args.host:
        from nvdb_tpu import native

        _, ids = native.topk_dot_f32(bf.rows_f32(), qf.rows_f32(), args.k)
    else:
        setup_jax(args)

        from nvdb_tpu.index.flat import build_ground_truth
        from nvdb_tpu.store import VectorStore

        store = VectorStore.from_vecbin(args.base)
        ids = build_ground_truth(store, qf.rows_f32(), args.k, batch=args.batch,
                                 backend=args.backend)
    dt = time.perf_counter() - t0
    gtbin.write_gtbin(args.out, ids, dim=bf.dim, N=bf.count)
    print(f"wrote GT [{qf.count} x {args.k}] over N={bf.count} in {dt:.2f}s "
          f"-> {args.out}")


if __name__ == "__main__":
    main()
