"""Build and persist a partition-then-rerank index — the nvdb_hnsw_build
analogue (apps/nvdb_hnsw_build.cpp): build-accuracy knob is the partition count
(--nlist, the M/efConstruction analogue), saved to .npz."""

from __future__ import annotations

import time

from nvdb_tpu.formats import vecbin
from nvdb_tpu.tools._common import make_parser, setup_jax


def main(argv=None):
    p = make_parser(__doc__)
    p.add_argument("base")
    p.add_argument("out")
    p.add_argument("--nlist", type=int, default=None, help="None = sqrt-auto")
    p.add_argument("--dtype", default="bf16", choices=["f32", "bf16", "i8"])
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    setup_jax(args)

    from nvdb_tpu.index.partition import PartitionRerankIndex

    f = vecbin.VecbinFile(args.base)
    t0 = time.perf_counter()
    idx = PartitionRerankIndex.build(f.rows_f32(), nlist=args.nlist,
                                     dtype=args.dtype, with_refine=False,
                                     n_iters=args.iters, seed=args.seed)
    idx.save(args.out)
    print(f"built partitions={idx.ivf.nlist} lcap={idx.ivf.lcap} over "
          f"N={f.count} in {time.perf_counter()-t0:.2f}s; "
          f"index_MB={idx.index_bytes/1e6:.1f} -> {args.out}")


if __name__ == "__main__":
    main()
