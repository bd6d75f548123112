"""Sample random rows, check for NaN/Inf and print L2 norms — cheap invariants
for L2-normalized embeddings (the nvdb_sanity analogue, apps/nvdb_sanity.cpp:32-47)."""

from __future__ import annotations

import sys

import numpy as np

from nvdb_tpu.formats import vecbin
from nvdb_tpu.tools._common import make_parser


def main(argv=None):
    p = make_parser(__doc__)
    p.add_argument("path")
    p.add_argument("--samples", type=int, default=8)
    p.add_argument("--seed", type=int, default=12345)
    args = p.parse_args(argv)

    f = vecbin.VecbinFile(args.path)
    rng = np.random.default_rng(args.seed)
    idx = rng.integers(0, f.count, size=min(args.samples, f.count))
    bad = 0
    for i in sorted(idx.tolist()):
        row = f.rows_f32(i, i + 1)[0]
        finite = np.isfinite(row).all()
        bad += not finite
        print(f"row {i}: norm={np.linalg.norm(row):.6f} finite={int(finite)}")
    if bad:
        print(f"FAIL: {bad} rows with NaN/Inf", file=sys.stderr)
        sys.exit(2)
    print("OK")


if __name__ == "__main__":
    main()
