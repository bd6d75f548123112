"""Take the first N rows of a vecbin into a new file (chunked streaming) —
the nvdb_slice analogue (tools/nvdb_slice.cpp:54-70)."""

from __future__ import annotations

import numpy as np

from nvdb_tpu.formats import vecbin
from nvdb_tpu.tools._common import make_parser


def main(argv=None):
    p = make_parser(__doc__)
    p.add_argument("src")
    p.add_argument("out")
    p.add_argument("--n", type=int, required=True)
    p.add_argument("--raw12", action="store_true",
                   help="write legacy raw12 f32 output (reference behaviour)")
    args = p.parse_args(argv)

    f = vecbin.VecbinFile(args.src)
    n = min(args.n, f.count)
    if args.raw12:
        vecbin.write_vecbin(args.out, f.rows_f32(0, n), legacy_raw12=True)
    else:
        name = f.info.dtype_str
        with vecbin.StreamingVecbinWriter(args.out, f.dim, name) as w:
            chunk = 262144
            for s in range(0, n, chunk):
                e = min(s + chunk, n)
                rows = np.asarray(f.vectors[s:e])
                sc = np.asarray(f.scales[s:e]) if f.scales is not None else None
                w.append(rows, sc)
    print(f"wrote first {n} rows -> {args.out}")


if __name__ == "__main__":
    main()
