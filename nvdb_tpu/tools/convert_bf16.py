"""FP32 vecbin -> BF16 vecbin (round-to-nearest-even) — the TPU-native
replacement for the reference's f32->f16 converter
(tools/nvdb_convert_f16.cpp:20-119; bf16 is the MXU-native half type)."""

from __future__ import annotations

from nvdb_tpu.formats import vecbin
from nvdb_tpu.tools._common import make_parser


def main(argv=None):
    p = make_parser(__doc__)
    p.add_argument("src")
    p.add_argument("out")
    p.add_argument("--f16", action="store_true",
                   help="write IEEE float16 (dtype=2) instead of bf16 — "
                        "bit-compatible with the reference's own readers")
    args = p.parse_args(argv)

    from nvdb_tpu import native
    import numpy as np

    f = vecbin.VecbinFile(args.src)
    chunk = 262144
    name = "f16" if args.f16 else "bf16"
    with vecbin.StreamingVecbinWriter(args.out, f.dim, name) as w:
        for s in range(0, f.count, chunk):
            rows = f.rows_f32(s, min(s + chunk, f.count))
            if args.f16:
                w.append(rows.astype(np.float16))
            else:
                w.append(native.convert_f32_to_bf16(rows))  # threaded C++ path
    out = vecbin.VecbinFile(args.out)
    print(f"wrote {out.count} x {out.dim} {name} -> {args.out}")


if __name__ == "__main__":
    main()
