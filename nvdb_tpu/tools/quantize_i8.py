"""FP32/BF16 vecbin -> INT8(+per-row scale) vecbin with symmetric max-abs/127
scaling — the nvdb_quantize_i8 analogue (apps/nvdb_quantize_i8.cpp:49-85)."""

from __future__ import annotations

from nvdb_tpu.formats import vecbin
from nvdb_tpu.tools._common import make_parser


def main(argv=None):
    p = make_parser(__doc__)
    p.add_argument("src")
    p.add_argument("out")
    args = p.parse_args(argv)

    from nvdb_tpu import native

    f = vecbin.VecbinFile(args.src)
    chunk = 262144
    with vecbin.StreamingVecbinWriter(args.out, f.dim, "i8") as w:
        for s in range(0, f.count, chunk):
            rows = f.rows_f32(s, min(s + chunk, f.count))
            q, sc = native.quantize_i8(rows)  # threaded C++; numpy fallback
            w.append(q, sc)
    out = vecbin.VecbinFile(args.out)
    print(f"wrote {out.count} x {out.dim} i8(+scale) -> {args.out}")


if __name__ == "__main__":
    main()
