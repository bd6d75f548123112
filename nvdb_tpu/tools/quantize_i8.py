"""FP32/BF16 vecbin -> INT8(+per-row scale) vecbin with symmetric max-abs/127
scaling — the nvdb_quantize_i8 analogue (apps/nvdb_quantize_i8.cpp:49-85).

``--residual INDEX``: quantize RESIDUALS vs the index's coarse centroids
(in its rotated space) instead of raw rows. Residual amax is ~1.8x smaller
on clustered corpora, so the same 1 byte/dim ranks much finer — measured 8M
refine ceiling .9760 (plain) -> .9900 (residual) on exact candidates. The
output file is a standard i8 vecbin of residual CODES; consumers must pair
it with the SAME index (``VectorStore.attach_residual`` /
``ivf_eval --residual-refine``) and score it with rotated queries.
"""

from __future__ import annotations

import numpy as np

from nvdb_tpu.formats import vecbin
from nvdb_tpu.tools._common import make_parser


def residual_params(index_path: str):
    """Host-side (cents [nlist, dp] f32, rotation | None, list_of builder):
    everything a residual encode/attach needs, straight from the npz — no
    device arrays, no D2H."""
    z = np.load(index_path)
    cents = np.asarray(z["centroids"], np.float32)
    rot = np.asarray(z["rotation"], np.float32) if "rotation" in z and \
        z["rotation"].ndim == 2 else None
    sids = np.asarray(z["slot_ids"])
    n = int(np.asarray(z["meta"])[0]) if "meta" in z else int(sids.max()) + 1
    li, si = np.nonzero(sids >= 0)
    list_of = np.zeros(n, np.int32)
    list_of[sids[li, si]] = li.astype(np.int32)
    return cents, rot, list_of


def main(argv=None):
    p = make_parser(__doc__)
    p.add_argument("src")
    p.add_argument("out")
    p.add_argument("--residual", default=None, metavar="INDEX",
                   help="quantize residuals vs this IVF(-PQ) index's coarse "
                        "centroids (rotated space); pair the output with the "
                        "same index at load time")
    args = p.parse_args(argv)

    from nvdb_tpu import native

    f = vecbin.VecbinFile(args.src)
    chunk = 262144
    cents = rot = list_of = None
    out_dim = f.dim
    if args.residual:
        cents, rot, list_of = residual_params(args.residual)
        if list_of.shape[0] != f.count:
            raise SystemExit(f"index rows ({list_of.shape[0]}) != vecbin "
                             f"rows ({f.count}); wrong index for this base?")
        # residuals live in the index's PADDED rotated space: the output
        # file's dim is dp (= f.dim when already lane-aligned)
        out_dim = cents.shape[1]
    with vecbin.StreamingVecbinWriter(args.out, out_dim, "i8") as w:
        for s in range(0, f.count, chunk):
            rows = f.rows_f32(s, min(s + chunk, f.count))
            if args.residual:
                if rows.shape[1] != out_dim:
                    rows = np.pad(rows, ((0, 0), (0, out_dim - rows.shape[1])))
                if rot is not None:
                    rows = rows @ rot
                rows = rows - cents[list_of[s : s + rows.shape[0]]]
            q, sc = native.quantize_i8(rows)  # threaded C++; numpy fallback
            w.append(q, sc)
    out = vecbin.VecbinFile(args.out)
    kind = "residual-i8" if args.residual else "i8"
    print(f"wrote {out.count} x {out.dim} {kind}(+scale) -> {args.out}")


if __name__ == "__main__":
    main()
