#!/usr/bin/env python
"""Deep-refine-k recall ceiling for an IVF-PQ index.

For each query, score EVERY live candidate in its top-nprobe lists with the
exact f32 ADC oracle (pq.adc_lut/adc_scores — the jnp path of
_ivfpq_search_block), then report recall@rk for a ladder of refine depths
assuming a perfect refine stage. This separates the two recall losses the
serving number mixes:

  measured recall  =  probe coverage  x  P(ADC rank <= rk | covered)

scripts/coverage_probe.py measures the first factor; this measures the
second. If recall@256 >> recall@128, extending the ADC kernel's 128-lane
slot buffer is worth kernel work; if the curve is flat, it is not.

Host/CPU only (numpy + jax CPU) — does not compete with the chip.
"""
import argparse

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from nvdb_tpu.formats import gtbin, vecbin  # noqa: E402
from nvdb_tpu.kernels import pq  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("index")
    ap.add_argument("queries")
    ap.add_argument("gt")
    ap.add_argument("--nprobe", type=int, default=64)
    ap.add_argument("--rk", type=int, nargs="+",
                    default=[32, 64, 128, 256, 512, 1024])
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--score-mode", default="f32",
                    choices=["f32", "bf16lut", "bf16score"],
                    help="f32: exact oracle. bf16lut: LUT cast to bf16, f32 "
                         "accumulate (models the DMA-id kernel). bf16score: "
                         "bf16lut + final score rounded to bf16 (models the "
                         "gen-5 packed-key kernel's mono16 ranking).")
    args = ap.parse_args()

    z = np.load(args.index)
    cents = jnp.asarray(z["centroids"])
    cbs = jnp.asarray(z["codebooks"])
    codes = np.asarray(z["codes"])          # [nlist, M, Lcap] uint8, host
    slot_ids = np.asarray(z["slot_ids"])    # [nlist, Lcap]
    meta = [int(x) for x in z["meta"]]
    m = meta[2]
    rot = z["rotation"]

    q = vecbin.VecbinFile(args.queries).rows_f32(0, None)
    if rot.size:
        q = q @ rot
    gt_ids = np.asarray(gtbin.read_gtbin(args.gt)[1])
    Q, k = gt_ids.shape
    P = args.nprobe

    @jax.jit
    def score_block(qb, probes, code_slab, live):
        # list ranking + residual LUT exactly as _ivfpq_search_block (jnp path)
        cents_p = jnp.take(cents, probes, axis=0)            # [b, P, D]
        res = qb[:, None, :] - cents_p
        lut = pq.adc_lut(res.reshape(-1, qb.shape[1]), cbs, m)
        if args.score_mode != "f32":
            lut = lut.astype(jnp.bfloat16).astype(jnp.float32)
        s = pq.adc_scores(lut.reshape(qb.shape[0], P, m, 256),
                          jnp.swapaxes(code_slab, -1, -2))   # [b, P, L]
        if args.score_mode == "bf16score":
            s = s.astype(jnp.bfloat16).astype(jnp.float32)
        return jnp.where(live, s, -jnp.inf).reshape(qb.shape[0], -1)

    qj = jnp.asarray(q)
    # rank lists EXACTLY as the serving path does (_coarse_probes:
    # argmax 2 q.c - ||c||^2 with empty lists masked) — plain-dot ranking
    # probes a different set and biases the P(rank <= rk | covered)
    # factor this probe exists to isolate (ADVICE r3)
    from nvdb_tpu.index.ivf_flat import _coarse_probes  # noqa: E402

    cs = np.asarray(_coarse_probes(qj, cents, jnp.asarray(slot_ids), P))

    rkmax = max(args.rk)
    hits = {r: 0 for r in args.rk}
    for s in range(0, Q, args.chunk):
        e = min(Q, s + args.chunk)
        probes = cs[s:e]
        slab = codes[probes]                                  # [b, P, M, L]
        sids = slot_ids[probes]                               # [b, P, L]
        scores = np.asarray(score_block(
            qj[s:e], jnp.asarray(probes), jnp.asarray(slab),
            jnp.asarray(sids >= 0)))
        top = np.argsort(-scores, axis=1)[:, :rkmax]
        cand = np.take_along_axis(sids.reshape(e - s, -1), top, axis=1)
        for r in args.rk:
            hits[r] += sum(len(np.intersect1d(cand[i, :r], gt_ids[s + i]))
                           for i in range(e - s))
        done = {r: hits[r] / ((e) * k) for r in args.rk}
        print(f"[{e}/{Q}] " + " ".join(f"rk={r}:{v:.4f}"
                                       for r, v in done.items()), flush=True)
    print("FINAL " + " ".join(f"recall@rk={r}={hits[r] / (Q * k):.4f}"
                              for r in args.rk))


if __name__ == "__main__":
    main()
