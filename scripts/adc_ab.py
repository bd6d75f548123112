"""Paired chained A/B of the Pallas ADC kernel generations on real TPU.

Arms: slim=True (gen 3: all [M,16,L] intermediates bf16) vs slim=False
(round-2 mixed bf16/f32). Flagship-shaped inputs (nlist=4096, m=96,
lcap=1024, B x P probes), synthetic codes/LUTs — the kernel cost does not
depend on data values. Interleaved paired samples, 95% CI on the delta
(Performance_CUDA.md:77-111 methodology).

``--mode gen4`` instead A/Bs chunk-skipping (generation 4): full-width
scan vs chunk-gated scan on an index whose lists are partially filled
(``--fill-frac``, flagship repacked indexes average ~16% live in probed
lists). Arms are bit-identical by construction; the delta is pure
skipped-work savings minus chunking overhead.

Usage: adc_ab.py [--b 64] [--p 64] [--g 4] [--pairs 10] [--chain 10]
                 [--mode slim|gen4] [--fill-frac 0.16] [--chunk 256]
"""

import argparse
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nlist", type=int, default=4096)
    ap.add_argument("--m", type=int, default=96)
    ap.add_argument("--lcap", type=int, default=1024)
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--p", type=int, default=64)
    ap.add_argument("--g", type=int, default=4)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--pairs", type=int, default=10)
    ap.add_argument("--chain", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--mode",
                    choices=["slim", "gen4", "gen5", "gen5diag", "gen6",
                             "gen6diag"],
                    default="slim")
    ap.add_argument("--diag", choices=["nomerge", "noscore", "pinlut"],
                    default="nomerge",
                    help="gen5diag: which wrong-result probe to pair "
                         "against the real gen-5 kernel")
    ap.add_argument("--fill-frac", type=float, default=0.16)
    ap.add_argument("--chunk", type=int, default=256)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/nvdb_jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from nvdb_tpu.kernels.adc_scan import pallas_adc_topk, list_fills

    B, P, m, L, nlist = args.b, args.p, args.m, args.lcap, args.nlist
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    lut = jax.block_until_ready(
        jax.random.normal(k1, (B, P, m, 16, 16), jnp.bfloat16))
    probes = jax.block_until_ready(jax.random.randint(
        k2, (B, P), 0, nlist, dtype=jnp.int32))
    codes = jax.block_until_ready(jax.random.randint(
        k3, (nlist, m, L), 0, 256, dtype=jnp.int32).astype(jnp.uint8))
    if args.mode in ("gen4", "gen5", "gen5diag", "gen6", "gen6diag"):
        # prefix-packed partial fills: lognormal around fill_frac*L, the
        # shape of a repacked index's probed-list occupancy (BENCHMARKS §4)
        rng = np.random.default_rng(7)
        f = rng.lognormal(mean=0.0, sigma=0.6, size=nlist) * args.fill_frac
        fills_np = np.clip(np.round(f * L), 0, L).astype(np.int32)
        sid_np = np.where(
            np.arange(L)[None, :] < fills_np[:, None],
            np.arange(L, dtype=np.int32)[None, :]
            + (np.arange(nlist, dtype=np.int32) * L)[:, None], -1)
        slot_ids = jax.block_until_ready(jnp.asarray(sid_np))
        fills = jax.block_until_ready(list_fills(slot_ids))
        log(f"gen4 fills: mean={fills_np.mean():.0f}/{L} "
            f"({fills_np.mean()/L:.2%}), max={fills_np.max()}")
    else:
        slot_ids = jax.block_until_ready(jnp.tile(
            jnp.arange(L, dtype=jnp.int32)[None], (nlist, 1)))
        fills = None

    def make(slim=False, chunk=None, ids_mode="dma", diag=""):
        def run(lut, probes, codes, slot_ids):
            return pallas_adc_topk(lut, probes, codes, slot_ids, args.k,
                                   g=args.g, slim=slim, chunk=chunk,
                                   fills=fills, ids_mode=ids_mode,
                                   diag=diag)
        j = jax.jit(run, static_argnums=())
        return lambda: j(lut, probes, codes, slot_ids)

    if args.mode == "gen4":
        arms = {"full": make(chunk=L), "chunked": make(chunk=args.chunk)}
    elif args.mode == "gen5diag":
        # time decomposition: base-vs-nomerge = merge share (rounds +
        # fixed), base-vs-noscore = scoring+rounds share. id match is
        # meaningless here (the diag arm is wrong by design).
        arms = {"gen5": make(chunk=args.chunk, ids_mode="key"),
                args.diag: make(chunk=args.chunk, ids_mode="key",
                                diag=args.diag)}
    elif args.mode == "gen6diag":
        arms = {"gen6": make(chunk=args.chunk, ids_mode="gather"),
                args.diag: make(chunk=args.chunk, ids_mode="gather",
                                diag=args.diag)}
    elif args.mode == "gen6":
        # gen-5 (in-kernel per-list DMA issue) vs gen-6 (one XLA gather +
        # plain pipelined blocks) — the DMA-issue-floor attack; the gather
        # cost is inside the jitted arm, so the delta is end-to-end
        arms = {"gen5": make(chunk=args.chunk, ids_mode="key"),
                "gen6": make(chunk=args.chunk, ids_mode="gather")}
    elif args.mode == "gen5":
        # gen-4 (chunked, DMA'd ids) vs gen-5 (chunked, derived keys +
        # double-buffered codes DMA) — the per-list-overhead attack
        arms = {"gen4": make(chunk=args.chunk),
                "gen5": make(chunk=args.chunk, ids_mode="key")}
    else:
        arms = {"slim": make(slim=True), "r2mixed": make(slim=False)}
    for name, fn in arms.items():
        t0 = time.perf_counter()
        i0 = np.asarray(fn()[1])
        log(f"[{name}] compile+run {time.perf_counter()-t0:.1f}s")
    # arms must agree on rankings (gen4: bit-identical by construction;
    # slim: identical math modulo f32-accumulation order)
    na, nb = list(arms)
    ia = np.asarray(arms[na]()[1])
    ib = np.asarray(arms[nb]()[1])
    match = np.mean(ia == ib)
    log(f"{na}-vs-{nb} id match: {match:.4f}")

    def timed(fn):
        t0 = time.perf_counter()
        r = None
        for _ in range(args.chain):
            r = fn()
        _ = np.asarray(r[1])
        return (time.perf_counter() - t0) * 1000.0 / args.chain

    for fn in arms.values():
        timed(fn)  # warm
    samples = {n: [] for n in arms}
    for _ in range(args.pairs):
        for n, fn in arms.items():
            samples[n].append(timed(fn))
    s_a = np.asarray(samples[na])
    s_b = np.asarray(samples[nb])
    d = s_a - s_b
    ci = 1.96 * d.std(ddof=1) / np.sqrt(len(d)) if len(d) > 1 else 0.0
    extra = (f"fill_frac={args.fill_frac} chunk={args.chunk} "
             if args.mode == "gen4" else "")
    print(f"RESULT stage=adc mode={args.mode} B={B} P={P} m={m} lcap={L} "
          f"g={args.g} k={args.k} pairs={args.pairs} chain={args.chain} "
          f"{extra}{na}_ms={s_a.mean():.3f} {nb}_ms={s_b.mean():.3f} "
          f"delta_ms={d.mean():+.3f} ci95={ci:.3f} "
          f"{nb}_ms_q={s_b.mean()/B:.4f} id_match={match:.4f}", flush=True)


if __name__ == "__main__":
    main()
