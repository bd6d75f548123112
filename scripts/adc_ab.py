"""Paired chained A/B of the Pallas ADC kernel generations on real TPU.

Arms: slim=True (gen 3: all [M,16,L] intermediates bf16) vs slim=False
(round-2 mixed bf16/f32). Flagship-shaped inputs (nlist=4096, m=96,
lcap=1024, B x P probes), synthetic codes/LUTs — the kernel cost does not
depend on data values. Interleaved paired samples, 95% CI on the delta
(Performance_CUDA.md:77-111 methodology).

Usage: adc_ab.py [--b 64] [--p 64] [--g 4] [--pairs 10] [--chain 10]
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
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/nvdb_jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from nvdb_tpu.kernels.adc_scan import pallas_adc_topk

    B, P, m, L, nlist = args.b, args.p, args.m, args.lcap, args.nlist
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    lut = jax.block_until_ready(
        jax.random.normal(k1, (B, P, m, 16, 16), jnp.bfloat16))
    probes = jax.block_until_ready(jax.random.randint(
        k2, (B, P), 0, nlist, dtype=jnp.int32))
    codes = jax.block_until_ready(jax.random.randint(
        k3, (nlist, m, L), 0, 256, dtype=jnp.int32).astype(jnp.uint8))
    slot_ids = jax.block_until_ready(jnp.tile(
        jnp.arange(L, dtype=jnp.int32)[None], (nlist, 1)))

    def make(slim):
        def run(lut, probes, codes, slot_ids):
            return pallas_adc_topk(lut, probes, codes, slot_ids, args.k,
                                   g=args.g, slim=slim)
        j = jax.jit(run)
        return lambda: j(lut, probes, codes, slot_ids)

    arms = {"slim": make(True), "r2mixed": make(False)}
    for name, fn in arms.items():
        t0 = time.perf_counter()
        i0 = np.asarray(fn()[1])
        log(f"[{name}] compile+run {time.perf_counter()-t0:.1f}s")
    # arms must agree on rankings (identical math modulo f32-accumulation
    # order of the bf16 products)
    ia = np.asarray(arms["slim"]()[1])
    ib = np.asarray(arms["r2mixed"]()[1])
    match = np.mean(ia == ib)
    log(f"slim-vs-r2mixed id match: {match:.4f}")

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
    s_slim = np.asarray(samples["slim"])
    s_mix = np.asarray(samples["r2mixed"])
    d = s_slim - s_mix
    ci = 1.96 * d.std(ddof=1) / np.sqrt(len(d)) if len(d) > 1 else 0.0
    print(f"RESULT stage=adc B={B} P={P} m={m} lcap={L} g={args.g} "
          f"k={args.k} pairs={args.pairs} chain={args.chain} "
          f"slim_ms={s_slim.mean():.3f} r2_ms={s_mix.mean():.3f} "
          f"delta_ms={d.mean():+.3f} ci95={ci:.3f} "
          f"slim_ms_q={s_slim.mean()/B:.4f} id_match={match:.4f}", flush=True)


if __name__ == "__main__":
    main()
