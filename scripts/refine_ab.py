"""Paired A/B of the exact-refine backends (pallas rerank kernel vs the
jnp gather path) on the real TPU, with chained relay-honest timing and
paired 95% confidence intervals (the reference's methodology,
Performance_CUDA.md:77-111: interleaved paired runs, mean delta +/- CI).

Each pair = one chained run of CHAIN calls per backend, interleaved
A,B,A,B,... so relay drift hits both arms equally. Prints one RESULT line
per (B, R) with both means and the paired delta CI.

Usage: refine_ab.py [--n 1000000] [--d 768] [--dtype bf16]
           [--batches 8,64,256] [--rs 50,100] [--pairs 10] [--chain 20]
"""

import argparse
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16", "i8"])
    ap.add_argument("--batches", default="8,64,256")
    ap.add_argument("--rs", default="50,100")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--pairs", type=int, default=10)
    ap.add_argument("--chain", type=int, default=20)
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="CPU smoke mode (in-process platform override)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/nvdb_jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from nvdb_tpu.index.ivf_pq import _refine_block
    from nvdb_tpu.kernels.rerank import store_norms2
    from nvdb_tpu.utils import round_up

    Np = round_up(args.n, 4096)
    Dp = round_up(args.d, 128)
    key = jax.random.PRNGKey(0)
    base_f32 = jax.random.normal(key, (Np, Dp), dtype=jnp.float32)
    scales = None
    if args.dtype == "bf16":
        base = base_f32.astype(jnp.bfloat16)
    elif args.dtype == "i8":
        amax = jnp.max(jnp.abs(base_f32), axis=1)
        scales = jnp.where(amax > 0, amax / 127.0, 1.0)
        base = jnp.clip(jnp.round(base_f32 / scales[:, None]), -127, 127
                        ).astype(jnp.int8)
    else:
        base = base_f32
    del base_f32
    base = jax.block_until_ready(base)
    norms2 = jax.block_until_ready(jax.jit(store_norms2)(base))

    bmax = max(int(b) for b in args.batches.split(","))
    rmax = max(int(r) for r in args.rs.split(","))
    qpool = jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(1), (bmax, Dp), jnp.float32))
    cpool = jax.block_until_ready(jax.random.randint(
        jax.random.PRNGKey(2), (bmax, rmax), 0, args.n, dtype=jnp.int32))

    for B in (int(x) for x in args.batches.split(",")):
        for R in (int(x) for x in args.rs.split(",")):
            q = qpool[:B]
            cand = cpool[:B, :R]

            def run_pallas(q, cand, base, scales, norms2):
                from nvdb_tpu.kernels.rerank import pallas_rerank
                return pallas_rerank(q, cand, base, scales, args.k,
                                     norms2=norms2)

            def run_jnp(q, cand, base, scales):
                return _refine_block(q, cand, base, scales, args.k,
                                     backend="jnp")

            jp = jax.jit(run_pallas)
            jj = jax.jit(run_jnp)
            fp = lambda: jp(q, cand, base, scales, norms2)
            fj = lambda: jj(q, cand, base, scales)

            # compile + correctness
            t0 = time.perf_counter()
            ip = np.asarray(fp()[1])
            ij = np.asarray(fj()[1])
            log(f"[B={B} R={R}] compile {time.perf_counter()-t0:.1f}s")
            if args.check:
                match = np.mean(ip == ij)
                log(f"  pallas-vs-jnp id match: {match:.4f}")
                assert match > 0.999, match

            def chained_ms(fn):
                r = fn()
                for _ in range(args.chain - 1):
                    r = fn()
                _ = np.asarray(r[1])

            def timed(fn):
                t0 = time.perf_counter()
                chained_ms(fn)
                return (time.perf_counter() - t0) * 1000.0 / args.chain

            timed(fp), timed(fj)  # warm both arms
            dp_, dj_ = [], []
            for _ in range(args.pairs):
                dp_.append(timed(fp))
                dj_.append(timed(fj))
            dp_, dj_ = np.asarray(dp_), np.asarray(dj_)
            delta = dp_ - dj_
            ci = 1.96 * delta.std(ddof=1) / np.sqrt(len(delta)) \
                if len(delta) > 1 else 0.0
            print(f"RESULT stage=refine B={B} R={R} k={args.k} "
                  f"dtype={args.dtype} n={args.n} pairs={args.pairs} "
                  f"chain={args.chain} "
                  f"pallas_ms={dp_.mean():.3f} jnp_ms={dj_.mean():.3f} "
                  f"delta_ms={delta.mean():+.3f} ci95={ci:.3f} "
                  f"pallas_ms_q={dp_.mean()/B:.4f} jnp_ms_q={dj_.mean()/B:.4f}",
                  flush=True)


if __name__ == "__main__":
    main()
