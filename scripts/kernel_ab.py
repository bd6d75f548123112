"""A/B microbench of flat-scan merge strategies on the real TPU.

Usage: python scripts/kernel_ab.py [--n 1000000] [--d 768] [--dtype bf16]
           [--batches 256,512] [--ks 10,64] [--merges extract,rounds] [--tile 0]

Prints one RESULT line per (merge, B, k) combination; correctness is checked
against the jnp oracle on the first iteration of each config.
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
    ap.add_argument("--qi8", action="store_true",
                    help="quantize queries to int8 too (native i8 x i8 MXU "
                         "path; only valid with --dtype i8)")
    ap.add_argument("--batches", default="512")
    ap.add_argument("--ks", default="10")
    ap.add_argument("--merges", default="extract,rounds")
    ap.add_argument("--tile", type=int, default=0, help="0 = auto")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--pairs", type=int, default=0,
                    help="paired-CI mode (the reference's methodology, "
                         "Performance_CUDA.md:77-111): run PAIRS interleaved "
                         "chained samples per merge variant and report each "
                         "variant's mean +/- 95%% CI plus the paired delta "
                         "vs the FIRST listed merge. Relay drift hits all "
                         "arms equally because samples interleave.")
    ap.add_argument("--check", action="store_true", help="verify vs jnp oracle")
    ap.add_argument("--cpu", action="store_true",
                    help="CPU smoke mode (env JAX_PLATFORMS is pinned to "
                         "axon by sitecustomize; only in-process config "
                         "overrides it)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/nvdb_jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from nvdb_tpu.kernels import flat_scan, ops
    from nvdb_tpu.utils import round_up

    Np = round_up(args.n, max(4096, args.tile))
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
    bmax = max(int(b) for b in args.batches.split(","))
    qpool = jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(1), (bmax * 2, Dp), jnp.float32))

    bpe = {"f32": 4, "bf16": 2, "i8": 1}[args.dtype]

    def build_runner(merge, B, k):
        tile = args.tile or flat_scan._pick_tile_rows(
            Np, base.dtype, Dp, B, merge)

        # base/scales are jit ARGUMENTS — closing over a device
        # array bakes it into the compiled module as a constant
        # (hour-long remote compiles, HTTP 413; see CLAUDE.md)
        if args.qi8:
            assert args.dtype == "i8", "--qi8 requires --dtype i8"

            def run(q, qs, base, scales):
                return flat_scan.pallas_flat_topk(
                    q, base, scales, args.n, k, tile_rows=tile,
                    merge=merge, query_scales=qs)

            runj_ = jax.jit(run)

            @jax.jit
            def quant_q(q):
                amax = jnp.max(jnp.abs(q), axis=1)
                qs = jnp.where(amax > 0, amax / 127.0, 1.0)
                qi = jnp.clip(jnp.round(q / qs[:, None]), -127, 127
                              ).astype(jnp.int8)
                return qi, qs

            # pre-quantized per pool slice: query quantization is a
            # one-time client-side step, not part of the scan loop
            qcache = {}

            def runj(q):
                key = id(q)
                if key not in qcache:
                    qcache[key] = jax.block_until_ready(quant_q(q))
                qi, qs = qcache[key]
                return runj_(qi, qs, base, scales)
        else:
            def run(q, base, scales):
                return flat_scan.pallas_flat_topk(
                    q, base, scales, args.n, k, tile_rows=tile,
                    merge=merge)

            runj_ = jax.jit(run)
            runj = lambda q: runj_(q, base, scales)
        return runj, tile

    def compile_and_check(merge, runj, tile, B, k, q0):
        t0 = time.perf_counter()
        i0 = np.asarray(runj(q0)[1])
        log(f"[{merge} B={B} k={k} T={tile}] compile+run "
            f"{time.perf_counter()-t0:.1f}s")
        if args.check and merge not in ("nomerge", "fixed2", "mmonly"):
            jv, ji = ops.scan_topk(q0, base, scales, args.n, k)
            ji = np.asarray(ji)
            match = np.mean(ji == i0)
            # bf16-granular rankings (key packs mono16 scores; qi8
            # quantizes queries) tie densely in the deep-k tail, so
            # POSITIONAL order churns with k (measured: key k=32 is
            # 0.66 positional yet 0.996 SET overlap with zero dups and
            # max achieved-score regret of one bf16 ulp). Gate those on
            # set overlap; exact merges stay gated positionally.
            loose = args.qi8 or merge in ("extract16", "key")
            setov = np.mean([len(set(a.tolist()) & set(b.tolist())) / k
                             for a, b in zip(ji, i0)])
            log(f"  id match vs oracle: {match:.4f} (set {setov:.4f})")
            assert (setov if loose else match) > (0.95 if loose else 0.99), \
                (match, setov)

    def timed(runj, q0, q1):
        """One chained sample: iters dispatches, one trailing fetch."""
        t0 = time.perf_counter()
        r = None
        for i in range(args.iters):
            r = runj(q0 if i % 2 == 0 else q1)
        _ = np.asarray(r[1])
        return (time.perf_counter() - t0) / args.iters

    merges = args.merges.split(",")
    for B in (int(x) for x in args.batches.split(",")):
        for k in (int(x) for x in args.ks.split(",")):
            q0, q1 = qpool[:B], qpool[B:2 * B]
            if args.pairs <= 0:
                for merge in merges:
                    runj, tile = build_runner(merge, B, k)
                    compile_and_check(merge, runj, tile, B, k, q0)
                    _ = np.asarray(runj(q1)[1])
                    dt = timed(runj, q0, q1)
                    print(f"RESULT merge={merge} B={B} k={k} tile={tile} "
                          f"dtype={args.dtype} n={args.n} d={args.d} "
                          f"ms={dt*1e3:.3f} qps={B/dt:.1f} "
                          f"gbps={Np*Dp*bpe/dt/1e9:.1f}", flush=True)
                continue

            # paired-CI mode: interleave chained samples across variants
            runners = {}
            for merge in merges:
                runj, tile = build_runner(merge, B, k)
                compile_and_check(merge, runj, tile, B, k, q0)
                _ = np.asarray(runj(q1)[1])  # warm
                runners[merge] = (runj, tile)
            samples = {m: [] for m in merges}
            for _p in range(args.pairs):
                for m in merges:
                    samples[m].append(timed(runners[m][0], q0, q1))
            ref = np.asarray(samples[merges[0]])
            for m in merges:
                s = np.asarray(samples[m])
                ci = (1.96 * s.std(ddof=1) / np.sqrt(len(s))
                      if len(s) > 1 else 0.0)
                d = s - ref
                dci = (1.96 * d.std(ddof=1) / np.sqrt(len(d))
                       if len(d) > 1 else 0.0)
                print(f"RESULT merge={m} B={B} k={k} tile={runners[m][1]} "
                      f"dtype={args.dtype} n={args.n} d={args.d} "
                      f"pairs={args.pairs} iters={args.iters} "
                      f"ms={s.mean()*1e3:.3f} ci95_ms={ci*1e3:.3f} "
                      f"delta_vs_{merges[0]}_ms={d.mean()*1e3:+.3f} "
                      f"delta_ci95_ms={dci*1e3:.3f} "
                      f"qps={B/s.mean():.1f} "
                      f"gbps={Np*Dp*bpe/s.mean()/1e9:.1f}", flush=True)


if __name__ == "__main__":
    main()
