"""Headline benchmark: batched exact flat-scan top-10 over 1M x 768 bf16.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": QPS, "unit": "QPS", "vs_baseline": ...}

Baseline: the reference's best 1M reduced-precision flat-scan throughput,
57.4 QPS (FP16 OMP@8 on i7-12700, BASELINE.md §2 / Performance.md:189-198) —
and our store is 768-D vs the reference's 384-D, i.e. we stream 2x the bytes
per vector and still compare against their 384-D number.

Timing is honest through the axon relay: every timed iteration ends with a
host fetch of the result ids (async dispatch otherwise returns early), and
steady-state uses chained batches with one final fetch, mirroring the
reference's batched-throughput accounting (nvdb_bench.cpp:340-408).

Diagnostics go to stderr; stdout carries exactly the one JSON line.
"""

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16", "i8"])
    ap.add_argument("--qi8", action="store_true",
                    help="with --dtype i8: quantize queries too (native "
                         "i8 x i8 MXU matmul, half the HBM bytes)")
    ap.add_argument("--refine-k", type=int, default=0,
                    help="with --qi8: EXACT i8 mode — fused f32-query dot "
                         "rerank of the scan's top-REFINE_K (restores the "
                         "f32-query ranking; logs the oracle id match)")
    # one trailing fetch costs a full relay round-trip (~28 ms) that
    # amortizes into the reported per-scan time as RTT/iters; 100 iters
    # keeps that bias under ~0.3 ms/scan (scripts/rtt_probe.py quantifies)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--merge", default=None,
                    help="flat-scan merge strategy override (e.g. 'key' — "
                         "bf16-precision ranking, measured ~5%% faster at "
                         "B=512; default: NVDB_MERGE env or 'extract')")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes for CPU validation")
    args = ap.parse_args()

    if args.smoke:
        args.n, args.d, args.batch, args.iters = 20000, 128, 8, 5
    if args.merge:
        import os
        os.environ["NVDB_MERGE"] = args.merge  # read at kernel trace time

    import jax

    if args.smoke:
        # the axon sitecustomize pins JAX_PLATFORMS=axon over the environment;
        # only an in-process config update actually forces CPU (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")

    # cache compiled executables (first pallas compile via the axon remote
    # compiler is ~5 min for the 1M config; cached re-runs are seconds)
    jax.config.update("jax_compilation_cache_dir", "/tmp/nvdb_jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    from nvdb_tpu.kernels import dispatch
    from nvdb_tpu.utils import round_up

    backend = jax.default_backend()
    log(f"backend={backend} devices={jax.devices()}")

    # synthesize the store on-device (host->device of GBs through the relay is
    # not part of the measured workload)
    Np = round_up(args.n, 4096)  # let the auto tile picker reach T=4096
    Dp = round_up(args.d, 128)
    scales = None

    # chunked on-device synthesis: the f32 intermediate of one chunk (<=1.5GB)
    # is freed before the next, so capacity demos (16M x 768 int8 = 12.3 GB
    # resident on a 16 GB chip) don't OOM on a full-size f32 staging array
    chunk = min(Np, 1 << 19)
    while Np % chunk != 0:
        chunk //= 2

    @jax.jit
    def synth_chunk(key):
        x = jax.random.normal(key, (chunk, Dp), dtype=jnp.float32)
        if args.dtype == "bf16":
            return x.astype(jnp.bfloat16), None
        if args.dtype == "i8":
            amax = jnp.max(jnp.abs(x), axis=1)
            sc = jnp.where(amax > 0, amax / 127.0, 1.0)
            q = jnp.clip(jnp.round(x / sc[:, None]), -127, 127).astype(jnp.int8)
            return q, sc
        return x, None

    from functools import partial

    @partial(jax.jit, donate_argnums=(0,))
    def place(buf, part, r0):
        return jax.lax.dynamic_update_slice(buf, part, (r0, 0))

    @partial(jax.jit, donate_argnums=(0,))
    def place1(buf, part, r0):
        return jax.lax.dynamic_update_slice(buf, part, (r0,))

    store_dt = {"f32": jnp.float32, "bf16": jnp.bfloat16,
                "i8": jnp.int8}[args.dtype]
    base = jnp.zeros((Np, Dp), dtype=store_dt)
    scales = jnp.ones((Np,), jnp.float32) if args.dtype == "i8" else None
    for ci in range(Np // chunk):
        b_c, s_c = synth_chunk(jax.random.PRNGKey(ci))
        base = place(base, b_c, ci * chunk)   # donated: updated in place
        if s_c is not None:
            scales = place1(scales, s_c, ci * chunk)
    base = jax.block_until_ready(base)
    if scales is not None:
        scales = jax.block_until_ready(scales)
    qpool = jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(1), (args.batch * 4, Dp), jnp.float32))

    n_valid, k = args.n, args.k

    @jax.jit
    def scan(q, v, s):
        return dispatch.flat_topk(q, v, s, n_valid, k, backend="auto")

    @jax.jit
    def scan_nos(q, v):
        return dispatch.flat_topk(q, v, None, n_valid, k, backend="auto")

    @jax.jit
    def scan_qi8(qi, qs, v, s):
        return dispatch.flat_topk(qi, v, s, n_valid, k, backend="auto",
                                  query_scales=qs)

    rk = max(args.refine_k, k) if args.refine_k else 0

    @jax.jit
    def scan_qi8_refined(qf, qi, qs, v, s):
        # exact i8 mode: i8 x i8 scan -> fused f32-query dot rerank of the
        # top-rk (restores the f32-query ranking, ~rk rows of extra work).
        # Routed through the measured pallas-vs-jnp crossover: at B=512/R=50
        # the candidate count (25.6K rows) is far past the ~3.2K crossover,
        # where the pallas kernel's aligned-block DMA costs ~9 ms/scan vs
        # well under 1 ms for the fused XLA gather.
        vv, ii = dispatch.flat_topk(qi, v, s, n_valid, rk, backend="auto",
                                    query_scales=qs)
        return dispatch.exact_refine(qf, ii, v, s, k, metric="dot")

    B = args.batch
    if args.qi8:
        assert args.dtype == "i8", "--qi8 requires --dtype i8"
        # query quantization is a one-time client-side step, not part of
        # the per-scan loop (the reference keeps queries f32; this is the
        # opt-in native-int8 path, _scores i8 x i8 branch)
        amaxq = jnp.max(jnp.abs(qpool), axis=1)
        qsc = jnp.where(amaxq > 0, amaxq / 127.0, 1.0)
        qpool_i8 = jax.block_until_ready(jnp.clip(
            jnp.round(qpool / qsc[:, None]), -127, 127).astype(jnp.int8))

        def run(qs_slice, i8slices=None):
            lo = run.idx[0] * B
            hi = lo + B
            run.idx[0] = (run.idx[0] + 1) % 4
            if rk:
                return scan_qi8_refined(qpool[lo:hi], qpool_i8[lo:hi],
                                        qsc[lo:hi], base, scales)
            return scan_qi8(qpool_i8[lo:hi], qsc[lo:hi], base, scales)
        run.idx = [0]
    else:
        def run(qs):
            if scales is not None:
                return scan(qs, base, scales)
            return scan_nos(qs, base)
    slices = [qpool[i * B:(i + 1) * B] for i in range(4)]

    # warmup / compile (reference warms up too, nvdb_bench.cpp:317-322)
    t0 = time.perf_counter()
    first_ids = np.asarray(run(slices[0])[1])
    log(f"compile+first scan: {time.perf_counter() - t0:.1f}s")
    if args.qi8 and rk:
        # exactness evidence for the refined mode: top-k vs the TRUE
        # f32-query oracle (f32-HIGHEST over the dequantized store). Note
        # scan_topk on an int8 store casts queries to bf16 inside the
        # matmul — that pseudo-oracle itself mis-orders ~4% of positions
        # vs truth, so it must NOT be the comparison target here.
        if args.n * Dp * 4 <= 6 * 1024**3:
            from nvdb_tpu.kernels import ops as _ops
            deq = base.astype(jnp.float32) * scales[:, None]
            ji = np.asarray(_ops.scan_topk(slices[0], deq, None,
                                           n_valid, k)[1])
            del deq
            log(f"refined-vs-true-f32-oracle id match: "
                f"{np.mean(ji == first_ids):.4f}")
        else:
            log("oracle check skipped (dequantized store would exceed HBM)")
    for s in slices[1:]:
        _ = np.asarray(run(s)[1])

    # steady state: chained scans, one trailing fetch per timing window
    iters = args.iters
    t0 = time.perf_counter()
    r = None
    for i in range(iters):
        r = run(slices[i % 4])
    _ = np.asarray(r[1])
    dt = (time.perf_counter() - t0) / iters

    bpe = {"f32": 4, "bf16": 2, "i8": 1}[args.dtype]
    payload = args.n * args.d * bpe + (args.n * 4 if args.dtype == "i8" else 0)
    qps = B / dt
    gbps = (Np * Dp * bpe) / dt / 1e9
    log(f"{args.dtype} {args.n}x{args.d} B={B}: {dt*1e3:.3f} ms/scan "
        f"{qps:.1f} QPS  {gbps:.1f} GB/s effective")

    baseline_qps = 57.4  # reference 1M FP16 flat scan, OMP@8 (384-D!)
    dt = "i8xi8" if args.qi8 else args.dtype
    if args.qi8 and rk:
        dt = f"i8xi8r{args.refine_k}"
    metric = f"flatscan_{dt}_{args.n//1000}Kx{args.d}_b{B}_qps"
    print(json.dumps({
        "metric": metric,
        "value": round(qps, 1),
        "unit": "QPS",
        "vs_baseline": round(qps / baseline_qps, 2),
    }))


if __name__ == "__main__":
    main()
