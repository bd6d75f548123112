"""Quantify the relay round-trip cost inside chained timing loops.

Every chained timing window ends with ONE synchronous device->host fetch;
through the axon relay that fetch costs a full round-trip (~25-30 ms),
which amortizes into the reported per-iteration time as RTT/iters. Round-2
numbers (and round-3 one-shot A/Bs at iters=20) silently carried
RTT/20 ~= 1.4 ms per scan — at B=128 that is ~40% of the true kernel time.

This probe measures:
  1. bare fetch RTT: np.asarray of a tiny resident array, repeated;
  2. the chained flat scan at iters in {10, 20, 50, 100}, then a least-
     squares fit of  loop_ms = kernel_ms + rtt_ms / iters.

The fitted kernel_ms is the honest per-scan time; the fitted rtt_ms should
match (1). Prints RESULT lines for both.

Usage: rtt_probe.py [--n 1000000] [--d 768] [--b 128] [--merge extract]
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
    ap.add_argument("--b", type=int, default=128)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--merge", default="extract")
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    ap.add_argument("--reps", type=int, default=5,
                    help="samples per iters point")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/nvdb_jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from nvdb_tpu.kernels import flat_scan
    from nvdb_tpu.utils import round_up

    Np = round_up(args.n, 4096)
    Dp = round_up(args.d, 128)
    base = jax.random.normal(jax.random.PRNGKey(0), (Np, Dp), jnp.float32)
    if args.dtype == "bf16":
        base = base.astype(jnp.bfloat16)
    base = jax.block_until_ready(base)
    qpool = jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(1), (2 * args.b, Dp),
                          jnp.float32))

    # 1. bare fetch RTT on a tiny resident array
    tiny = jax.block_until_ready(jnp.zeros((8, args.k), jnp.int32))
    _ = np.asarray(tiny)
    ts = []
    for _i in range(20):
        t0 = time.perf_counter()
        _ = np.asarray(tiny)
        ts.append((time.perf_counter() - t0) * 1e3)
    ts = np.asarray(ts)
    print(f"RESULT probe=fetch_rtt ms_med={np.median(ts):.2f} "
          f"ms_p90={np.percentile(ts, 90):.2f} n=20", flush=True)

    # 2. chained scan at several iteration counts
    tile = flat_scan._pick_tile_rows(Np, base.dtype, Dp, args.b, args.merge)

    def run(q, base):
        return flat_scan.pallas_flat_topk(q, base, None, args.n, args.k,
                                          tile_rows=tile, merge=args.merge)

    runj = jax.jit(run)
    q0, q1 = qpool[: args.b], qpool[args.b:]
    t0 = time.perf_counter()
    _ = np.asarray(runj(q0, base)[1])
    log(f"compile+first {time.perf_counter()-t0:.1f}s")
    _ = np.asarray(runj(q1, base)[1])

    pts = []
    for iters in (10, 20, 50, 100):
        best = []
        for _r in range(args.reps):
            t0 = time.perf_counter()
            r = None
            for i in range(iters):
                r = runj(q0 if i % 2 == 0 else q1, base)
            _ = np.asarray(r[1])
            best.append((time.perf_counter() - t0) * 1e3 / iters)
        med = float(np.median(best))
        pts.append((iters, med))
        print(f"RESULT probe=chained merge={args.merge} B={args.b} "
              f"iters={iters} ms={med:.3f}", flush=True)

    # least squares: ms = kernel + rtt / iters
    A = np.array([[1.0, 1.0 / it] for it, _ in pts])
    y = np.array([m for _, m in pts])
    (kernel_ms, rtt_ms), *_ = np.linalg.lstsq(A, y, rcond=None)
    bpe = 2 if args.dtype == "bf16" else 4
    gbps = Np * Dp * bpe / (kernel_ms / 1e3) / 1e9
    print(f"RESULT probe=fit merge={args.merge} B={args.b} n={args.n} "
          f"d={args.d} kernel_ms={kernel_ms:.3f} rtt_ms={rtt_ms:.1f} "
          f"kernel_gbps={gbps:.1f}", flush=True)


if __name__ == "__main__":
    main()
