"""Measure the practically achievable HBM stream rate on this chip.

Three probes over the same ~1.6 GB bf16 array, timed with chained
dispatches + one trailing fetch (relay-honest):
  1. XLA's own full-array max-reduce — the vendor-tuned stream ceiling.
  2. A trivial Pallas grid kernel (per-tile max into scratch) — OUR
     pipeline's stream rate with zero compute, isolating Mosaic's
     double-buffered DMA from the MXU.
  3. The mmonly diagnostic matmul at B=128 for reference.

If (1) ~= (2) ~= the flat-scan mmonly rate, the ~456 GB/s plateau is the
platform's effective ceiling, not a kernel defect — the number the
roofline in BENCHMARKS.md should be stated against (VERDICT r2 next #1).
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--tile", type=int, default=4096)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/nvdb_jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from nvdb_tpu.utils import round_up

    Np = round_up(args.n, max(4096, args.tile))
    Dp = round_up(args.d, 128)
    base = jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(0), (Np, Dp), jnp.float32
                          ).astype(jnp.bfloat16))
    nbytes = Np * Dp * 2

    def timed(name, fn, *a):
        r = jax.block_until_ready(fn(*a))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = fn(*a)
        _ = np.asarray(jax.tree.leaves(r)[0])
        dt = (time.perf_counter() - t0) / args.iters
        print(f"RESULT probe={name} ms={dt*1e3:.3f} gbps={nbytes/dt/1e9:.1f}",
              flush=True)

    # 1. XLA reduce
    xla_max = jax.jit(lambda x: jnp.max(x))
    timed("xla_max", xla_max, base)

    # 2. Pallas stream-only kernel
    T = args.tile

    def kern(v_ref, out_ref, acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc[:] = jnp.full(acc.shape, -jnp.inf, jnp.float32)

        acc[:] = jnp.maximum(acc[:], jnp.max(v_ref[:].astype(jnp.float32),
                                             axis=0, keepdims=True)[:, :128])

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            out_ref[:] = acc[:]

    stream = pl.pallas_call(
        kern,
        grid=(Np // T,),
        in_specs=[pl.BlockSpec((T, Dp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=jax.default_backend() != "tpu",
    )
    timed("pallas_stream", jax.jit(lambda x: stream(x)), base)

    # 2b. same but with the grid dim marked parallel (no carried scratch
    # dependency -> Mosaic may deepen buffering); needs a different kernel
    def kern_p(v_ref, out_ref):
        out_ref[:] = jnp.max(v_ref[:].astype(jnp.float32), axis=0,
                             keepdims=True)[:, :128]

    stream_p = pl.pallas_call(
        kern_p,
        grid=(Np // T,),
        in_specs=[pl.BlockSpec((T, Dp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=jax.default_backend() != "tpu",
    )
    timed("pallas_stream_par", jax.jit(lambda x: stream_p(x)), base)

    # 3. manual 4-deep DMA ring: does buffering deeper than Mosaic's
    # default double-buffer lift the stream rate?
    DEPTH = 4
    nt = Np // T

    def kern_m(v_hbm, out_ref, bufs, acc, sems):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc[:] = jnp.full(acc.shape, -jnp.inf, jnp.float32)
            for d in range(1, DEPTH):
                if d <= nt - 1:
                    pltpu.make_async_copy(v_hbm.at[pl.ds((d - 1) * T, T)],
                                          bufs.at[d - 1], sems.at[d - 1]
                                          ).start()

        # wait for this step's tile, kick the one DEPTH-1 ahead
        slot = i % DEPTH

        @pl.when(i + DEPTH - 1 < nt)
        def _():
            pltpu.make_async_copy(
                v_hbm.at[pl.ds((i + DEPTH - 1) * T, T)],
                bufs.at[(i + DEPTH - 1) % DEPTH],
                sems.at[(i + DEPTH - 1) % DEPTH]).start()

        pltpu.make_async_copy(v_hbm.at[pl.ds(0, T)], bufs.at[slot],
                              sems.at[slot]).wait()
        acc[:] = jnp.maximum(acc[:], jnp.max(
            bufs[slot].astype(jnp.float32), axis=0, keepdims=True)[:, :128])

        @pl.when(i == nt - 1)
        def _():
            out_ref[:] = acc[:]

    from jax.experimental.pallas import tpu as _pt
    stream_m = pl.pallas_call(
        kern_m,
        grid=(nt,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((DEPTH, T, Dp), base.dtype),
                        pltpu.VMEM((1, 128), jnp.float32),
                        _pt.SemaphoreType.DMA((DEPTH,))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )
    # prologue (i==0) issues tiles 0..DEPTH-2 into bufs 0..DEPTH-2; each
    # step i then issues tile i+DEPTH-1 into buf (i+DEPTH-1)%DEPTH — every
    # tile started exactly once before its wait
    timed("pallas_stream_manual4", jax.jit(lambda x: stream_m(x)), base)


if __name__ == "__main__":
    main()
