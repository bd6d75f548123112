"""TPU hello-world: device properties + a trivial kernel round-trip — the
nvdb_cuda_sanity analogue (apps/nvdb_cuda_sanity.cu:16-39)."""

from __future__ import annotations

import sys

from nvdb_tpu.tools._common import make_parser, setup_jax


def main(argv=None):
    p = make_parser(__doc__)
    args = p.parse_args(argv)
    setup_jax(args)

    import jax
    import jax.numpy as jnp

    devs = jax.devices()
    print(f"backend={jax.default_backend()} n_devices={len(devs)}")
    for d in devs:
        print(f"  device {d.id}: {d.device_kind} ({d.platform})")

    # add1 round-trip through a pallas kernel (interpret off-TPU)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def add1(ref, out):
        out[:] = ref[:] + 1.0

    x = jnp.zeros((8, 128), jnp.float32)
    y = pl.pallas_call(
        add1,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(x)
    ok = float(y[3, 64]) == 1.0
    print(f"pallas add1 kernel: {'OK' if ok else 'MISMATCH'}")
    sys.exit(0 if ok else 2)


if __name__ == "__main__":
    main()
