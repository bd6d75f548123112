"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so multi-device sharding is
exercised without a TPU pod (the "multi-node without a cluster" strategy,
SURVEY.md §4). Pallas kernels auto-select interpret mode off-TPU. Must run
before jax is imported anywhere."""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# Force the CPU backend via jax.config, NOT os.environ: this container's
# sitecustomize (/root/.axon_site) pre-reads JAX_PLATFORMS=axon (the remote TPU
# tunnel) at interpreter startup, so env mutation here is too late.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA-CPU compiles are ~5-10s each here, and the
# suite compiles a dozen (batch, k, dtype) variants; cache makes re-runs fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/nvdb_jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

