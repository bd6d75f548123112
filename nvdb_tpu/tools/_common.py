"""Shared CLI plumbing for the tools."""

from __future__ import annotations

import argparse
import os
import sys


def make_parser(desc: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (with virtual devices)")
    p.add_argument("--backend", default="auto", choices=["auto", "jnp", "pallas"],
                   help="scan kernel backend (auto: pallas on TPU, jnp elsewhere)")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans — the numerical-sanitizer "
                        "analogue of the reference's ASan/UBSan build option")
    return p


def setup_jax(args) -> None:
    """Apply backend choice before any jax compute. Must be called before the
    first jax array op (the platform is locked at first backend use)."""
    import jax

    if getattr(args, "cpu", False):
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
        jax.config.update("jax_platforms", "cpu")
    if getattr(args, "debug_nans", False):
        jax.config.update("jax_debug_nans", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/nvdb_jax_tool_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # Multi-host entry: a no-op unless NVDB_COORD/NVDB_NPROC/NVDB_PROC_ID (or
    # NVDB_MULTIHOST=1 on a pod runtime) are set — every tool then joins the
    # global runtime before its first backend use (docs/SCALE_100M.md).
    from nvdb_tpu.dist import multihost
    if multihost.init_from_env():
        print(f"# {multihost.process_summary()}", file=sys.stderr)


def fail(msg: str, code: int = 1):
    print(f"error: {msg}", file=sys.stderr)
    sys.exit(code)
