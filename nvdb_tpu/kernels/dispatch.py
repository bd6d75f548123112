"""Backend dispatch for the flat-scan top-k.

The analogue of the reference's dtype/engine dispatch seam (score_dispatch.h:25-48
plus the st/omp/async/pool mode switch, nvdb_bench.cpp:300-314) — except on TPU all
scheduling variants collapse into one fused Pallas kernel; the jnp path is the
oracle/CPU fallback, and ``NVDB_FORCE_JNP=1`` is the A/B kill switch mirroring
``NVDB_FORCE_SCALAR`` (simd_dot.cpp:14-16)."""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax

from nvdb_tpu.kernels import ops


def default_backend() -> str:
    if os.environ.get("NVDB_FORCE_JNP", "0") == "1":
        return "jnp"
    return "pallas" if jax.default_backend() == "tpu" else "jnp"


def flat_topk(
    queries: jax.Array,
    vectors: jax.Array,
    scales: Optional[jax.Array],
    n_valid,
    k: int,
    backend: str = "auto",
    row_block: int = 1024,
    interpret: Optional[bool] = None,
    query_scales: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k dot-product scan of ``queries`` against the padded store."""
    if backend == "auto":
        backend = default_backend()
    if backend == "jnp":
        return ops.scan_topk(queries, vectors, scales, n_valid, k,
                             row_block=row_block, query_scales=query_scales)
    if backend == "pallas":
        from nvdb_tpu.kernels import flat_scan

        return flat_scan.pallas_flat_topk(
            queries, vectors, scales, n_valid, k, interpret=interpret,
            query_scales=query_scales)
    raise ValueError(f"unknown backend {backend!r}")
