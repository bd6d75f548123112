"""Compute kernels: pure-jnp reference ops (oracle + CPU fallback) and Pallas
TPU kernels for the hot paths."""

from nvdb_tpu.kernels.ops import scan_topk, merge_topk, exact_rerank  # noqa: F401
from nvdb_tpu.kernels.dispatch import flat_topk, default_backend  # noqa: F401
