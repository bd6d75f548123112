"""Device-mesh helpers.

The reference is single-process/single-node; its only distribution axis is
row-sharding the base matrix across CPU threads (SURVEY.md §2.4.1). Here that
axis becomes a device-mesh axis: the base store is sharded over ``"rows"`` and
query batches can additionally be sharded over ``"q"`` — the TPU replacement for
the OMP/async/pool scheduling variants and the (absent) distributed backend.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ROWS = "rows"
QUERIES = "q"


def row_mesh(n_devices: Optional[int] = None, n_q: int = 1,
             devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Mesh with a ``rows`` axis (base sharding) and optional ``q`` axis (query
    parallelism). rows x q must equal the device count used."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is None:
        n_devices = len(devs) // n_q
    use = np.array(devs[: n_devices * n_q]).reshape(n_devices, n_q)
    return Mesh(use, (ROWS, QUERIES))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """[N, D] base matrix sharded by rows, dims replicated."""
    return NamedSharding(mesh, P(ROWS, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
