"""Multi-host (multi-process) scaffolding for scale-out serving.

The reference tops out at one node: its distribution story is OMP threads over
one DDR4 socket (flat_index_omp.cpp) and one CUDA device (cuda_refine.cu); the
100M-row configuration in BASELINE.json configs[4] is listed as a stretch goal
it never runs. On TPU the same axis scales across hosts: each process owns the
chips attached to it, `jax.distributed.initialize` stitches the processes into
one global runtime, and the row-sharded search path (dist/sharded.py) runs
unchanged over the global mesh — shard_map collectives ride ICI between chips
of one slice and DCN between slices.

What this module adds on top of dist/mesh.py:

- `init_from_env()` — idempotent `jax.distributed.initialize` driven by env
  knobs (NVDB_COORD / NVDB_NPROC / NVDB_PROC_ID, falling back to JAX's own
  auto-detection on TPU pods where the runtime publishes topology).
- `global_row_mesh()` — a rows×q mesh over *global* devices (all processes).
- `load_sharded(path, mesh)` — process-sharded vecbin loading: the existing
  `VectorStore.from_vecbin` streams via `jax.make_array_from_callback`, which
  only invokes the callback for shards addressable by THIS process — so each
  host mmap-reads exactly its own row range of the file. No host ever
  materializes the full matrix. This function just wires the global sharding
  in and asserts the invariant.

Single-process use (tests, the one-chip container) is a degenerate case: all
helpers work with `jax.distributed` uninitialized.

Capacity math for the 100M stretch target (see docs/SCALE_100M.md for the
full plan): 100M x 768 int8 = 76.8 GB payload + 0.4 GB scales; a v5e-8 slice
(8 chips x 16 GB) holds it at 9.65 GB/chip — one slice, one host, no DCN.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nvdb_tpu.dist import mesh as mesh_lib
from nvdb_tpu.store.store import VectorStore

_INITIALIZED = False


def init_from_env() -> bool:
    """Initialize `jax.distributed` from env knobs; returns True if a
    multi-process runtime was started.

    Knobs (all three required for explicit wiring):
      NVDB_COORD    coordinator address, e.g. "10.0.0.1:8476"
      NVDB_NPROC    total process count
      NVDB_PROC_ID  this process's rank

    With none set: on a TPU pod runtime JAX auto-detects topology, so
    `jax.distributed.initialize()` is still called when NVDB_MULTIHOST=1;
    otherwise (single process, CPU, the one-chip dev container) this is a
    no-op. Idempotent: safe to call from every tool entry point.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    coord = os.environ.get("NVDB_COORD")
    nproc = os.environ.get("NVDB_NPROC")
    proc_id = os.environ.get("NVDB_PROC_ID")
    if coord and nproc and proc_id is not None:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(proc_id),
        )
        _INITIALIZED = True
        return True
    if os.environ.get("NVDB_MULTIHOST") == "1":
        # TPU pod: the runtime publishes coordinator/topology; bare initialize
        # works. (Guarded behind an explicit opt-in so single-host tools never
        # block waiting for a coordinator that does not exist.)
        jax.distributed.initialize()
        _INITIALIZED = True
        return True
    return False


def global_row_mesh(n_q: int = 1) -> Mesh:
    """rows x q mesh over ALL global devices (every process's chips).

    Under a multi-process runtime `jax.devices()` already returns the global
    device list ordered by process, so consecutive row shards land on
    consecutive processes — the row range each host loads from the vecbin file
    is contiguous.
    """
    devs = jax.devices()
    n_rows = len(devs) // n_q
    use = np.array(devs[: n_rows * n_q]).reshape(n_rows, n_q)
    return Mesh(use, (mesh_lib.ROWS, mesh_lib.QUERIES))


def load_sharded(
    path: str,
    mesh: Optional[Mesh] = None,
    row_block: int = 1024,
) -> VectorStore:
    """Process-sharded streamed load of a vecbin file over a global mesh.

    Each process's `make_array_from_callback` callback fires only for its own
    addressable shards (jax guarantees this), so host RSS per process is one
    shard block and file IO per host covers only its row range — the multi-host
    generalization of the reference's single-host mmap zero-copy load
    (mmap_file.cpp:39-56).
    """
    if mesh is None:
        mesh = global_row_mesh()
    n_shards = mesh.shape[mesh_lib.ROWS]
    sharding = NamedSharding(mesh, P(mesh_lib.ROWS, None))
    return VectorStore.from_vecbin(
        path, row_block=row_block, sharding=sharding, n_shards=n_shards)


def process_summary() -> str:
    """One-line topology description for tool banners / logs."""
    return (f"process {jax.process_index()}/{jax.process_count()} "
            f"local_devices={len(jax.local_devices())} "
            f"global_devices={len(jax.devices())}")
