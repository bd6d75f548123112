"""Worker for the real multi-process jax.distributed test.

Launched N times by tests/test_multiprocess.py with NVDB_COORD /
NVDB_NPROC / NVDB_PROC_ID set (the explicit wiring of
dist/multihost.init_from_env) and a CPU backend with several virtual
devices per process. Every process runs the same SPMD program:

  init_from_env -> global_row_mesh -> load_sharded(vecbin) ->
  ShardedFlatIndex.search -> write the (replicated) result ids.

Each process mmap-reads only its own row range of the file; the parent
asserts both ranks produced identical, oracle-exact results.

Usage: multiproc_worker.py <base.vecbin> <queries.npy> <k> <outdir>
"""

import os
import sys

import numpy as np


def main():
    base_path, q_path, k, outdir = sys.argv[1:5]
    k = int(k)

    import jax
    jax.config.update("jax_platforms", "cpu")  # sitecustomize pins axon

    from nvdb_tpu.dist import multihost
    from nvdb_tpu.dist import mesh as meshmod
    from nvdb_tpu.dist.sharded import ShardedFlatIndex
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert multihost.init_from_env(), "env knobs missing"
    rank = jax.process_index()
    assert jax.process_count() == int(os.environ["NVDB_NPROC"])

    mesh = multihost.global_row_mesh()
    store = multihost.load_sharded(base_path, mesh, row_block=64)

    queries = np.load(q_path)
    qp = store.pad_queries(queries)
    q_global = jax.device_put(qp, NamedSharding(mesh, P(None, None)))

    idx = ShardedFlatIndex(store, mesh=mesh, backend="jnp")
    vals, ids = idx.search_device(q_global, k)
    # outputs are replicated -> fully materializable on every process
    ids_np = np.asarray(jax.device_get(ids))
    vals_np = np.asarray(jax.device_get(vals))

    np.save(os.path.join(outdir, f"ids_{rank}.npy"), ids_np)
    np.save(os.path.join(outdir, f"vals_{rank}.npy"), vals_np)
    print(f"OK rank={rank} {multihost.process_summary()}", flush=True)


if __name__ == "__main__":
    main()
