"""Multi-host scaffolding (dist/multihost.py), exercised in its degenerate
single-process form on the 8-virtual-device CPU mesh.

A true multi-process run needs a pod; what IS testable here and meaningful:
- init_from_env is a no-op without the env knobs (tools can call it blindly),
- global_row_mesh covers all devices with contiguous row shards,
- load_sharded streams a vecbin file into a row-sharded store whose shards
  reassemble to the file contents, and search over it matches the oracle.
"""

import os

import numpy as np
import jax
import pytest

from nvdb_tpu.dist import mesh as meshmod
from nvdb_tpu.dist import multihost
from nvdb_tpu.dist.sharded import ShardedFlatIndex
from nvdb_tpu.formats import synth, vecbin


def test_init_noop_without_env(monkeypatch):
    for k in ("NVDB_COORD", "NVDB_NPROC", "NVDB_PROC_ID", "NVDB_MULTIHOST"):
        monkeypatch.delenv(k, raising=False)
    assert multihost.init_from_env() is False
    assert "process 0/1" in multihost.process_summary()


def test_global_row_mesh_shape():
    m = multihost.global_row_mesh()
    assert m.shape[meshmod.ROWS] == len(jax.devices())
    m2 = multihost.global_row_mesh(n_q=2)
    assert m2.shape[meshmod.ROWS] == len(jax.devices()) // 2
    assert m2.shape[meshmod.QUERIES] == 2


def test_load_sharded_roundtrip_and_search(tmp_path):
    base = synth.clustered(3000, 48, n_clusters=12, seed=7)
    path = str(tmp_path / "base.vecbin")
    vecbin.write_vecbin(path, base.astype(np.float32))

    mesh = multihost.global_row_mesh()
    store = multihost.load_sharded(path, mesh, row_block=64)
    assert store.n == 3000 and store.d == 48
    n_shards = mesh.shape[meshmod.ROWS]
    assert store.n_padded % n_shards == 0
    # every shard is owned by exactly one device, rows reassemble to the file
    assembled = np.asarray(store.vectors)[:3000, :48]
    np.testing.assert_allclose(assembled, base, atol=0, rtol=0)

    queries, _ = synth.sample_queries(base, 8, seed=9, perturb=0.05)
    idx = ShardedFlatIndex(store, mesh=mesh, backend="jnp")
    vals, ids = idx.search(queries, 10)
    s64 = queries.astype(np.float64) @ base.T.astype(np.float64)
    ref = np.sort(s64, axis=1)[:, ::-1][:, :10]
    got = np.take_along_axis(s64, ids.astype(np.int64), axis=1)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=0)


def test_load_sharded_i8(tmp_path):
    base = synth.clustered(1024, 32, n_clusters=8, seed=17)
    q, scales = vecbin.quantize_i8(base.astype(np.float32))
    path = str(tmp_path / "base_i8.vecbin")
    vecbin.write_vecbin(path, q, scales=scales)
    store = multihost.load_sharded(path, multihost.global_row_mesh(),
                                   row_block=16)
    assert store.scales is not None
    np.testing.assert_allclose(np.asarray(store.scales)[:1024], scales,
                               rtol=1e-6)
