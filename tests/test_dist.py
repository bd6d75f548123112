"""Multi-device sharded search on the 8-device virtual CPU mesh — the
"multi-node without a cluster" capability (SURVEY.md §4e)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nvdb_tpu.dist import mesh as meshmod
from nvdb_tpu.dist.sharded import ShardedFlatIndex, sharded_flat_topk
from nvdb_tpu.formats import synth, vecbin
from nvdb_tpu.store import VectorStore


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return meshmod.row_mesh(8)


@pytest.fixture(scope="module")
def data():
    base = synth.clustered(4000, 64, n_clusters=16, seed=31)
    queries, _ = synth.sample_queries(base, 16, seed=32, perturb=0.05)
    return base, queries


def _oracle_ids(base, queries, k):
    s = queries.astype(np.float64) @ base.T.astype(np.float64)
    return np.argsort(-s, axis=1, kind="stable")[:, :k], s


def test_sharded_matches_oracle(mesh8, data):
    base, queries = data
    store = VectorStore.from_numpy(
        base, "f32", row_block=128, sharding=meshmod.row_sharding(mesh8), n_shards=8)
    assert store.n_padded % 8 == 0
    idx = ShardedFlatIndex(store, mesh=mesh8, backend="jnp")
    vals, ids = idx.search(queries, 10)
    ref_ids, s64 = _oracle_ids(base, queries, 10)
    got64 = np.take_along_axis(s64, ids.astype(np.int64), axis=1)
    ref64 = np.take_along_axis(s64, ref_ids, axis=1)
    np.testing.assert_allclose(got64, ref64, atol=1e-5, rtol=0)
    assert ids.max() < 4000


def test_sharded_matches_single_device(mesh8, data):
    """Differential: sharded result == single-device result (modulo ties)."""
    from nvdb_tpu.index.flat import FlatIndex

    base, queries = data
    sharded_store = VectorStore.from_numpy(
        base, "f32", row_block=128, sharding=meshmod.row_sharding(mesh8), n_shards=8)
    single_store = VectorStore.from_numpy(base, "f32", row_block=128)
    sv, si = ShardedFlatIndex(sharded_store, mesh=mesh8, backend="jnp").search(queries, 10)
    fv, fi = FlatIndex(single_store, backend="jnp").search(queries, 10)
    np.testing.assert_allclose(sv, fv, atol=1e-5, rtol=1e-5)


def test_sharded_i8(mesh8, data):
    base, queries = data
    q8, scales = vecbin.quantize_i8(base)
    store = VectorStore.from_numpy(
        q8, "i8", scales=scales, row_block=128,
        sharding=meshmod.row_sharding(mesh8), n_shards=8)
    idx = ShardedFlatIndex(store, mesh=mesh8, backend="jnp")
    _, ids = idx.search(queries, 10)
    deq = vecbin.dequantize_i8(q8, scales)
    ref_ids, _ = _oracle_ids(deq, queries, 10)
    hits = sum(len(set(a) & set(b)) for a, b in zip(ids.tolist(), ref_ids.tolist()))
    assert hits / ref_ids.size >= 0.9


def test_store_actually_sharded(mesh8, data):
    base, _ = data
    store = VectorStore.from_numpy(
        base, "f32", row_block=128, sharding=meshmod.row_sharding(mesh8), n_shards=8)
    shard_shapes = {s.data.shape for s in store.vectors.addressable_shards}
    assert shard_shapes == {(store.n_padded // 8, store.d_padded)}


def test_query_sharded_axis(data):
    """2-D mesh: 4-way rows x 2-way queries."""
    base, queries = data
    mesh = meshmod.row_mesh(4, n_q=2)
    store = VectorStore.from_numpy(
        base, "f32", row_block=128,
        sharding=jax.NamedSharding(mesh, jax.P(meshmod.ROWS, None)), n_shards=4)
    vals, ids = sharded_flat_topk(
        mesh, jnp.asarray(store.pad_queries(queries)), store.vectors, None,
        store.n, 10, backend="jnp", shard_queries=True)
    ref_ids, s64 = _oracle_ids(base, queries, 10)
    got64 = np.take_along_axis(s64, np.asarray(ids, dtype=np.int64), axis=1)
    ref64 = np.take_along_axis(s64, ref_ids, axis=1)
    np.testing.assert_allclose(got64, ref64, atol=1e-5, rtol=0)


def test_sharded_ivf(mesh8, data):
    """Lists sharded over 8 devices: recall at equal total probes must be close
    to the single-device index; full probing must be exact."""
    from nvdb_tpu.index.ivf_flat import IVFFlatIndex
    from nvdb_tpu.dist.sharded_ivf import ShardedIVFFlatIndex

    base, queries = data
    ref_ids, s64 = _oracle_ids(base, queries, 10)
    ivf = IVFFlatIndex.build(base, nlist=40, dtype="f32", n_iters=6, seed=4)
    sh = ShardedIVFFlatIndex.from_index(ivf, mesh8)
    assert sh.nlist % 8 == 0  # padded from 40 to 48

    # full probing == exact
    _, ids_full = sh.search(queries, 10, nprobe=sh.nlist)
    got64 = np.take_along_axis(s64, ids_full.astype(np.int64), axis=1)
    ref64 = np.take_along_axis(s64, ref_ids, axis=1)
    np.testing.assert_allclose(got64, ref64, atol=1e-5, rtol=0)

    # partial probing: within a few points of the single-device recall
    def rec(ids):
        return sum(len(set(a.tolist()) & set(b.tolist()))
                   for a, b in zip(ids, ref_ids)) / ref_ids.size
    _, ids_sh = sh.search(queries, 10, nprobe=16)
    _, ids_1d = ivf.search(queries, 10, nprobe=16)
    assert rec(ids_sh) >= rec(ids_1d) - 0.1
    assert ids_full.max() < 4000


def test_sharded_lloyd_step(mesh8, data):
    """Distributed k-means step: psum'd centroid update must equal the
    single-device Lloyd update on the same data."""
    import jax.numpy as jnp
    from nvdb_tpu.dist.sharded import sharded_lloyd_step
    from nvdb_tpu.kernels.kmeans import _lloyd_step

    base, _ = data
    store = VectorStore.from_numpy(
        base, "f32", row_block=128, sharding=meshmod.row_sharding(mesh8),
        n_shards=8)
    cents0 = jnp.asarray(store.pad_queries(base[:16]))

    new_sh, obj_sh = sharded_lloyd_step(mesh8, store.vectors, cents0, store.n)

    # single-device oracle over the same padded array with valid-row masking
    host = np.asarray(store.vectors)
    valid = np.zeros(store.n_padded, np.float32)
    valid[: store.n] = 1.0
    vw = jnp.asarray(host * valid[:, None])
    sums, counts, obj = _lloyd_step(vw[None], cents0, 16)
    import jax

    a = np.asarray(jax.vmap(lambda c: jnp.argmin(
        jnp.sum((vw - c) ** 2, axis=1)))(cents0))  # noqa: F841 (sanity only)
    pad_assign = np.asarray(
        jnp.argmin(jnp.sum(cents0**2, 1)[None, :] - 2 * vw @ cents0.T, axis=1))
    pad_onehot = np.eye(16, dtype=np.float32)[pad_assign]
    pad_counts = (pad_onehot * (1.0 - valid)[:, None]).sum(0)
    counts = np.asarray(counts) - pad_counts
    expect = np.where(counts[:, None] > 0.5,
                      np.asarray(sums) / np.maximum(counts, 1.0)[:, None],
                      np.asarray(cents0))
    np.testing.assert_allclose(np.asarray(new_sh), expect, atol=1e-4)


def test_streamed_vecbin_load_sharded(mesh8, data, tmp_path):
    """from_vecbin loads straight from mmap into the sharded store; values and
    search results equal the from_numpy path."""
    base, queries = data
    p = str(tmp_path / "s.vecbin")
    vecbin.write_vecbin(p, base)
    sh = meshmod.row_sharding(mesh8)
    st_file = VectorStore.from_vecbin(p, row_block=128, sharding=sh, n_shards=8)
    st_mem = VectorStore.from_numpy(base, "f32", row_block=128, sharding=sh,
                                    n_shards=8)
    assert st_file.n == st_mem.n and st_file.n_padded == st_mem.n_padded
    np.testing.assert_array_equal(np.asarray(st_file.vectors),
                                  np.asarray(st_mem.vectors))
    v1, i1 = ShardedFlatIndex(st_file, mesh=mesh8, backend="jnp").search(queries[:8], 5)
    v2, i2 = ShardedFlatIndex(st_mem, mesh=mesh8, backend="jnp").search(queries[:8], 5)
    np.testing.assert_array_equal(i1, i2)


def test_streamed_vecbin_load_i8(mesh8, data, tmp_path):
    base, _ = data
    q8, sc = vecbin.quantize_i8(base)
    p = str(tmp_path / "s8.vecbin")
    vecbin.write_vecbin(p, q8, dtype="i8", scales=sc)
    st = VectorStore.from_vecbin(p, row_block=128,
                                 sharding=meshmod.row_sharding(mesh8), n_shards=8)
    np.testing.assert_array_equal(
        np.asarray(st.vectors)[: st.n, : st.d], q8)
    np.testing.assert_array_equal(np.asarray(st.scales)[: st.n], sc)


def test_sharded_ivfpq(mesh8, data):
    """PQ lists sharded over 8 devices: full probing + refine must recover the
    exact top-k; partial probing must be close to the single-device index."""
    from nvdb_tpu.index.ivf_pq import IVFPQIndex
    from nvdb_tpu.dist.sharded_ivf import ShardedIVFPQIndex

    base, queries = data
    ref_ids, s64 = _oracle_ids(base, queries, 10)
    pqi = IVFPQIndex.build(base, nlist=40, m=16, use_opq=False,
                           train_size=4000, seed=4)
    sh = ShardedIVFPQIndex.from_index(pqi, mesh8)
    assert sh.nlist % 8 == 0

    dp = sh.centroids.shape[1]

    class _Store:
        vectors = jnp.asarray(np.pad(base, ((0, 0), (0, dp - base.shape[1]))))
        scales = None

    # full probing + deep exact refine recovers the exact top-k (L2 == dot
    # rank on normalized rows)
    _, ids_full = sh.search(queries, 10, nprobe=sh.nlist, refine_k=200,
                            refine_store=_Store)
    got64 = np.take_along_axis(s64, ids_full.astype(np.int64), axis=1)
    ref64 = np.take_along_axis(s64, ref_ids, axis=1)
    np.testing.assert_allclose(got64, ref64, atol=1e-4, rtol=0)
    assert ids_full.max() < 4000

    # partial probing: ADC-only candidates close to single-device ADC
    def rec(ids):
        return sum(len(set(a.tolist()) & set(b.tolist()))
                   for a, b in zip(ids, ref_ids)) / ref_ids.size
    _, ids_sh = sh.search(queries, 10, nprobe=16)
    _, ids_1d = pqi.search(queries, 10, nprobe=16)
    assert rec(ids_sh) >= rec(ids_1d) - 0.1


def test_sharded_partition(mesh8, data):
    """Sharded partition-then-rerank (the multi-chip hnswlib replacement):
    full probing + exact rerank == oracle; partial probing ~= single-device."""
    from nvdb_tpu.dist.sharded_ivf import ShardedPartitionIndex
    from nvdb_tpu.index.partition import PartitionRerankIndex

    base, queries = data
    ref_ids, s64 = _oracle_ids(base, queries, 10)
    pr = PartitionRerankIndex.build(base, nlist=40, with_refine=True, seed=5)
    sh = ShardedPartitionIndex.from_index(pr, mesh8)
    assert sh.nlist % 8 == 0

    _, ids_full = sh.search(queries, 10, nprobe=sh.nlist, rerank_k=50)
    got64 = np.take_along_axis(s64, ids_full.astype(np.int64), axis=1)
    ref64 = np.take_along_axis(s64, ref_ids, axis=1)
    np.testing.assert_allclose(got64, ref64, atol=1e-4, rtol=0)
    assert ids_full.max() < 4000

    def rec(ids):
        return sum(len(set(a.tolist()) & set(b.tolist()))
                   for a, b in zip(ids, ref_ids)) / ref_ids.size

    _, ids_sh = sh.search(queries, 10, nprobe=16, rerank_k=50)
    _, ids_1d = pr.search(queries, 10, nprobe=16, rerank_k=50)
    assert rec(ids_sh) >= rec(ids_1d) - 0.1


def test_sharded_ivfpq_replicated_dedup():
    """A replicated index sharded over the mesh: a row's two copies can live
    on different shards, so the cross-shard merge must dedup — output ids
    unique, recall within noise of the single-device replicated search."""
    import numpy as np
    from nvdb_tpu.index.ivf_pq import IVFPQIndex
    from nvdb_tpu.dist import mesh as meshmod
    from nvdb_tpu.dist.sharded_ivf import ShardedIVFPQIndex

    rng = np.random.default_rng(21)
    base = rng.standard_normal((8000, 64)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    q = base[rng.choice(8000, 16, replace=False)]
    one = IVFPQIndex.build(base, nlist=32, m=8, use_opq=False, n_iters=6,
                           seed=7)
    rep = IVFPQIndex.repack(one, base, pad_factor=2.0, replicas=2)
    sh = ShardedIVFPQIndex.from_index(rep, meshmod.row_mesh(8))
    assert sh.replicas == 2
    _, i_single = rep.search(q, 10, nprobe=32)
    _, i_shard = sh.search(q, 10, nprobe=32)
    for row in np.asarray(i_shard):
        assert len(set(row.tolist())) == 10
    agree = np.mean([len(set(a) & set(b)) / 10 for a, b in
                     zip(np.asarray(i_single).tolist(),
                         np.asarray(i_shard).tolist())])
    assert agree >= 0.9  # full probing; shard union ~= global probing


def test_sharded_refine_matches_oracle(mesh8, data):
    """Each shard reranks only the candidate rows it owns from its LOCAL
    store shard (the 100M-scale refine, VERDICT r2 weak #8); the all_gather
    merge must equal the single-device exact_rerank oracle."""
    from nvdb_tpu.dist.sharded_ivf import sharded_refine
    from nvdb_tpu.kernels import ops

    base, queries = data
    rng = np.random.default_rng(21)
    store = VectorStore.from_numpy(
        base, "f32", row_block=128, sharding=meshmod.row_sharding(mesh8),
        n_shards=8)
    B, R, k = 16, 40, 10
    cand = np.stack([rng.choice(4000, R, replace=False) for _ in range(B)]
                    ).astype(np.int32)
    cand[0, 25:] = -1
    qp = store.pad_queries(queries)
    sv, si = sharded_refine(mesh8, jnp.asarray(qp), jnp.asarray(cand),
                            store.vectors, store.scales, k)
    rows = np.where(cand[..., None] >= 0,
                    np.pad(base, ((0, 0), (0, store.d_padded - base.shape[1])))
                    [np.maximum(cand, 0)], 0.0)
    jv, ji = ops.exact_rerank(jnp.asarray(qp), jnp.asarray(rows),
                              jnp.asarray(cand), k)
    assert np.mean(np.asarray(si) == np.asarray(ji)) == 1.0
    np.testing.assert_allclose(np.asarray(sv), np.asarray(jv),
                               rtol=1e-4, atol=1e-4)


def test_sharded_refine_i8(mesh8, data):
    from nvdb_tpu.dist.sharded_ivf import sharded_refine
    from nvdb_tpu.kernels import ops

    base, queries = data
    q8, scales = vecbin.quantize_i8(base)
    rng = np.random.default_rng(23)
    store = VectorStore.from_numpy(
        q8, "i8", scales=scales, row_block=128,
        sharding=meshmod.row_sharding(mesh8), n_shards=8)
    B, R, k = 16, 32, 5
    cand = np.stack([rng.choice(4000, R, replace=False) for _ in range(B)]
                    ).astype(np.int32)
    qp = store.pad_queries(queries)
    sv, si = sharded_refine(mesh8, jnp.asarray(qp), jnp.asarray(cand),
                            store.vectors, store.scales, k)
    eff = q8.astype(np.float32) * scales[:, None]
    rows = np.pad(eff, ((0, 0), (0, store.d_padded - eff.shape[1])))[cand]
    jv, ji = ops.exact_rerank(jnp.asarray(qp), jnp.asarray(rows),
                              jnp.asarray(cand), k)
    assert np.mean(np.asarray(si) == np.asarray(ji)) == 1.0


def test_sharded_ivfpq_with_sharded_refine_store(mesh8, data):
    """End-to-end: sharded IVF-PQ whose refine store is itself row-sharded
    — no stage materializes a full-corpus array on one device."""
    from nvdb_tpu.index.ivf_pq import IVFPQIndex
    from nvdb_tpu.dist.sharded_ivf import ShardedIVFPQIndex

    base, queries = data
    ref_ids, s64 = _oracle_ids(base, queries, 10)
    pqi = IVFPQIndex.build(base, nlist=40, m=16, use_opq=False,
                           train_size=4000, seed=4)
    sh = ShardedIVFPQIndex.from_index(pqi, mesh8)
    store = VectorStore.from_numpy(
        base, "f32", row_block=128, sharding=meshmod.row_sharding(mesh8),
        n_shards=8)
    # every vectors shard lives on one device only
    assert len(store.vectors.sharding.device_set) == 8

    _, ids_full = sh.search(queries, 10, nprobe=sh.nlist, refine_k=200,
                            refine_store=store)
    got64 = np.take_along_axis(s64, ids_full.astype(np.int64), axis=1)
    ref64 = np.take_along_axis(s64, np.asarray(ref_ids), axis=1)
    np.testing.assert_allclose(got64, ref64, atol=1e-4, rtol=0)
