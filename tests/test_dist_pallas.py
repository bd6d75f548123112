"""Pallas kernels inside the SHARDED serving paths (VERDICT r3 weak #1):
per-shard scans/reranks must run the same kernels as the single-device
flagship (interpret mode here; scripts/tpu_smoke.py gates real lowering).
Every test is a differential against the jnp path or an exact oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nvdb_tpu.dist import mesh as meshmod
from nvdb_tpu.dist.sharded_ivf import (
    ShardedIVFFlatIndex, ShardedIVFPQIndex, sharded_refine)
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


def test_sharded_ivf_flat_pallas(mesh8, data):
    """backend='pallas' routes each shard through the scalar-prefetch probe
    kernel (_ivf_probe_pallas) inside shard_map; full probing == oracle and
    partial probing == the jnp per-shard block (same probes, same lists)."""
    from nvdb_tpu.index.ivf_flat import IVFFlatIndex

    base, queries = data
    ref_ids, s64 = _oracle_ids(base, queries, 10)
    ivf = IVFFlatIndex.build(base, nlist=40, dtype="f32", n_iters=6, seed=4)
    sh = ShardedIVFFlatIndex.from_index(ivf, mesh8)

    _, ids_full = sh.search(queries, 10, nprobe=sh.nlist, backend="pallas")
    got64 = np.take_along_axis(s64, ids_full.astype(np.int64), axis=1)
    ref64 = np.take_along_axis(s64, ref_ids, axis=1)
    np.testing.assert_allclose(got64, ref64, atol=1e-5, rtol=0)

    # partial probing: identical candidate lists -> identical achieved
    # scores vs the jnp backend (bf16 packing rounds both paths the same)
    vp, ip = sh.search(queries, 10, nprobe=16, backend="pallas")
    vj, ij = sh.search(queries, 10, nprobe=16, backend="jnp")
    gp = np.take_along_axis(s64, ip.astype(np.int64), axis=1)
    gj = np.take_along_axis(s64, ij.astype(np.int64), axis=1)
    np.testing.assert_allclose(gp, gj, atol=1e-4, rtol=0)


def test_sharded_ivfpq_pallas_with_refine(mesh8, data):
    """Per-shard ADC on backend='pallas' (the gen-5/6 kernels) + exact refine
    at full probing recovers the exact top-k, and matches the jnp backend's
    refined ids exactly (refine re-scores both candidate sets in f32)."""
    from nvdb_tpu.index.ivf_pq import IVFPQIndex

    base, queries = data
    ref_ids, s64 = _oracle_ids(base, queries, 10)
    pqi = IVFPQIndex.build(base, nlist=40, m=16, use_opq=False,
                           train_size=4000, seed=4)
    sh = ShardedIVFPQIndex.from_index(pqi, mesh8)

    dp = sh.centroids.shape[1]

    class _Store:
        vectors = jnp.asarray(np.pad(base, ((0, 0), (0, dp - base.shape[1]))))
        scales = None

        @staticmethod
        def norms2():
            from nvdb_tpu.kernels.rerank import store_norms2
            return store_norms2(_Store.vectors)

    qp = np.zeros((16, dp), np.float32)
    qp[:, : base.shape[1]] = queries
    qj = jnp.asarray(qp)

    # rk=128 = the pallas ADC slot-buffer cap (adc_scan.K_LANES)
    _, ip = sh.search_device(qj, 10, nprobe=sh.nlist, refine_k=128,
                             refine_store=_Store, backend="pallas")
    got64 = np.take_along_axis(s64, np.asarray(ip).astype(np.int64), axis=1)
    ref64 = np.take_along_axis(s64, ref_ids, axis=1)
    np.testing.assert_allclose(got64, ref64, atol=1e-4, rtol=0)

    # same achieved scores as the jnp backend (ids can differ on ties at
    # the candidate tail: the key kernel ranks candidates at bf16
    # granularity, the refine re-scores both sets in f32)
    _, ij = sh.search_device(qj, 10, nprobe=sh.nlist, refine_k=128,
                             refine_store=_Store, backend="jnp")
    gj = np.take_along_axis(s64, np.asarray(ij).astype(np.int64), axis=1)
    np.testing.assert_allclose(got64, gj, atol=1e-4, rtol=0)


def test_sharded_ivfpq_ids_mode(mesh8, data):
    """ids_mode resolution mirrors the single-device rule: prefix-packed +
    replicas==1 -> 'key' (gen-5, no slot-id DMA); replicated -> 'dma'."""
    from nvdb_tpu.index.ivf_pq import IVFPQIndex

    base, _ = data
    pqi = IVFPQIndex.build(base, nlist=40, m=16, use_opq=False,
                           train_size=4000, seed=4)
    sh = ShardedIVFPQIndex.from_index(pqi, mesh8)
    assert sh.ids_mode() == "key"

    rep = IVFPQIndex.repack(pqi, base, pad_factor=2.0, replicas=2)
    shr = ShardedIVFPQIndex.from_index(rep, meshmod.row_mesh(8))
    assert shr.ids_mode() == "dma"


@pytest.mark.parametrize("metric", ["l2", "dot"])
def test_sharded_refine_pallas(mesh8, data, metric):
    """sharded_refine backend='pallas': each shard reranks its rows through
    the id-driven-DMA kernel on LOCAL ids, winners remapped to global ids
    before the merge — must equal the exact_rerank oracle on both metrics."""
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
                            store.vectors, store.scales, k, metric=metric,
                            backend="pallas", norms2=store.norms2())
    rows = np.where(cand[..., None] >= 0,
                    np.pad(base, ((0, 0), (0, store.d_padded - base.shape[1])))
                    [np.maximum(cand, 0)], 0.0)
    jv, ji = ops.exact_rerank(jnp.asarray(qp), jnp.asarray(rows),
                              jnp.asarray(cand), k, metric=metric)
    assert np.mean(np.asarray(si) == np.asarray(ji)) == 1.0
    np.testing.assert_allclose(np.asarray(sv), np.asarray(jv),
                               rtol=1e-4, atol=1e-4)


def test_sharded_refine_pallas_i8_auto_norms(mesh8, data):
    """int8 store + backend='pallas' with norms2 left None (derived inside
    from the sharded payload): scale folding s^2*||codes||^2 must match the
    dequantized oracle."""
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
                            store.vectors, store.scales, k,
                            backend="pallas")
    eff = q8.astype(np.float32) * scales[:, None]
    rows = np.pad(eff, ((0, 0), (0, store.d_padded - eff.shape[1])))[cand]
    jv, ji = ops.exact_rerank(jnp.asarray(qp), jnp.asarray(rows),
                              jnp.asarray(cand), k)
    assert np.mean(np.asarray(si) == np.asarray(ji)) == 1.0


def test_sharded_ivfpq_sharded_refine_pallas(mesh8, data):
    """The full 100M-layout path on pallas end to end: sharded ADC scan +
    sharded pallas refine over a row-sharded store — exact at full probing."""
    from nvdb_tpu.index.ivf_pq import IVFPQIndex

    base, queries = data
    ref_ids, s64 = _oracle_ids(base, queries, 10)
    pqi = IVFPQIndex.build(base, nlist=40, m=16, use_opq=False,
                           train_size=4000, seed=4)
    sh = ShardedIVFPQIndex.from_index(pqi, mesh8)
    store = VectorStore.from_numpy(
        base, "f32", row_block=128, sharding=meshmod.row_sharding(mesh8),
        n_shards=8)

    dp = sh.centroids.shape[1]
    qp = np.zeros((16, dp), np.float32)
    qp[:, : base.shape[1]] = queries
    # refine_k=192 > 128 also exercises the deep-k (two-slot-row) ADC
    # kernel inside shard_map
    _, ids = sh.search_device(jnp.asarray(qp), 10, nprobe=sh.nlist,
                              refine_k=192, refine_store=store,
                              backend="pallas")
    got64 = np.take_along_axis(s64, np.asarray(ids).astype(np.int64), axis=1)
    ref64 = np.take_along_axis(s64, ref_ids, axis=1)
    np.testing.assert_allclose(got64, ref64, atol=1e-4, rtol=0)
