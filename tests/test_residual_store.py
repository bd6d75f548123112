"""Residual-i8 refine stores: int8 codes of (row - coarse_centroid) in the
index's rotated space. Same byte budget as plain i8, ~1.8x smaller quant
step — measured 8M refine ceiling .9760 -> .9900 on exact candidates."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nvdb_tpu.formats import synth, vecbin
from nvdb_tpu.index.ivf_pq import IVFPQIndex, _refine_block
from nvdb_tpu.kernels import ops
from nvdb_tpu.store import VectorStore


@pytest.fixture(scope="module")
def built():
    base = synth.clustered(6000, 64, n_clusters=32, seed=17)
    idx = IVFPQIndex.build(base, nlist=16, m=16, use_opq=True,
                           train_size=6000, seed=2)
    queries, _ = synth.sample_queries(base, 12, seed=18, perturb=0.03)
    return base, idx, queries


def _residual_store(base, idx):
    """Host-side residual encode (mirrors quantize_i8 --residual)."""
    dp = idx.centroids.shape[1]
    rows = np.pad(base, ((0, 0), (0, dp - base.shape[1])))
    rot = np.asarray(idx.rotation) if idx.rotation is not None else None
    if rot is not None:
        rows = rows @ rot
    sids = np.asarray(idx.slot_ids)
    li, si = np.nonzero(sids >= 0)
    list_of = np.zeros(base.shape[0], np.int32)
    list_of[sids[li, si]] = li.astype(np.int32)
    cents = np.asarray(idx.centroids)
    res = rows - cents[list_of]
    codes, scales = vecbin.quantize_i8(res)
    store = VectorStore.from_numpy(codes, "i8", scales=scales, row_block=128)
    store.attach_residual(cents, list_of)
    return store, rows, list_of, cents


def _deq(store):
    """Host dequant of a residual store (the contract under test)."""
    v = np.asarray(store.vectors, np.float32)[: store.n]
    s = np.asarray(store.scales)[: store.n]
    c = np.asarray(store.res_cents)
    i = np.asarray(store.res_ids)[: store.n]
    return c[i] + v * s[:, None]


def test_residual_quantization_is_finer(built):
    """The whole point: residual codes reconstruct the rotated rows with
    materially less error than plain-i8 codes of the same width."""
    base, idx, _ = built
    store, rows, _, _ = _residual_store(base, idx)
    err_res = np.abs(_deq(store) - rows).max()
    q8, sc = vecbin.quantize_i8(rows)
    err_plain = np.abs(q8.astype(np.float32) * sc[:, None] - rows).max()
    # 1.35x finer on this loosely-clustered synthetic corpus (1.8x on the
    # 8M hard corpus, where clusters are tighter)
    assert err_res < 0.8 * err_plain, (err_res, err_plain)


def test_refine_block_residual_jnp_matches_oracle(built):
    base, idx, queries = built
    store, rows, _, _ = _residual_store(base, idx)
    dp = rows.shape[1]
    qp = np.zeros((queries.shape[0], dp), np.float32)
    qp[:, : queries.shape[1]] = queries
    rot = np.asarray(idx.rotation)
    qr = jnp.asarray(qp @ rot)

    rng = np.random.default_rng(3)
    B, R, k = queries.shape[0], 48, 10
    cand = np.stack([rng.choice(base.shape[0], R, replace=False)
                     for _ in range(B)]).astype(np.int32)
    cand[0, 30:] = -1
    v, i = _refine_block(qr, jnp.asarray(cand), store.vectors, store.scales,
                         k, backend="jnp", metric="l2",
                         res_cents=store.res_cents, res_ids=store.res_ids)
    deq = _deq(store)
    gathered = np.where(cand[..., None] >= 0, deq[np.maximum(cand, 0)], 0.0)
    jv, ji = ops.exact_rerank(qr, jnp.asarray(gathered), jnp.asarray(cand),
                              k, metric="l2")
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ji))
    np.testing.assert_allclose(np.asarray(v), np.asarray(jv),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("metric", ["l2", "dot"])
def test_pallas_rerank_residual_matches_jnp(built, metric):
    """The affine amul/boff fold (score = s*dot + q.cent [- norm terms])
    must give the pallas kernel identical ranking to the jnp dequant path."""
    base, idx, queries = built
    store, rows, _, _ = _residual_store(base, idx)
    dp = rows.shape[1]
    qp = np.zeros((queries.shape[0], dp), np.float32)
    qp[:, : queries.shape[1]] = queries
    qr = jnp.asarray(qp @ np.asarray(idx.rotation))

    rng = np.random.default_rng(5)
    B, R, k = queries.shape[0], 40, 8
    cand = np.stack([rng.choice(base.shape[0], R, replace=False)
                     for _ in range(B)]).astype(np.int32)
    n2 = store.norms2() if metric == "l2" else None
    pv, pi = _refine_block(qr, jnp.asarray(cand), store.vectors, store.scales,
                           k, backend="pallas", metric=metric, norms2=n2,
                           res_cents=store.res_cents, res_ids=store.res_ids)
    jv, ji = _refine_block(qr, jnp.asarray(cand), store.vectors, store.scales,
                           k, backend="jnp", metric=metric,
                           res_cents=store.res_cents, res_ids=store.res_ids)
    assert np.mean(np.asarray(pi) == np.asarray(ji)) == 1.0
    np.testing.assert_allclose(np.asarray(pv), np.asarray(jv),
                               rtol=1e-3, atol=1e-3)


def test_search_device_residual_end_to_end(built):
    """At a candidate depth where the ADC set is complete (rk=256: an exact
    f32 store scores 1.000 here), the residual store must beat or tie the
    plain-i8 store — the refine-precision claim, isolated."""
    base, idx, _ = built
    store, _, _, _ = _residual_store(base, idx)
    plain_codes, plain_sc = vecbin.quantize_i8(base)
    plain = VectorStore.from_numpy(plain_codes, "i8", scales=plain_sc,
                                   row_block=128)

    queries, _ = synth.sample_queries(base, 32, seed=19, perturb=0.03)
    dp = idx.centroids.shape[1]
    qp = np.zeros((queries.shape[0], dp), np.float32)
    qp[:, : queries.shape[1]] = queries
    qj = jnp.asarray(qp)

    s64 = queries.astype(np.float64) @ base.T.astype(np.float64)
    ref_ids = np.argsort(-s64, axis=1, kind="stable")[:, :10]

    def rec(ids):
        return np.mean([len(set(a.tolist()) & set(b.tolist())) / 10
                        for a, b in zip(np.asarray(ids), ref_ids)])

    # rk=256: the ADC candidate set is complete at this depth (an exact f32
    # store scores 1.000 here), so the measurement isolates refine precision
    _, i_res = idx.search_device(qj, 10, nprobe=16, refine_k=256,
                                 refine_store=store, backend="jnp")
    _, i_pl = idx.search_device(qj, 10, nprobe=16, refine_k=256,
                                refine_store=plain, backend="jnp")
    assert rec(i_res) >= rec(i_pl) - 1e-9
    assert rec(i_res) >= 0.95


def test_residual_beats_plain_on_hard_corpus():
    """The paved-road gate (VERDICT r4 #4): on the HARD (hierarchical-Zipf
    topics, heavy overlap) corpus — the regime every flagship benchmark
    runs — the residual-i8 store must rank at least as well as plain-i8 at
    the SAME byte budget, measured at a candidate depth where coverage is
    complete so refine precision is isolated. Reconstruction must also be
    strictly finer (that is the mechanism, not just the outcome)."""
    base = synth.hard(8000, 96, intrinsic=24, topics=64, seed=11)
    idx = IVFPQIndex.build(base, nlist=16, m=16, use_opq=True,
                           train_size=8000, seed=4)
    store, rows, _, _ = _residual_store(base, idx)
    plain_codes, plain_sc = vecbin.quantize_i8(rows)
    plain = VectorStore.from_numpy(plain_codes, "i8", scales=plain_sc,
                                   row_block=128)

    # mechanism check on the MEAN per-row quant step (max is dominated by
    # the single worst outlier topic, where residual ~ row): residual amax
    # must be materially smaller on the typical row
    step_res = np.asarray(store.scales)[: store.n].mean()
    step_plain = plain_sc.mean()
    assert step_res < 0.8 * step_plain, (step_res, step_plain)

    queries, _ = synth.sample_queries(base, 32, seed=12, perturb=0.03)
    dp = idx.centroids.shape[1]
    qp = np.zeros((queries.shape[0], dp), np.float32)
    qp[:, : queries.shape[1]] = queries
    qj = jnp.asarray(qp)

    s64 = queries.astype(np.float64) @ base.T.astype(np.float64)
    ref_ids = np.argsort(-s64, axis=1, kind="stable")[:, :10]

    def rec(ids):
        return np.mean([len(set(a.tolist()) & set(b.tolist())) / 10
                        for a, b in zip(np.asarray(ids), ref_ids)])

    # NOTE the plain store here holds codes of the ROTATED rows so both
    # stores score against the same q_rot and ONLY the quantization origin
    # differs (is_residual routing sends q_rot to the residual store; dot
    # is rotation-invariant, so plain-rotated == plain-unrotated ranking)
    class _PlainRot:
        vectors = plain.vectors
        scales = plain.scales
        is_residual = True          # route q_rot to this store too
        res_cents = jnp.zeros((1, dp), jnp.float32)
        res_ids = jnp.zeros((plain.vectors.shape[0],), jnp.int32)

        @staticmethod
        def norms2():
            return None

    _, i_res = idx.search_device(qj, 10, nprobe=16, refine_k=256,
                                 refine_store=store, backend="jnp")
    _, i_pl = idx.search_device(qj, 10, nprobe=16, refine_k=256,
                                refine_store=_PlainRot, backend="jnp")
    assert rec(i_res) >= rec(i_pl) - 1e-9, (rec(i_res), rec(i_pl))


def test_partition_residual_refine_matches_f32():
    """PartitionRerankIndex refine_dtype='res_i8': 4x smaller refine store
    must track the f32-rerank recall on a hard corpus (the §7 paved road)."""
    from nvdb_tpu.index.partition import PartitionRerankIndex

    base = synth.hard(6000, 64, intrinsic=16, topics=32, seed=21)
    queries, _ = synth.sample_queries(base, 24, seed=22, perturb=0.03)
    i_f32 = PartitionRerankIndex.build(base, nlist=32, refine_dtype="f32",
                                       seed=1)
    i_res = PartitionRerankIndex.build(base, nlist=32, refine_dtype="res_i8",
                                       seed=1)
    assert i_res.refine_store.is_residual
    # byte check: residual-i8 refine payload is ~4x smaller than f32
    f32_b = i_f32.refine_store.vectors.size * 4
    res_b = (i_res.refine_store.vectors.size
             + i_res.refine_store.scales.size * 4)
    assert res_b < 0.3 * f32_b

    s64 = queries.astype(np.float64) @ base.T.astype(np.float64)
    ref_ids = np.argsort(-s64, axis=1, kind="stable")[:, :10]

    def rec(ids):
        return np.mean([len(set(a.tolist()) & set(b.tolist())) / 10
                        for a, b in zip(np.asarray(ids), ref_ids)])

    _, id_f = i_f32.search(queries, 10, nprobe=8, rerank_k=64)
    _, id_r = i_res.search(queries, 10, nprobe=8, rerank_k=64)
    assert rec(id_r) >= rec(id_f) - 0.01, (rec(id_r), rec(id_f))


def test_sharded_refine_residual(built):
    """Row-sharded residual refine == the single-device residual refine."""
    from nvdb_tpu.dist import mesh as meshmod
    from nvdb_tpu.dist.sharded_ivf import sharded_refine

    base, idx, queries = built
    mesh8 = meshmod.row_mesh(8)
    dp = idx.centroids.shape[1]
    rows = np.pad(base, ((0, 0), (0, dp - base.shape[1])))
    rot = np.asarray(idx.rotation)
    rows = rows @ rot
    sids = np.asarray(idx.slot_ids)
    li, si = np.nonzero(sids >= 0)
    list_of = np.zeros(base.shape[0], np.int32)
    list_of[sids[li, si]] = li.astype(np.int32)
    codes, scales = vecbin.quantize_i8(rows - np.asarray(idx.centroids)[list_of])
    store = VectorStore.from_numpy(
        codes, "i8", scales=scales, row_block=128,
        sharding=meshmod.row_sharding(mesh8), n_shards=8)
    store.attach_residual(np.asarray(idx.centroids), list_of)

    qp = np.zeros((queries.shape[0], dp), np.float32)
    qp[:, : queries.shape[1]] = queries
    qr = jnp.asarray(qp @ rot)

    rng = np.random.default_rng(9)
    B, R, k = queries.shape[0], 32, 8
    cand = np.stack([rng.choice(base.shape[0], R, replace=False)
                     for _ in range(B)]).astype(np.int32)
    sv, si_ = sharded_refine(mesh8, qr, jnp.asarray(cand), store.vectors,
                             store.scales, k, metric="l2", backend="jnp",
                             res_cents=store.res_cents, res_ids=store.res_ids)
    deq = (np.asarray(idx.centroids)[list_of]
           + codes.astype(np.float32) * scales[:, None])
    jv, ji = ops.exact_rerank(qr, jnp.asarray(deq[cand]), jnp.asarray(cand),
                              k, metric="l2")
    np.testing.assert_array_equal(np.asarray(si_), np.asarray(ji))


def test_quantize_tool_residual_roundtrip(built, tmp_path):
    """quantize_i8 --residual writes codes that, re-attached to the same
    index, dequantize back to the rotated rows within the i8 step."""
    from nvdb_tpu.tools import quantize_i8 as qtool

    base, idx, _ = built
    bp = str(tmp_path / "b.vecbin")
    ip = str(tmp_path / "i.npz")
    op = str(tmp_path / "r.vecbin")
    vecbin.write_vecbin(bp, base)
    idx.save(ip)
    qtool.main([bp, op, "--residual", ip, "--cpu"])

    store = VectorStore.from_vecbin(op)
    cents, rot, list_of = qtool.residual_params(ip)
    store.attach_residual(cents, list_of)
    deq = _deq(store)
    dp = cents.shape[1]
    rows = np.pad(base, ((0, 0), (0, dp - base.shape[1]))) @ rot
    step = np.abs(rows - cents[list_of]).max(axis=1, keepdims=True) / 127.0
    assert np.abs(deq - rows).max() <= (step.max() * 0.51 + 1e-6)
