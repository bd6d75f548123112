"""Pallas kernel vs jnp oracle on random inputs per dtype (SURVEY.md §4c) —
runs in interpret mode on the CPU backend, compiled on real TPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nvdb_tpu.formats import synth, vecbin
from nvdb_tpu.kernels import ops
from nvdb_tpu.kernels.flat_scan import pallas_flat_topk


def _oracle64(base_f32, queries, k):
    s = queries.astype(np.float64) @ base_f32.T.astype(np.float64)
    ids = np.argsort(-s, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(s, ids, axis=1), ids


@pytest.fixture(scope="module")
def data():
    base = synth.clustered(2048, 128, n_clusters=8, seed=21)
    queries, _ = synth.sample_queries(base, 8, seed=22, perturb=0.03)
    return base, queries


def test_pallas_f32_matches_oracle(data):
    base, queries = data
    n = 2000  # padded region 2000..2047 must be masked
    vals, ids = pallas_flat_topk(
        jnp.asarray(queries), jnp.asarray(base), None, n, 10, tile_rows=256)
    vals, ids = np.asarray(vals), np.asarray(ids)
    assert ids.max() < n
    ref_vals, _ = _oracle64(base[:n], queries, 10)
    # pad-aware oracle: compare achieved float64 scores of chosen ids
    s64 = queries.astype(np.float64) @ base[:n].T.astype(np.float64)
    got64 = np.take_along_axis(s64, ids.astype(np.int64), axis=1)
    np.testing.assert_allclose(got64, ref_vals, atol=1e-5, rtol=0)
    np.testing.assert_allclose(vals, got64, atol=1e-5, rtol=1e-5)
    # sorted descending, unique ids
    assert np.all(np.diff(vals, axis=1) <= 1e-7)
    for row in ids:
        assert len(set(row.tolist())) == len(row)


def test_pallas_matches_jnp_backend(data):
    """Differential A/B: pallas(interpret) vs scan_topk must agree on ids for
    f32 (same f32 math, modulo tie order)."""
    base, queries = data
    q = jnp.asarray(queries)
    v = jnp.asarray(base)
    pv, pi = pallas_flat_topk(q, v, None, 2048, 10, tile_rows=256)
    jv, ji = ops.scan_topk(q, v, None, 2048, 10, row_block=256)
    np.testing.assert_allclose(np.asarray(pv), np.asarray(jv), atol=1e-5, rtol=1e-5)
    assert np.mean(np.asarray(pi) == np.asarray(ji)) > 0.95  # ties may swap


def test_pallas_bf16(data):
    base, queries = data
    vb = jnp.asarray(vecbin.to_bf16(base))
    pv, pi = pallas_flat_topk(jnp.asarray(queries), vb, None, 2048, 10, tile_rows=256)
    _, ref_ids = _oracle64(base, queries, 10)
    hits = sum(len(set(a) & set(b)) for a, b in
               zip(np.asarray(pi).tolist(), ref_ids.tolist()))
    assert hits / ref_ids.size >= 0.9


def test_pallas_i8(data):
    base, queries = data
    q8, scales = vecbin.quantize_i8(base)
    pv, pi = pallas_flat_topk(
        jnp.asarray(queries), jnp.asarray(q8), jnp.asarray(scales), 2048, 10,
        tile_rows=256)
    deq = vecbin.dequantize_i8(q8, scales)
    _, ref_ids = _oracle64(deq, queries, 10)
    hits = sum(len(set(a) & set(b)) for a, b in
               zip(np.asarray(pi).tolist(), ref_ids.tolist()))
    assert hits / ref_ids.size >= 0.9
    # i8 scores must reflect the scale (magnitudes ~1, not ~127)
    assert np.asarray(pv).max() < 2.0


def test_pallas_k_edge_cases(data):
    base, queries = data
    # k=1
    v1, i1 = pallas_flat_topk(jnp.asarray(queries), jnp.asarray(base), None,
                              2048, 1, tile_rows=256)
    _, ref_ids = _oracle64(base, queries, 1)
    s64 = queries.astype(np.float64) @ base.T.astype(np.float64)
    np.testing.assert_allclose(
        np.take_along_axis(s64, np.asarray(i1, dtype=np.int64), axis=1),
        np.take_along_axis(s64, ref_ids, axis=1), atol=1e-5)
    # k spanning multiple tiles' worth of near ties: k=64
    v64, i64 = pallas_flat_topk(jnp.asarray(queries), jnp.asarray(base), None,
                                2048, 64, tile_rows=256)
    assert np.asarray(v64).shape == (8, 64)
    assert np.all(np.diff(np.asarray(v64), axis=1) <= 1e-7)


def test_pallas_n_less_than_k():
    """Fewer valid rows than k: padding ids must be -1 with -inf scores."""
    base = synth.normalized_gaussian(256, 128, seed=1)
    q = jnp.asarray(base[:8])
    vals, ids = pallas_flat_topk(q, jnp.asarray(base), None, 5, 10, tile_rows=256)
    vals, ids = np.asarray(vals), np.asarray(ids)
    assert (ids[:, :5] < 5).all() and (ids[:, :5] >= 0).all()
    assert (ids[:, 5:] == -1).all()
    assert np.all(np.isneginf(vals[:, 5:]))


def test_pallas_i8_quantized_queries(data):
    """int8 x int8 kernel path (interpret) vs the jnp int8-query oracle: the
    int32 accumulation is exact, so scores must match to f32 rounding."""
    base, queries = data
    q8, scales = vecbin.quantize_i8(base)
    qq, qs = vecbin.quantize_i8(queries)
    pv, pi = pallas_flat_topk(
        jnp.asarray(qq), jnp.asarray(q8), jnp.asarray(scales), 2048, 10,
        tile_rows=256, query_scales=jnp.asarray(qs))
    jv, ji = ops.scan_topk(jnp.asarray(qq), jnp.asarray(q8),
                           jnp.asarray(scales), 2048, 10, row_block=256,
                           query_scales=jnp.asarray(qs))
    np.testing.assert_allclose(np.asarray(pv), np.asarray(jv), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(ji))


def test_dispatch_split_batch_matches_oracle(data, monkeypatch):
    """dispatch.flat_topk splits B > _MAX_KERNEL_BATCH into chained kernel
    calls (the large-B monotone-QPS policy); the concatenated halves must
    equal the single-call oracle."""
    from nvdb_tpu.kernels import dispatch

    base, queries = data  # 8 queries
    monkeypatch.setattr(dispatch, "_MAX_KERNEL_BATCH", 4)
    q = jnp.asarray(queries)
    v = jnp.asarray(base)
    sv, si = dispatch.flat_topk(q, v, None, 2048, 10, backend="pallas",
                                interpret=True)
    jv, ji = ops.scan_topk(q, v, None, 2048, 10, row_block=256)
    np.testing.assert_allclose(np.asarray(sv), np.asarray(jv),
                               atol=1e-5, rtol=1e-5)
    assert np.mean(np.asarray(si) == np.asarray(ji)) > 0.95
