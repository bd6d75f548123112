"""Exact flat-scan vs numpy oracle — the tiny-N oracle tests (SURVEY.md §4)."""

import numpy as np
import pytest

from nvdb_tpu.formats import synth, vecbin
from nvdb_tpu.index.flat import FlatIndex, build_ground_truth
from nvdb_tpu.store import VectorStore


def numpy_topk_dot(base_f32, queries, k):
    scores = queries.astype(np.float64) @ base_f32.T.astype(np.float64)
    ids = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(scores, ids, axis=1), ids


def assert_topk_equivalent(base_f32, queries, vals, ids, k, tol=1e-5):
    """Rank-equivalence modulo f32 rounding: the float64 scores of the returned
    ids must match the float64 oracle top-k scores elementwise within tol, and
    returned scores must be close to true scores."""
    ref_vals, _ = numpy_topk_dot(base_f32, queries, k)
    scores64 = queries.astype(np.float64) @ base_f32.T.astype(np.float64)
    got64 = np.take_along_axis(scores64, ids.astype(np.int64), axis=1)
    np.testing.assert_allclose(got64, ref_vals, atol=tol, rtol=0)
    np.testing.assert_allclose(vals, got64, atol=tol, rtol=1e-5)


@pytest.fixture(scope="module")
def data():
    base = synth.clustered(3000, 96, n_clusters=16, seed=0)
    queries, _ = synth.sample_queries(base, 24, seed=1, perturb=0.05)
    return base, queries


def test_flat_f32_matches_numpy(data):
    base, queries = data
    store = VectorStore.from_numpy(base, "f32", row_block=256)
    vals, ids = FlatIndex(store, backend="jnp").search(queries, 10)
    assert_topk_equivalent(base, queries, vals, ids, 10)
    # no duplicate ids within a row
    for row in ids:
        assert len(set(row.tolist())) == len(row)


def test_flat_padding_never_returned(data):
    base, queries = data
    # n=3000 pads to 3072 with row_block=256: padded rows must never appear
    store = VectorStore.from_numpy(base, "f32", row_block=256)
    assert store.n_padded == 3072
    _, ids = FlatIndex(store, backend="jnp").search(queries, 50)
    assert ids.max() < 3000 and ids.min() >= 0


def test_flat_bf16_recall(data):
    base, queries = data
    store = VectorStore.from_numpy(base, "bf16", row_block=256)
    _, ids = FlatIndex(store, backend="jnp").search(queries, 10)
    _, ref_ids = numpy_topk_dot(base, queries, 10)
    hits = sum(len(set(a) & set(b)) for a, b in zip(ids.tolist(), ref_ids.tolist()))
    assert hits / ids.size >= 0.9  # bf16 rounding may swap near-ties only


def test_flat_i8_matches_i8_oracle(data):
    base, queries = data
    q8, scales = vecbin.quantize_i8(base)
    store = VectorStore.from_numpy(q8, "i8", scales=scales, row_block=256)
    _, ids = FlatIndex(store, backend="jnp").search(queries, 10)
    # oracle: dequantized int8 base, f32 math
    deq = vecbin.dequantize_i8(q8, scales)
    _, ref_ids = numpy_topk_dot(deq, queries, 10)
    hits = sum(len(set(a) & set(b)) for a, b in zip(ids.tolist(), ref_ids.tolist()))
    assert hits / ids.size >= 0.9
    # and int8 quantization preserves recall vs the f32 oracle reasonably
    _, f32_ids = numpy_topk_dot(base, queries, 10)
    hits = sum(len(set(a) & set(b)) for a, b in zip(ids.tolist(), f32_ids.tolist()))
    assert hits / ids.size >= 0.8


def test_self_query_rank1(data):
    """A base row queried verbatim must return itself first (normalized rows,
    dot metric)."""
    base, _ = data
    store = VectorStore.from_numpy(base, "f32", row_block=256)
    probe_idx = [0, 17, 1234, 2999]
    _, ids = FlatIndex(store, backend="jnp").search(base[probe_idx], 3)
    np.testing.assert_array_equal(ids[:, 0], probe_idx)


def test_odd_batch_and_k(data):
    base, queries = data
    store = VectorStore.from_numpy(base, "f32", row_block=256)
    idx = FlatIndex(store, backend="jnp")
    vals, ids = idx.search(queries[:5], 7)  # batch 5 pads to 8 internally
    assert vals.shape == (5, 7) and ids.shape == (5, 7)
    assert_topk_equivalent(base, queries[:5], vals, ids, 7)
    # single 1-D query also works
    v1, i1 = idx.search(queries[0], 7)
    assert_topk_equivalent(base, queries[:1], v1, i1, 7)


def test_build_ground_truth(data):
    base, queries = data
    store = VectorStore.from_numpy(base, "f32", row_block=256)
    gt = build_ground_truth(store, queries, 10, batch=16, backend="jnp")
    scores64 = queries.astype(np.float64) @ base.T.astype(np.float64)
    got64 = np.take_along_axis(scores64, gt.astype(np.int64), axis=1)
    ref_vals, _ = numpy_topk_dot(base, queries, 10)
    np.testing.assert_allclose(got64, ref_vals, atol=1e-5, rtol=0)


def test_scores_descending(data):
    base, queries = data
    store = VectorStore.from_numpy(base, "f32", row_block=256)
    vals, _ = FlatIndex(store, backend="jnp").search(queries, 10)
    assert np.all(np.diff(vals, axis=1) <= 1e-6)


def test_i8_quantized_queries(data):
    """Opt-in int8 x int8 MXU path: recall stays high, scores match a float
    emulation of the same quantized arithmetic."""
    base, queries = data
    q8, scales = vecbin.quantize_i8(base)
    store = VectorStore.from_numpy(q8, "i8", scales=scales, row_block=256)
    idx = FlatIndex(store, backend="jnp", quantize_queries=True)
    vals, ids = idx.search(queries, 10)
    # oracle: quantize queries the same way, compute in float
    qq, qs = vecbin.quantize_i8(queries)
    deq_b = vecbin.dequantize_i8(q8, scales)
    deq_q = vecbin.dequantize_i8(qq, qs)
    s = deq_q @ deq_b.T
    ref_ids = np.argsort(-s, axis=1, kind="stable")[:, :10]
    hits = sum(len(set(a) & set(b)) for a, b in
               zip(ids.tolist(), ref_ids.tolist()))
    assert hits / ref_ids.size >= 0.95
    # and still close to the full-precision truth
    _, f32_ids = numpy_topk_dot(base, queries, 10)
    hits = sum(len(set(a) & set(b)) for a, b in
               zip(ids.tolist(), f32_ids.tolist()))
    assert hits / f32_ids.size >= 0.8
