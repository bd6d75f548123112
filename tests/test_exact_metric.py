"""EXACT_METRIC=L2|DOT knob (nvdb_ivf_eval.cpp:353,436 analogue): L2 ranking
by 2 q.r - ||r||^2 must be exact on UN-normalized corpora where dot ranking
is wrong, and coincide with dot on normalized ones (gtbin_format.h:11-15)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nvdb_tpu.formats import synth, vecbin
from nvdb_tpu.kernels import ops
from nvdb_tpu.store import VectorStore


@pytest.fixture(scope="module")
def unnorm():
    """Un-normalized corpus with per-row norms spread over ~10x so dot and
    L2 rankings genuinely disagree."""
    rng = np.random.default_rng(7)
    base = synth.clustered(3000, 64, n_clusters=8, seed=11)
    base *= rng.uniform(0.3, 3.0, size=(3000, 1)).astype(np.float32)
    queries, _ = synth.sample_queries(base, 12, seed=12, perturb=0.05)
    return base.astype(np.float32), queries


def _l2_oracle(base, queries, k):
    d2 = (np.sum(queries.astype(np.float64) ** 2, axis=1)[:, None]
          - 2.0 * queries.astype(np.float64) @ base.T.astype(np.float64)
          + np.sum(base.astype(np.float64) ** 2, axis=1)[None, :])
    return np.argsort(d2, axis=1, kind="stable")[:, :k]


def test_scan_topk_l2_unnormalized(unnorm):
    base, queries = unnorm
    store = VectorStore.from_numpy(base, "f32", row_block=128)
    qp = jnp.asarray(store.pad_queries(queries))
    ref = _l2_oracle(base, queries, 10)
    _, ids = ops.scan_topk(qp, store.vectors, None, store.n, 10, metric="l2")
    np.testing.assert_array_equal(np.asarray(ids), ref)
    # and dot ranking genuinely differs on this corpus (the knob matters)
    _, ids_dot = ops.scan_topk(qp, store.vectors, None, store.n, 10)
    assert not np.array_equal(np.asarray(ids_dot), ref)


def test_scan_topk_l2_i8_scale_folding(unnorm):
    """i8 store: the L2 norm term must fold the per-row scale as
    s^2 * ||codes||^2 — checked against the dequantized f64 oracle."""
    base, queries = unnorm
    q8, scales = vecbin.quantize_i8(base)
    store = VectorStore.from_numpy(q8, "i8", scales=scales, row_block=128)
    qp = jnp.asarray(store.pad_queries(queries))
    deq = q8.astype(np.float64) * scales[:, None]
    ref = _l2_oracle(deq, queries, 10)
    _, ids = ops.scan_topk(qp, store.vectors, store.scales, store.n, 10,
                           metric="l2")
    hits = sum(len(set(a) & set(b)) for a, b in
               zip(np.asarray(ids).tolist(), ref.tolist()))
    assert hits / ref.size >= 0.95  # bf16-free path; i8 rounding only


def test_scan_topk_metric_validation(unnorm):
    base, queries = unnorm
    store = VectorStore.from_numpy(base, "f32", row_block=128)
    qp = jnp.asarray(store.pad_queries(queries))
    with pytest.raises(ValueError, match="unknown metric"):
        ops.scan_topk(qp, store.vectors, None, store.n, 5, metric="cosine")
    with pytest.raises(ValueError, match="f32 queries"):
        ops.scan_topk(qp, store.vectors, None, store.n, 5, metric="l2",
                      query_scales=jnp.ones((qp.shape[0],), jnp.float32))


def test_flat_index_l2_and_gt_build(unnorm):
    """FlatIndex(metric='l2') host path and build_ground_truth(metric='l2')
    both return the true L2 neighbors on an un-normalized corpus."""
    from nvdb_tpu.index.flat import FlatIndex, build_ground_truth

    base, queries = unnorm
    store = VectorStore.from_numpy(base, "f32", row_block=128)
    ref = _l2_oracle(base, queries, 10)
    _, ids = FlatIndex(store, backend="jnp", metric="l2").search(queries, 10)
    np.testing.assert_array_equal(ids, ref)
    gt = build_ground_truth(store, queries, 10, backend="jnp", metric="l2")
    np.testing.assert_array_equal(gt.astype(np.int64), ref)

    with pytest.raises(ValueError, match="unknown metric"):
        FlatIndex(store, metric="cosine")


def test_gt_chunked_l2(unnorm, tmp_path):
    """Chunked GT builder with metric='l2' == resident L2 GT (two chunks)."""
    from nvdb_tpu.index.flat import build_ground_truth_chunked

    base, queries = unnorm
    p = str(tmp_path / "u.vecbin")
    vecbin.write_vecbin(p, base)
    ref = _l2_oracle(base, queries, 10)
    ids = build_ground_truth_chunked(p, queries, 10, row_chunk=1500,
                                     metric="l2")
    np.testing.assert_array_equal(ids.astype(np.int64), ref)


def test_ivfpq_refine_metric_dot_vs_l2(unnorm):
    """refine_metric plumbs through IVFPQIndex.search_device: on an
    un-normalized corpus l2-refined ids match the L2 oracle ranking of the
    candidate pool, dot-refined ids the dot oracle — they must differ."""
    from nvdb_tpu.index.ivf_pq import IVFPQIndex

    base, queries = unnorm
    pqi = IVFPQIndex.build(base, nlist=16, m=16, use_opq=False,
                           train_size=3000, seed=3)

    dp = pqi.centroids.shape[1]

    class _Store:
        vectors = jnp.asarray(np.pad(base, ((0, 0), (0, dp - base.shape[1]))))
        scales = None

    qp = np.zeros((16, dp), np.float32)
    qp[:12, : base.shape[1]] = queries
    _, il2 = pqi.search_device(jnp.asarray(qp), 10, nprobe=16, refine_k=128,
                               refine_store=_Store, backend="jnp",
                               refine_metric="l2")
    _, idot = pqi.search_device(jnp.asarray(qp), 10, nprobe=16, refine_k=128,
                                refine_store=_Store, backend="jnp",
                                refine_metric="dot")
    il2, idot = np.asarray(il2)[:12], np.asarray(idot)[:12]
    ref = _l2_oracle(base, queries, 10)
    # full probing + deep refine: l2 metric recovers the exact L2 top-k
    np.testing.assert_array_equal(il2, ref)
    assert not np.array_equal(idot, ref)


def test_pinlut_dma_guard():
    """ADVICE r3: diag='pinlut' with the default ids_mode='dma' must raise,
    not silently score every grid step against step (0,0)'s LUT."""
    from nvdb_tpu.kernels import adc_scan

    lut = jnp.zeros((2, 4, 8, 16, 16), jnp.bfloat16)
    probes = jnp.zeros((2, 4), jnp.int32)
    codes = jnp.zeros((8, 8, 128), jnp.uint8)
    sids = jnp.zeros((8, 128), jnp.int32)
    with pytest.raises(ValueError, match="diag timing probes"):
        adc_scan.pallas_adc_topk(lut, probes, codes, sids, 10,
                                 diag="pinlut", ids_mode="dma")
