"""Pallas exact-rerank kernel (interpret mode) vs the jnp gather oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from nvdb_tpu.kernels import ops
from nvdb_tpu.kernels.rerank import pallas_rerank


def _gathered(base, cand):
    rows = np.where(cand[..., None] >= 0, base[np.maximum(cand, 0)], 0)
    return jnp.asarray(rows)


@pytest.mark.parametrize("dtype", ["f32", "bf16", "i8"])
def test_rerank_matches_oracle(dtype):
    rng = np.random.default_rng(7)
    N, D, B, R, k = 4096, 256, 8, 100, 10
    base = rng.standard_normal((N, D), dtype=np.float32)
    q = rng.standard_normal((B, D), dtype=np.float32)
    cand = np.stack([rng.choice(N, R, replace=False) for _ in range(B)]
                    ).astype(np.int32)
    cand[0, 50:] = -1  # padded candidates must rank last / never win

    scales = None
    if dtype == "i8":
        amax = np.abs(base).max(axis=1)
        sc = (amax / 127).astype(np.float32)
        store = np.clip(np.round(base / sc[:, None]), -127, 127).astype(np.int8)
        eff = store.astype(np.float32) * sc[:, None]
        scales = jnp.asarray(sc)
    elif dtype == "bf16":
        store = jnp.asarray(base).astype(jnp.bfloat16)
        eff = np.asarray(store, dtype=np.float32)
    else:
        store = base
        eff = base

    pv, pi = pallas_rerank(jnp.asarray(q), jnp.asarray(cand),
                           jnp.asarray(store), scales, k)
    jv, ji = ops.exact_rerank(jnp.asarray(q), _gathered(eff, cand),
                              jnp.asarray(cand), k)
    assert np.mean(np.asarray(pi) == np.asarray(ji)) == 1.0
    np.testing.assert_allclose(np.asarray(pv), np.asarray(jv),
                               rtol=1e-4, atol=1e-4)


def test_rerank_b_not_multiple_of_bq_and_norms2():
    """Query-block padding (B % bq != 0) and the precomputed-norms serving
    path must agree with the oracle."""
    from nvdb_tpu.kernels.rerank import store_norms2

    rng = np.random.default_rng(11)
    N, D, B, R, k = 2048, 128, 12, 33, 7
    base = rng.standard_normal((N, D), dtype=np.float32)
    q = rng.standard_normal((B, D), dtype=np.float32)
    cand = np.stack([rng.choice(N, R, replace=False) for _ in range(B)]
                    ).astype(np.int32)
    n2 = store_norms2(jnp.asarray(base))
    pv, pi = pallas_rerank(jnp.asarray(q), jnp.asarray(cand),
                           jnp.asarray(base), None, k, norms2=n2)
    jv, ji = ops.exact_rerank(jnp.asarray(q), _gathered(base, cand),
                              jnp.asarray(cand), k)
    assert np.mean(np.asarray(pi) == np.asarray(ji)) == 1.0
    np.testing.assert_allclose(np.asarray(pv), np.asarray(jv),
                               rtol=1e-4, atol=1e-4)


def test_rerank_chunk_not_dividing_r():
    rng = np.random.default_rng(9)
    N, D, B, R, k = 1024, 128, 8, 37, 5   # R % chunk != 0
    base = rng.standard_normal((N, D), dtype=np.float32)
    q = rng.standard_normal((B, D), dtype=np.float32)
    cand = np.stack([rng.choice(N, R, replace=False) for _ in range(B)]
                    ).astype(np.int32)
    pv, pi = pallas_rerank(jnp.asarray(q), jnp.asarray(cand),
                           jnp.asarray(base), None, k, chunk=16)
    jv, ji = ops.exact_rerank(jnp.asarray(q), _gathered(base, cand),
                              jnp.asarray(cand), k)
    assert np.mean(np.asarray(pi) == np.asarray(ji)) == 1.0


def test_rerank_dot_metric():
    """metric='dot' ranks by the scaled dot product (the flat-scan metric)."""
    rng = np.random.default_rng(13)
    N, D, B, R, k = 1024, 128, 8, 30, 6
    base = rng.standard_normal((N, D), dtype=np.float32)
    amax = np.abs(base).max(axis=1)
    sc = (amax / 127).astype(np.float32)
    store = np.clip(np.round(base / sc[:, None]), -127, 127).astype(np.int8)
    eff = store.astype(np.float32) * sc[:, None]
    q = rng.standard_normal((B, D), dtype=np.float32)
    cand = np.stack([rng.choice(N, R, replace=False) for _ in range(B)]
                    ).astype(np.int32)
    pv, pi = pallas_rerank(jnp.asarray(q), jnp.asarray(cand),
                           jnp.asarray(store), jnp.asarray(sc), k,
                           metric="dot")
    jv, ji = ops.exact_rerank(jnp.asarray(q), _gathered(eff, cand),
                              jnp.asarray(cand), k, metric="dot")
    assert np.mean(np.asarray(pi) == np.asarray(ji)) == 1.0
    np.testing.assert_allclose(np.asarray(pv), np.asarray(jv),
                               rtol=1e-4, atol=1e-4)


def test_exact_i8_mode_recovers_f32_query_ranking():
    """FlatIndex(quantize_queries, refine_k): the fused i8 x i8 scan +
    f32-query dot rerank must return the same ids as the accuracy-neutral
    f32-query scan over the int8 store (VERDICT r2 next #7)."""
    from nvdb_tpu.index.flat import FlatIndex
    from nvdb_tpu.store import VectorStore
    from nvdb_tpu.formats import synth, vecbin

    base = synth.normalized_gaussian(4096, 128, seed=5)
    q8, sc = vecbin.quantize_i8(base)
    store = VectorStore.from_numpy(q8, "i8", scales=sc, row_block=512)
    queries, _ = synth.sample_queries(base, 16, seed=6, perturb=0.1)

    exact = FlatIndex(store, backend="jnp")  # f32 queries (oracle)
    fast = FlatIndex(store, backend="jnp", quantize_queries=True,
                     refine_k=64)
    raw = FlatIndex(store, backend="jnp", quantize_queries=True)
    _, ie = exact.search(queries, 10)
    _, if_ = fast.search(queries, 10)
    _, ir = raw.search(queries, 10)
    # the refine scores in f32-HIGHEST while the f32-query scan path scores
    # via the bf16 matmul, so exact near-tie order can differ — compare the
    # ACHIEVED float64 scores on the dequantized store instead of raw ids
    eff = q8.astype(np.float64) * sc[:, None]
    s64 = queries.astype(np.float64) @ eff.T
    ref = np.take_along_axis(s64, ie.astype(np.int64), axis=1)
    got = np.take_along_axis(s64, if_.astype(np.int64), axis=1)
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=0)
    m_fast = np.mean(if_ == ie)
    m_raw = np.mean(ir == ie)
    # the rerank moves the ranking onto the f32-query oracle (the raw qi8
    # path is visibly off on this worst-case iid-gaussian corpus)
    assert m_fast >= 0.95 and m_raw < m_fast, (m_fast, m_raw)


def test_exact_refine_seam_backends_agree(monkeypatch):
    """dispatch.exact_refine — the single routed refine seam (flat exact-i8
    mode, bench --refine-k, IVF stage B) — must agree with the oracle on
    both backends and honor NVDB_REFINE_BACKEND."""
    from nvdb_tpu.kernels import dispatch

    rng = np.random.default_rng(3)
    N, D, B, R, k = 2048, 128, 6, 40, 10
    base = rng.standard_normal((N, D), dtype=np.float32)
    q = rng.standard_normal((B, D), dtype=np.float32)
    cand = np.stack([rng.choice(N, R, replace=False) for _ in range(B)]
                    ).astype(np.int32)
    cand[1, 25:] = -1

    ref_v, ref_i = ops.exact_rerank(jnp.asarray(q), _gathered(base, cand),
                                    jnp.asarray(cand), k, metric="dot")
    for backend in ("jnp", "pallas"):
        v, i = dispatch.exact_refine(jnp.asarray(q), jnp.asarray(cand),
                                     jnp.asarray(base), None, k,
                                     metric="dot", backend=backend)
        assert np.mean(np.asarray(i) == np.asarray(ref_i)) == 1.0, backend
        np.testing.assert_allclose(np.asarray(v), np.asarray(ref_v),
                                   rtol=1e-4, atol=1e-4)

    # env override wins over the measured crossover
    monkeypatch.setenv("NVDB_REFINE_BACKEND", "jnp")
    assert dispatch.refine_backend(1, 1) == "jnp"
    monkeypatch.setenv("NVDB_REFINE_BACKEND", "pallas")
    assert dispatch.refine_backend(10**6, 10**3) == "pallas"


def test_rerank_deep_candidate_input_r256():
    """R=256 candidate inputs (the deep-k ADC generator's output width):
    the id-driven-DMA rerank must stay exact at the widened stage-B input."""
    rng = np.random.default_rng(11)
    N, D, B, R, k = 4096, 256, 8, 256, 10
    base = rng.standard_normal((N, D), dtype=np.float32)
    q = rng.standard_normal((B, D), dtype=np.float32)
    cand = np.stack([rng.choice(N, R, replace=False) for _ in range(B)]
                    ).astype(np.int32)
    cand[1, 200:] = -1
    pv, pi = pallas_rerank(jnp.asarray(q), jnp.asarray(cand),
                           jnp.asarray(base), None, k)
    jv, ji = ops.exact_rerank(jnp.asarray(q), _gathered(base, cand),
                              jnp.asarray(cand), k)
    assert np.mean(np.asarray(pi) == np.asarray(ji)) == 1.0
    np.testing.assert_allclose(np.asarray(pv), np.asarray(jv),
                               rtol=1e-4, atol=1e-4)
