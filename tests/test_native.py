"""Native host runtime vs numpy references (differential tests)."""

import numpy as np
import pytest

from nvdb_tpu import native
from nvdb_tpu.formats import synth, vecbin

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")


def test_bf16_convert_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(10000).astype(np.float32) * 100
    x[:4] = [0.0, -0.0, np.inf, -np.inf]
    got = native.convert_f32_to_bf16(x)
    import ml_dtypes

    ref = x.astype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(got.view(np.uint16), ref.view(np.uint16))


def test_bf16_nan_stays_nan():
    x = np.array([np.nan, 1.0], dtype=np.float32)
    got = native.convert_f32_to_bf16(x)
    assert np.isnan(np.asarray(got, dtype=np.float32)[0])


def test_quantize_matches_python():
    x = synth.normalized_gaussian(500, 96, seed=5)
    qn, sn = native.quantize_i8(x)
    qp, sp = vecbin.quantize_i8(x)
    np.testing.assert_allclose(sn, sp, rtol=1e-6)
    # rounding mode: nearbyint (C, round-half-even default) vs np.rint — same
    np.testing.assert_array_equal(qn, qp)


def test_native_topk_matches_numpy():
    base = synth.clustered(5000, 64, n_clusters=16, seed=7)
    queries, _ = synth.sample_queries(base, 16, seed=8, perturb=0.05)
    sv, si = native.topk_dot_f32(base, queries, 10, threads=4)
    s64 = queries.astype(np.float64) @ base.T.astype(np.float64)
    ref_ids = np.argsort(-s64, axis=1)[:, :10]
    got64 = np.take_along_axis(s64, si.astype(np.int64), axis=1)
    ref64 = np.take_along_axis(s64, ref_ids, axis=1)
    np.testing.assert_allclose(got64, ref64, atol=1e-5)
    # descending
    assert np.all(np.diff(sv, axis=1) <= 1e-6)


def test_native_topk_k_exceeds_n():
    base = synth.normalized_gaussian(5, 16, seed=9)
    sv, si = native.topk_dot_f32(base, base[:2], 8)
    assert (si[:, 5:] == 0xFFFFFFFF).all()
    assert np.isneginf(sv[:, 5:]).all()
    assert (si[:, :5] < 5).all()
