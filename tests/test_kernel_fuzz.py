"""Property fuzz: the Pallas scan must match the float64 oracle across random
shape/k/dtype combinations (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nvdb_tpu.formats import synth, vecbin
from nvdb_tpu.kernels.flat_scan import pallas_flat_topk

CASES = [
    # (n_padded, n_valid, d, B, k, tile, dtype)
    (512, 500, 128, 8, 3, 128, "f32"),
    (1024, 1024, 256, 16, 17, 256, "f32"),
    (768, 700, 128, 8, 10, 256, "bf16"),
    (2048, 1500, 128, 32, 25, 512, "i8"),
    (256, 256, 384, 8, 1, 256, "f32"),
    (512, 511, 128, 8, 128, 128, "f32"),   # k == MAX_K
]


@pytest.mark.parametrize("merge", ["extract", "key", "rounds"])
@pytest.mark.parametrize("n_pad,n,d,b,k,tile,dtype", CASES)
def test_fuzz_case(n_pad, n, d, b, k, tile, dtype, merge):
    rng_seed = hash((n_pad, n, d, b, k)) % 2**31
    base = synth.normalized_gaussian(n_pad, d, seed=rng_seed)
    base[n:] = 0.0
    queries, _ = synth.sample_queries(base[:n], b, seed=rng_seed + 1, perturb=0.1)

    scales = None
    if dtype == "i8":
        enc, sc = vecbin.quantize_i8(base)
        vecs, scales = jnp.asarray(enc), jnp.asarray(sc)
        eff = vecbin.dequantize_i8(enc, sc)
    elif dtype == "bf16":
        enc = vecbin.to_bf16(base)
        vecs = jnp.asarray(enc)
        eff = np.asarray(enc, dtype=np.float32)
    else:
        vecs = jnp.asarray(base)
        eff = base

    vals, ids = pallas_flat_topk(jnp.asarray(queries), vecs, scales, n, k,
                                 tile_rows=tile, merge=merge)
    vals, ids = np.asarray(vals), np.asarray(ids)

    kk = min(k, n)
    assert (ids[:, :kk] >= 0).all() and (ids[:, :kk] < n).all()
    # achieved float64 scores of chosen ids == oracle top-k scores on the
    # effective (dequantized) base, within dtype-appropriate tolerance
    s64 = queries.astype(np.float64) @ eff[:n].T.astype(np.float64)
    ref = -np.sort(-s64, axis=1)[:, :kk]
    got = np.take_along_axis(s64, ids[:, :kk].astype(np.int64), axis=1)
    tol = {"f32": 1e-5, "bf16": 5e-2, "i8": 5e-2}[dtype]
    if merge == "key":
        # ranks at bf16 precision by design (vals truncated; ids may
        # differ only within bf16 rounding of the scores)
        tol = max(tol, 5e-2)
    np.testing.assert_allclose(got, ref, atol=tol, rtol=0)
    # sorted descending, unique
    assert np.all(np.diff(vals[:, :kk], axis=1) <= 1e-6)
    for row in ids[:, :kk]:
        assert len(set(row.tolist())) == kk


@pytest.mark.parametrize("merge", ["extract", "key"])
def test_duplicate_row_cross_class_tie(merge):
    """Exact score ties from duplicated rows (common in real corpora) must
    yield BOTH ids. Originally a regression test for the pruned stride/chunk
    merges' narrow_rounds tie bug (ADVICE.md round 2); kept because exact
    ties remain the sharpest edge of every extraction merge."""
    tile, d, k = 1024, 128, 4
    n = 2 * tile
    C = 512  # _stride_classes(1024) -> 512, so nstr = 2
    rng = np.random.default_rng(7)
    base = rng.standard_normal((n, d)).astype(np.float32) * 0.05
    base /= np.linalg.norm(base, axis=1, keepdims=True) * 20  # low scores
    q = rng.standard_normal((d,)).astype(np.float32)
    q /= np.linalg.norm(q)
    # duplicates in tile 1 (past buffer warmup), engineered so the max-rmid
    # id belongs to class 37 (stride/chunk index 1 -> rmid = 512+37+1024)
    # while the max-ccol class is 200 (index 0 -> rmid = 200+1024)
    ia = tile + C + 37   # class 37, rmid 1573
    ib = tile + 200      # class 200, rmid 1224
    base[ia] = q
    base[ib] = q
    queries = np.tile(q, (8, 1))
    vals, ids = pallas_flat_topk(jnp.asarray(queries), jnp.asarray(base),
                                 None, n, k, tile_rows=tile, merge=merge)
    ids = np.asarray(ids)
    for row in ids:
        assert ia in row.tolist() and ib in row.tolist(), row
        assert len(set(row.tolist())) == k


def test_diagnostic_merge_rejected_from_env(monkeypatch):
    """Wrong-by-design diagnostic modes must not be reachable via a
    lingering NVDB_MERGE env var (ADVICE.md round 2)."""
    base = synth.normalized_gaussian(256, 128, seed=0)
    q = jnp.asarray(base[:8])
    for diag in ("mmonly", "nomerge", "fixed2"):
        monkeypatch.setenv("NVDB_MERGE", diag)
        with pytest.raises(ValueError, match="diagnostic"):
            pallas_flat_topk(q, jnp.asarray(base), None, 256, 4,
                             tile_rows=128)
    # explicit argument still works (perf A/B path)
    pallas_flat_topk(q, jnp.asarray(base), None, 256, 4, tile_rows=128,
                     merge="mmonly")
