"""IVF-Flat: recall gates vs exact GT on seeded clustered data (SURVEY.md §4d)."""

import numpy as np
import pytest

from nvdb_tpu.formats import synth
from nvdb_tpu.index.ivf_flat import IVFFlatIndex


@pytest.fixture(scope="module")
def data():
    base = synth.clustered(20000, 64, n_clusters=64, spread=0.35, seed=51)
    queries, _ = synth.sample_queries(base, 32, seed=52, perturb=0.05)
    s = queries.astype(np.float64) @ base.T.astype(np.float64)
    gt = np.argsort(-s, axis=1)[:, :10]
    return base, queries, gt


def _recall(ids, gt):
    return sum(len(set(a) & set(b)) for a, b in
               zip(ids.tolist(), gt.tolist())) / gt.size


@pytest.fixture(scope="module")
def index(data):
    base, _, _ = data
    return IVFFlatIndex.build(base, nlist=64, dtype="f32", n_iters=8, seed=1)


def test_ivf_build_invariants(index, data):
    base, _, _ = data
    # every row present exactly once across lists
    sids = np.asarray(index.slot_ids)
    real = sids[sids >= 0]
    assert len(real) == 20000 and len(np.unique(real)) == 20000
    # packed payload matches original rows
    nz = np.argwhere(sids >= 0)
    packed = np.asarray(index.packed)
    for li, si in nz[:50]:
        np.testing.assert_allclose(packed[li, si, :64], base[sids[li, si]],
                                   atol=1e-6)
    # spills should be rare with pad_factor 1.5 on clustered data
    assert index.n_spilled < 2000


def test_ivf_recall_increases_with_nprobe(index, data):
    base, queries, gt = data
    recalls = []
    for nprobe in (1, 4, 16, 64):
        _, ids = index.search(queries, 10, nprobe)
        recalls.append(_recall(ids, gt))
    assert recalls == sorted(recalls)
    assert recalls[-1] >= 0.999   # full probe == exact (modulo f32 ties)
    assert recalls[2] >= 0.65     # nprobe=16/64 on heavily-overlapping clusters


def test_ivf_full_probe_equals_flat(index, data):
    """nprobe == nlist must reproduce the exact flat scan."""
    base, queries, gt = data
    _, ids = index.search(queries, 10, nprobe=64)
    assert _recall(ids, gt) >= 0.999


def test_ivf_i8(data):
    base, queries, gt = data
    idx = IVFFlatIndex.build(base, nlist=64, dtype="i8", n_iters=8, seed=1)
    _, ids = idx.search(queries, 10, nprobe=64)
    assert _recall(ids, gt) >= 0.9


def test_ivf_bf16(data):
    base, queries, gt = data
    idx = IVFFlatIndex.build(base, nlist=64, dtype="bf16", n_iters=8, seed=1)
    _, ids = idx.search(queries, 10, nprobe=64)
    assert _recall(ids, gt) >= 0.9


def test_ivf_save_load_roundtrip(index, data, tmp_path):
    base, queries, _ = data
    p = str(tmp_path / "ivf.npz")
    index.save(p)
    loaded = IVFFlatIndex.load(p)
    v1, i1 = index.search(queries[:8], 10, 16)
    v2, i2 = loaded.search(queries[:8], 10, 16)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(v1, v2, rtol=1e-6)


def test_ivf_no_padding_ids(index, data):
    _, queries, _ = data
    _, ids = index.search(queries, 10, 4)
    assert ids.min() >= 0 and ids.max() < 20000


def test_ivf_pallas_probe_matches_jnp(index, data):
    """Differential: the scalar-prefetch Pallas probe kernel (interpret mode on
    CPU) must agree with the jnp slab-gather path."""
    _, queries, _ = data
    vj, ij = index.search(queries[:8], 10, nprobe=8, backend="jnp")
    vp, ip = index.search(queries[:8], 10, nprobe=8, backend="pallas")
    np.testing.assert_allclose(vp, vj, atol=1e-5, rtol=1e-5)
    # id agreement modulo exact-score ties
    agree = (ip == ij).mean()
    assert agree > 0.95


def test_ivf_pallas_probe_i8(data):
    base, queries, gt = data
    idx = IVFFlatIndex.build(base, nlist=64, dtype="i8", n_iters=8, seed=1)
    _, ids = idx.search(queries[:8], 10, nprobe=64, backend="pallas")
    hits = sum(len(set(a.tolist()) & set(b.tolist()))
               for a, b in zip(ids, gt[:8]))
    assert hits / (8 * 10) >= 0.9


def test_ivfflat_repack():
    """Skewed corpus under tight packing spills; repack at higher capacity
    keeps every row exactly once, shares the trained centroids, and full
    probing stays exact."""
    rng = np.random.default_rng(9)
    hot = rng.standard_normal((1, 64)) * 3 + rng.standard_normal((7000, 64)) * 0.1
    rest = rng.standard_normal((3000, 64))
    base = np.vstack([hot, rest]).astype(np.float32)
    tight = IVFFlatIndex.build(base, nlist=16, dtype="bf16", n_iters=6,
                               pad_factor=1.0, spill_candidates=2, seed=4)
    assert tight.n_spilled > 0
    re = IVFFlatIndex.repack(tight, base, pad_factor=4.0, spill_candidates=8)
    assert re.n_spilled < tight.n_spilled
    np.testing.assert_array_equal(np.asarray(re.centroids),
                                  np.asarray(tight.centroids))
    sids = np.asarray(re.slot_ids)
    real = sids[sids >= 0]
    assert len(real) == base.shape[0] == len(np.unique(real))
    # full probing == exact top-k (bf16 economy aside: compare to tight full)
    q = base[:8]
    _, i_full = re.search(q, 5, nprobe=16)
    _, i_tight = tight.search(q, 5, nprobe=16)
    assert np.array_equal(np.sort(i_full, 1), np.sort(i_tight, 1))


def test_ivf_dead_centroid_does_not_burn_probes():
    """A k-means dead centroid sits at its INIT position (a corpus row on
    normalized data) so near the query it outranks every real cell mean
    (norm < 1) in the 2qc - c^2 coarse ranking. The probe ranking must mask
    zero-fill lists or nprobe=1 probes an EMPTY list and returns nothing
    (8M flagship: 1,845 dead lists cost .035 coverage, coverage_probe.py)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    base = rng.standard_normal((512, 32)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    idx = IVFFlatIndex.build(base, nlist=8, dtype="f32", n_iters=6, seed=1)
    q = base[:4]

    # poison: empty list 0 and park its centroid exactly ON each query's
    # position in turn (worst case: ranks first for that query)
    sids = np.asarray(idx.slot_ids).copy()
    moved = sids[0][sids[0] >= 0]
    sids[0] = -1
    cents = np.asarray(idx.centroids)
    q_pad = np.zeros(cents.shape[1], np.float32)
    q_pad[:q.shape[1]] = q[0]
    idx2 = IVFFlatIndex(
        centroids=jnp.asarray(np.vstack([q_pad, cents[1:]])),
        packed=idx.packed, slot_ids=jnp.asarray(sids),
        slot_scales=idx.slot_scales, n=idx.n, d=idx.d,
        dtype_code=idx.dtype_code)

    _, ids1 = idx2.search(q[:1], 5, nprobe=1)
    assert (np.asarray(ids1) >= 0).all()          # not the empty list
    assert not set(np.asarray(ids1)[0]) & set(moved.tolist())
    # full live probing still exact over the remaining rows
    _, ids_all = idx2.search(q[:1], 5, nprobe=8)
    keep = np.setdiff1d(np.arange(512), moved)
    s = q[:1].astype(np.float64) @ base[keep].T.astype(np.float64)
    expect = keep[np.argsort(-s[0])[:5]]
    assert set(np.asarray(ids_all)[0]) == set(expect.tolist())
