"""PQ / OPQ / IVF-PQ(+refine): reconstruction and recall-ladder gates matching
the reference's observed shape (PQ < OPQ-PQ < +refine, Performance.md:619-625)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nvdb_tpu.formats import synth
from nvdb_tpu.index.ivf_pq import IVFPQIndex
from nvdb_tpu.kernels import pq
from nvdb_tpu.store import VectorStore


@pytest.fixture(scope="module")
def data():
    # low intrinsic dimension = the realistic regime for PQ (real embeddings
    # concentrate on low-dim manifolds; isotropic Gaussian is PQ's worst case).
    # spread=1.5: moderate cluster overlap — ultra-tight clusters are PQ-
    # adversarial (within-cluster deltas fall below quantization error).
    base = synth.low_rank(12000, 128, intrinsic=24, n_clusters=48, spread=1.5,
                          seed=61)
    queries, _ = synth.sample_queries(base, 24, seed=62, perturb=0.05)
    s = queries.astype(np.float64) @ base.T.astype(np.float64)
    gt = np.argsort(-s, axis=1)[:, :10]
    return base, queries, gt


def _recall(ids, gt):
    return sum(len(set(a) & set(b)) for a, b in
               zip(ids.tolist(), gt.tolist())) / gt.size


def test_pq_roundtrip_reduces_error(data):
    base, _, _ = data
    x = jnp.asarray(base[:2048])
    cb = pq.train_codebooks(jax.random.PRNGKey(0), x, m=16, n_iters=6)
    codes = pq.encode(x, cb, 16)
    assert codes.shape == (2048, 16) and codes.dtype == jnp.uint8
    rec = pq.decode(codes, cb, 16)
    err = float(jnp.mean(jnp.sum((x - rec) ** 2, axis=1)))
    base_err = float(jnp.mean(jnp.sum(x ** 2, axis=1)))  # vs zero reconstruction
    assert err < 0.35 * base_err


def test_adc_matches_explicit_l2(data):
    """ADC score via LUT must equal -||res - decode(code)||^2 exactly."""
    base, queries, _ = data
    x = jnp.asarray(base[:512])
    cb = pq.train_codebooks(jax.random.PRNGKey(1), x, m=8, n_iters=4)
    codes = pq.encode(x, cb, 8)
    q = jnp.asarray(queries[:4])
    lut = pq.adc_lut(q, cb, 8)                       # [4, 8, 256]
    scores = pq.adc_scores(lut[:, None], codes[None].repeat(4, 0)[:, None])
    rec = pq.decode(codes, cb, 8)
    explicit = -jnp.sum((q[:, None, :] - rec[None, :, :]) ** 2, axis=-1)
    np.testing.assert_allclose(np.asarray(scores[:, 0]), np.asarray(explicit),
                               rtol=1e-4, atol=1e-4)


def test_opq_rotation_orthogonal(data):
    base, _, _ = data
    r, cb = pq.train_opq(jax.random.PRNGKey(2), base[:2048], m=16,
                         n_opq_iters=2, n_kmeans_iters=4)
    np.testing.assert_allclose(r @ r.T, np.eye(128), atol=1e-4)


@pytest.fixture(scope="module")
def pq_index(data):
    base, _, _ = data
    return IVFPQIndex.build(base, nlist=32, m=16, use_opq=False, n_iters=6,
                            opq_iters=2, seed=2)


def test_ivfpq_recall_ladder(data, pq_index):
    """ADC-only < ADC+refine; refine recovers near-exact recall
    (the reference's refine threshold effect, Performance.md:656-657)."""
    base, queries, gt = data
    store = VectorStore.from_numpy(base, "f32", row_block=256)
    _, ids_adc = pq_index.search(queries, 10, nprobe=32)
    r_adc = _recall(ids_adc, gt)
    _, ids_ref = pq_index.search(queries, 10, nprobe=32, refine_k=50,
                                 refine_store=store)
    r_ref = _recall(ids_ref, gt)
    assert r_adc >= 0.5          # raw ADC is lossy but far above chance
    assert r_ref > r_adc         # refine must improve
    assert r_ref >= 0.95         # near-exact after rerank (reference: .974@R=50)


def test_ivfpq_opq_beats_plain_pq(data):
    base, queries, gt = data
    plain = IVFPQIndex.build(base, nlist=32, m=16, use_opq=False, n_iters=6, seed=3)
    opq = IVFPQIndex.build(base, nlist=32, m=16, use_opq=True, n_iters=6,
                           opq_iters=3, seed=3)
    _, ids_p = plain.search(queries, 10, nprobe=32)
    _, ids_o = opq.search(queries, 10, nprobe=32)
    # OPQ should not hurt, usually helps (tolerate small noise either way)
    assert _recall(ids_o, gt) >= _recall(ids_p, gt) - 0.03


def test_ivfpq_save_load(pq_index, data, tmp_path):
    _, queries, _ = data
    p = str(tmp_path / "ivfpq.npz")
    pq_index.save(p)
    loaded = IVFPQIndex.load(p)
    v1, i1 = pq_index.search(queries[:8], 10, 8)
    v2, i2 = loaded.search(queries[:8], 10, 8)
    np.testing.assert_array_equal(i1, i2)


def test_ivfpq_index_is_compressed(pq_index):
    # codes ~ N * (M + 4(ids)) bytes; must be far below raw f32 size
    raw_bytes = 12000 * 128 * 4
    assert pq_index.index_bytes < raw_bytes


def test_ivfpq_repack():
    """repack reuses trained rotation/centroids/codebooks, re-balances lists:
    a skewed corpus under tight packing forces spill; repack at higher
    pad_factor/spill depth keeps every row exactly once and recall does not
    regress."""
    from nvdb_tpu.store.store import VectorStore
    rng = np.random.default_rng(7)
    # 70% of rows in one tight cluster -> its list overflows any ~N/nlist cap
    hot = rng.standard_normal((1, 64)) * 3 + rng.standard_normal((7000, 64)) * 0.1
    rest = rng.standard_normal((3000, 64))
    base = np.vstack([hot, rest]).astype(np.float32)
    queries = base[rng.choice(10000, 16, replace=False)] + \
        rng.standard_normal((16, 64)).astype(np.float32) * 0.01
    s = queries.astype(np.float64) @ base.T.astype(np.float64)
    gt = np.argsort(-s, axis=1)[:, :10]

    tight = IVFPQIndex.build(base, nlist=16, m=8, use_opq=False, n_iters=6,
                             pad_factor=1.0, spill_candidates=2, seed=2)
    assert tight.n_spilled > 0  # the premise: tight packing spills
    re = IVFPQIndex.repack(tight, base, pad_factor=4.0, spill_candidates=8)
    assert re.n_spilled < tight.n_spilled
    # trained params are shared, only layout changed
    np.testing.assert_array_equal(np.asarray(re.centroids),
                                  np.asarray(tight.centroids))
    np.testing.assert_array_equal(np.asarray(re.codebooks),
                                  np.asarray(tight.codebooks))
    sids = np.asarray(re.slot_ids)
    real = sids[sids >= 0]
    assert len(real) == base.shape[0] == len(np.unique(real))
    store = VectorStore.from_numpy(base, "f32", row_block=256)
    _, ids_t = tight.search(queries, 10, nprobe=4, refine_k=50,
                            refine_store=store)
    _, ids_r = re.search(queries, 10, nprobe=4, refine_k=50,
                         refine_store=store)
    assert _recall(ids_r, gt) >= _recall(ids_t, gt)


def test_ivfpq_replicated_assignment():
    """replicas=2: every row encoded in its top-2 lists — coverage per probe
    roughly doubles, duplicate ids never surface in results (Pallas merge by
    construction, jnp path via ops.dedup_topk)."""
    from nvdb_tpu.store.store import VectorStore
    rng = np.random.default_rng(11)
    base = (rng.standard_normal((40, 64))[rng.integers(0, 40, 8000)] * 1.0 +
            rng.standard_normal((8000, 64)) * 0.6).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)  # dot GT == L2 rank
    queries = base[rng.choice(8000, 24, replace=False)] + \
        rng.standard_normal((24, 64)).astype(np.float32) * 0.05
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    s = queries.astype(np.float64) @ base.T.astype(np.float64)
    gt = np.argsort(-s, axis=1)[:, :10]

    one = IVFPQIndex.build(base, nlist=32, m=8, use_opq=False, n_iters=8,
                           pad_factor=2.0, seed=5)
    two = IVFPQIndex.repack(one, base, pad_factor=2.0, spill_candidates=8,
                            replicas=2)
    assert two.replicas == 2
    sids = np.asarray(two.slot_ids)
    real = sids[sids >= 0]
    counts = np.bincount(real, minlength=8000)
    assert counts.min() >= 1 and counts.max() <= 2 and counts.mean() > 1.5

    # the mechanism: candidate COVERAGE at nprobe=1 strictly improves
    # (recall itself is ADC-bound on a toy-coarse m=8 codebook, so assert
    # the structural property, not the noisy end metric)
    def lists_of(idx):
        sids = np.asarray(idx.slot_ids)
        out = [[] for _ in range(base.shape[0])]
        li, si = np.nonzero(sids >= 0)
        for l, rid in zip(li, sids[li, si]):
            out[rid].append(l)
        return out
    L1, L2 = lists_of(one), lists_of(two)
    qp = np.zeros((queries.shape[0], one.centroids.shape[1]), np.float32)
    qp[:, :64] = queries
    cents = np.asarray(one.centroids)
    probe = np.argmax(2 * qp @ cents.T - (cents ** 2).sum(1)[None], axis=1)
    cov1 = np.mean([[probe[i] in L1[g] for g in row]
                    for i, row in enumerate(gt)])
    cov2 = np.mean([[probe[i] in L2[g] for g in row]
                    for i, row in enumerate(gt)])
    assert cov2 > cov1

    store = VectorStore.from_numpy(base, "f32", row_block=256)
    r = {}
    for name, idx in (("r1", one), ("r2", two)):
        _, ids = idx.search(queries, 10, nprobe=2, refine_k=30,
                            refine_store=store)
        # no duplicate ids in any result row
        for row in ids:
            assert len(set(row.tolist())) == len(row)
        r[name] = _recall(ids, gt)
    # end-to-end recall stays within ADC noise of the single-copy index
    assert r["r2"] >= r["r1"] - 0.05


def test_ivfpq_replicated_save_load(tmp_path):
    rng = np.random.default_rng(12)
    base = rng.standard_normal((2000, 64)).astype(np.float32)
    one = IVFPQIndex.build(base, nlist=8, m=8, use_opq=False, n_iters=4, seed=6)
    two = IVFPQIndex.repack(one, base, pad_factor=3.0, replicas=2)
    p = str(tmp_path / "rep.npz")
    two.save(p)
    back = IVFPQIndex.load(p)
    assert back.replicas == 2
    q = base[:8]
    v1, i1 = two.search(q, 5, nprobe=4)
    v2, i2 = back.search(q, 5, nprobe=4)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_host_build_paths_match_device():
    """The >=_HOST_BUILD_ROWS build stages (host BLAS rotation, host PQ
    encode) must agree with the device paths they replace — the threshold
    means large builds take them, so pin the parity here on small data."""
    from nvdb_tpu.index.ivf_pq import (_encode_chunked, _encode_host,
                                       _host_chunked, _rotate_inplace_host)

    rng = np.random.default_rng(3)
    x = rng.standard_normal((513, 64)).astype(np.float32)

    # rotation: host in-place chunked matmul vs device chunked matmul
    q_mat, _ = np.linalg.qr(rng.standard_normal((64, 64)))
    rot = q_mat.astype(np.float32)
    dev = _host_chunked(lambda c: c @ jnp.asarray(rot), x, chunk=128)
    host = _rotate_inplace_host(x.copy(), rot, chunk=128)
    np.testing.assert_allclose(host, dev, atol=2e-5)

    # encode: host argmin vs kernels/pq.encode
    m = 8
    cb = jnp.asarray(rng.standard_normal((m, 256, 64 // m)).astype(np.float32))
    dev_codes = np.asarray(_encode_chunked(jnp.asarray(x), cb, m))
    host_codes = _encode_host(x, np.asarray(cb), m, chunk=100)
    assert (dev_codes == host_codes).mean() > 0.999  # f32 assoc ties only
