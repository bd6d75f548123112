"""Pallas ADC kernel (interpret mode) vs the jnp gather oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nvdb_tpu.formats import synth
from nvdb_tpu.index.ivf_pq import IVFPQIndex, _ivfpq_search_block


@pytest.fixture(scope="module")
def built():
    base = synth.low_rank(6000, 128, intrinsic=16, n_clusters=64, seed=3)
    idx = IVFPQIndex.build(base, nlist=16, m=16, use_opq=True,
                           train_size=4000, seed=0)
    queries, _ = synth.sample_queries(base, 8, seed=5, perturb=0.02)
    qp = np.zeros((8, idx.centroids.shape[1]), np.float32)
    qp[:, :128] = queries
    return idx, jnp.asarray(qp)


def _run(idx, qp, k, nprobe, backend):
    q_rot = qp @ idx.rotation if idx.rotation is not None else qp
    return _ivfpq_search_block(q_rot, idx.centroids, idx.codebooks,
                               idx.codes, idx.slot_ids, k, nprobe, idx.m,
                               backend=backend)


@pytest.mark.parametrize("nprobe,k", [(4, 10), (8, 32)])
def test_pallas_adc_matches_jnp(built, nprobe, k):
    idx, qp = built
    jv, ji = _run(idx, qp, k, nprobe, "jnp")
    pv, pi = _run(idx, qp, k, nprobe, "pallas")
    jv, ji = np.asarray(jv), np.asarray(ji)
    pv, pi = np.asarray(pv), np.asarray(pi)
    # the kernel rounds LUT entries to bf16, so gate on ranking agreement:
    # the candidate sets must overlap heavily and scores must be close
    for r in range(ji.shape[0]):
        inter = len(set(ji[r].tolist()) & set(pi[r].tolist()))
        assert inter >= int(0.8 * k), (r, ji[r], pi[r])
    np.testing.assert_allclose(pv, jv, rtol=2e-2, atol=2e-2)
    # ids valid and unique
    assert (pi >= 0).all()
    for row in pi:
        assert len(set(row.tolist())) == k


def test_pallas_adc_end_to_end_refine(built):
    """Full search_device with refine through the pallas ADC backend."""
    idx, qp = built
    base = synth.low_rank(6000, 128, intrinsic=16, n_clusters=64, seed=3)

    class _Store:
        vectors = jnp.asarray(
            np.pad(base, ((0, 0), (0, idx.centroids.shape[1] - 128))))
        scales = None

    v_j, i_j = idx.search_device(qp, 10, nprobe=8, refine_k=40,
                                 refine_store=_Store, backend="jnp")
    v_p, i_p = idx.search_device(qp, 10, nprobe=8, refine_k=40,
                                 refine_store=_Store, backend="pallas")
    # refine re-scores exactly in f32, so the two backends must agree
    # wherever their candidate sets overlap; gate on strong agreement
    agree = np.mean(np.asarray(i_j) == np.asarray(i_p))
    assert agree > 0.9, agree


@pytest.mark.parametrize("g", [1, 3, 4, 16])
def test_pallas_adc_g_grouping(built, g):
    """The lists-per-step fold must not change results, including when g
    does not divide nprobe (the padded duplicate-probe path) and when g
    exceeds nprobe (clamped)."""
    from nvdb_tpu.kernels import adc_scan

    idx, qp = built
    q_rot = qp @ idx.rotation
    from nvdb_tpu.kernels import pq
    nprobe, k = 6, 10
    jv, ji = _ivfpq_search_block(q_rot, idx.centroids, idx.codebooks,
                                 idx.codes, idx.slot_ids, k, nprobe, idx.m,
                                 backend="jnp")
    qc = jnp.dot(q_rot, idx.centroids.T)
    c2 = jnp.sum(idx.centroids * idx.centroids, axis=1)[None, :]
    _, probes = jax.lax.top_k(2.0 * qc - c2, nprobe)
    cents_p = jnp.take(idx.centroids, probes, axis=0)
    residuals = q_rot[:, None, :] - cents_p
    lut = pq.adc_lut(residuals.reshape(-1, q_rot.shape[1]),
                     idx.codebooks, idx.m)
    lut = lut.reshape(8, nprobe, idx.m, 16, 16)
    pv, pi = adc_scan.pallas_adc_topk(lut, probes, idx.codes, idx.slot_ids,
                                      k, g=g)
    pi = np.asarray(pi)
    ji_np = np.asarray(ji)
    for r in range(8):
        inter = len(set(ji_np[r].tolist()) & set(pi[r].tolist()))
        assert inter >= int(0.8 * k)
        assert len(set(pi[r].tolist())) == k


@pytest.mark.parametrize("chunk", [32, 64])
def test_pallas_adc_chunk_skip_bit_identical(chunk):
    """ADC generation 4 (chunk-skipping): scoring each list in fill-gated
    chunks must be BIT-identical to the full-width scan — skipped chunks
    hold only padding lanes, which the full-width path masks to NEG_INF
    anyway. Lists have varied fills (0, partial chunk, exactly on a chunk
    boundary, full) to cover every gate outcome."""
    from nvdb_tpu.kernels import adc_scan

    m, lcap, nlist, k = 16, 128, 8, 10
    rng = np.random.default_rng(1)
    fills_spec = [0, 5, chunk, chunk + 3, lcap, 17, 2 * chunk, 1]
    codes = np.zeros((nlist, m, lcap), np.uint8)
    slot_ids = np.full((nlist, lcap), -1, np.int32)
    nxt = 0
    for li, f in enumerate(fills_spec):
        slot_ids[li, :f] = np.arange(nxt, nxt + f)
        nxt += f
        codes[li, :, :f] = rng.integers(0, 256, (m, f))
    lut = rng.standard_normal((2, nlist, m, 16, 16)).astype(np.float32) * 0.1
    probes = np.tile(np.arange(nlist, dtype=np.int32)[None, :], (2, 1))
    fills = adc_scan.list_fills(jnp.asarray(slot_ids))
    np.testing.assert_array_equal(np.asarray(fills), fills_spec)
    args = (jnp.asarray(lut), jnp.asarray(probes), jnp.asarray(codes),
            jnp.asarray(slot_ids), k)
    fv, fi = adc_scan.pallas_adc_topk(*args, g=4, chunk=lcap)   # full width
    cv, ci = adc_scan.pallas_adc_topk(*args, g=4, chunk=chunk, fills=fills)
    np.testing.assert_array_equal(np.asarray(fv), np.asarray(cv))
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(ci))


@pytest.mark.parametrize("chunk", [32, 128])
@pytest.mark.parametrize("mode", ["key", "gather"])
def test_pallas_adc_key_mode_matches_dma(chunk, mode):
    """Gen-5 key mode (packed score|lane keys + double-buffered codes DMA)
    and gen-6 gather mode (XLA-gathered codes, pipelined blocks) must
    produce the same candidates as the DMA-id path on a prefix-packed
    index, modulo the packed merge's bf16-truncated ranking: candidate
    sets may differ only where scores collide at 16-bit granularity, and
    returned values are truncated to those 16 bits."""
    from nvdb_tpu.kernels import adc_scan

    m, lcap, nlist, k = 16, 128, 8, 10
    rng = np.random.default_rng(3)
    fills_spec = [0, 5, chunk, chunk + 3, lcap, 17, 2 * chunk, 1]
    codes = np.zeros((nlist, m, lcap), np.uint8)
    slot_ids = np.full((nlist, lcap), -1, np.int32)
    # non-contiguous global ids: the key->id remap must survive arbitrary
    # id assignment, not just arange
    perm = rng.permutation(10 * lcap)
    nxt = 0
    for li, f in enumerate(fills_spec):
        f = min(f, lcap)
        slot_ids[li, :f] = perm[nxt:nxt + f]
        nxt += f
        codes[li, :, :f] = rng.integers(0, 256, (m, f))
    lut = rng.standard_normal((2, nlist, m, 16, 16)).astype(np.float32) * 0.1
    probes = np.tile(np.arange(nlist, dtype=np.int32)[None, :], (2, 1))
    assert bool(adc_scan.is_prefix_packed(jnp.asarray(slot_ids)))
    args = (jnp.asarray(lut), jnp.asarray(probes), jnp.asarray(codes),
            jnp.asarray(slot_ids), k)
    dv, di = adc_scan.pallas_adc_topk(*args, g=4, chunk=chunk,
                                      ids_mode="dma")
    kv, ki = adc_scan.pallas_adc_topk(*args, g=4, chunk=chunk,
                                      ids_mode="key")
    dv, di = np.asarray(dv), np.asarray(di)
    kv, ki = np.asarray(kv), np.asarray(ki)
    for r in range(2):
        inter = len(set(di[r].tolist()) & set(ki[r].tolist()))
        assert inter >= int(0.8 * k), (r, di[r], ki[r])
        assert len(set(ki[r].tolist())) == k
        assert (ki[r] >= 0).all()
    # values agree to the 16-bit score truncation
    np.testing.assert_allclose(kv, dv, rtol=1e-2, atol=1e-2)


def test_pallas_adc_key_mode_odd_probe_pad():
    """Key mode with P % g != 0 exercises the duplicated-probe pad: the
    duplicate list contributes identical keys, which the merge must absorb
    into one slot (no -1 filler, unique ids)."""
    from nvdb_tpu.kernels import adc_scan

    m, lcap, nlist, k = 16, 64, 6, 8
    rng = np.random.default_rng(4)
    codes = rng.integers(0, 256, (nlist, m, lcap)).astype(np.uint8)
    slot_ids = np.arange(nlist * lcap, dtype=np.int32).reshape(nlist, lcap)
    lut = rng.standard_normal((1, 5, m, 16, 16)).astype(np.float32) * 0.1
    probes = np.array([[0, 2, 4, 1, 3]], dtype=np.int32)      # P=5, g=4
    kv, ki = adc_scan.pallas_adc_topk(
        jnp.asarray(lut), jnp.asarray(probes), jnp.asarray(codes),
        jnp.asarray(slot_ids), k, g=4, ids_mode="key")
    ki = np.asarray(ki)[0]
    assert (ki >= 0).all(), ki
    assert len(set(ki.tolist())) == k


def test_pallas_adc_key_mode_scarce_candidates():
    """Fewer live candidates than k (mostly-empty lists): key mode must
    emit the real candidates first and -1 filler after, never a garbage
    coordinate from a padding lane."""
    from nvdb_tpu.kernels import adc_scan

    m, lcap, nlist, k = 16, 64, 4, 10
    rng = np.random.default_rng(5)
    codes = np.zeros((nlist, m, lcap), np.uint8)
    slot_ids = np.full((nlist, lcap), -1, np.int32)
    slot_ids[1, :3] = [7, 8, 9]          # only 3 live rows in the corpus
    codes[1, :, :3] = rng.integers(0, 256, (m, 3))
    lut = rng.standard_normal((1, nlist, m, 16, 16)).astype(np.float32) * 0.1
    probes = np.arange(nlist, dtype=np.int32)[None, :]
    kv, ki = adc_scan.pallas_adc_topk(
        jnp.asarray(lut), jnp.asarray(probes), jnp.asarray(codes),
        jnp.asarray(slot_ids), k, g=4, ids_mode="key")
    ki = np.asarray(ki)[0]
    assert set(ki[:3].tolist()) == {7, 8, 9}, ki
    assert (ki[3:] == -1).all(), ki


def test_ids_mode_selection():
    """Index-level guard: 'key' only on prefix-packed replicas<=1 indexes."""
    from nvdb_tpu.kernels import adc_scan

    sid_packed = jnp.asarray([[0, 1, 2, -1], [3, -1, -1, -1]], jnp.int32)
    sid_holes = jnp.asarray([[0, -1, 2, -1], [3, -1, -1, -1]], jnp.int32)
    assert bool(adc_scan.is_prefix_packed(sid_packed))
    assert not bool(adc_scan.is_prefix_packed(sid_holes))


def test_pallas_adc_replicated_ids_share_one_slot():
    """Regression (round-2 review): a replicated row's second copy, probed in
    a LATER grid step, must absorb into the existing slot (keeping the best
    score) instead of occupying a second slot — which evicted genuine
    candidates and made the final id-collapsing sort emit -1 filler."""
    from nvdb_tpu.kernels import adc_scan

    m, lcap, nlist, k = 16, 128, 8, 10
    rng = np.random.default_rng(0)
    # lists 0 and 4 hold the SAME 12 ids (copies, slightly different codes);
    # lists 1-3 hold 12 more unique ids each
    codes = np.zeros((nlist, m, lcap), np.uint8)
    slot_ids = np.full((nlist, lcap), -1, np.int32)
    nxt = 12
    for li in range(nlist):
        if li == 4:
            slot_ids[4, :12] = slot_ids[0, :12]
        else:
            if li == 0:
                slot_ids[0, :12] = np.arange(12)
            else:
                slot_ids[li, :12] = np.arange(nxt, nxt + 12)
                nxt += 12
        codes[li, :, :12] = rng.integers(0, 256, (m, 12))
    lut = rng.standard_normal((1, nlist, m, 16, 16)).astype(np.float32) * 0.1
    probes = np.arange(nlist, dtype=np.int32)[None, :]
    pv, pi = adc_scan.pallas_adc_topk(
        jnp.asarray(lut), jnp.asarray(probes), jnp.asarray(codes),
        jnp.asarray(slot_ids), k, g=4)
    pi = np.asarray(pi)[0]
    assert (pi >= 0).all(), pi               # no -1 filler
    assert len(set(pi.tolist())) == k        # unique ids


def test_pallas_adc_deep_k_256(built):
    """k=256 = two slot-buffer sublane rows (the deep-k refine-depth path):
    the kernel's ADC top-256 must match the exact jnp top-256 up to bf16
    LUT-rounding ties (measured 0.996+ overlap for the rounding alone),
    ids unique, scores sorted descending."""
    idx, qp = built
    k, nprobe = 256, 16
    jv, ji = _run(idx, qp, k, nprobe, "jnp")
    pv, pi = _run(idx, qp, k, nprobe, "pallas")
    jv, ji = np.asarray(jv), np.asarray(ji)
    pv, pi = np.asarray(pv), np.asarray(pi)
    for r in range(ji.shape[0]):
        got = set(pi[r].tolist())
        assert len(got) == k                     # unique
        assert set(ji[r, :128].tolist()) <= got, r
        inter = len(set(ji[r].tolist()) & got)
        assert inter >= int(0.98 * k), (r, inter)
        assert (np.diff(pv[r]) <= 1e-6).all()    # sorted descending
    np.testing.assert_allclose(pv, jv, rtol=2e-2, atol=2e-2)


def test_pallas_adc_deep_k_192(built):
    """Non-multiple-of-128 depth (k=192: row 1 half-live) and an odd probe
    count."""
    idx, qp = built
    jv, ji = _run(idx, qp, 192, 15, "jnp")
    pv, pi = _run(idx, qp, 192, 15, "pallas")
    ji, pi = np.asarray(ji), np.asarray(pi)
    for r in range(ji.shape[0]):
        got = set(pi[r].tolist())
        assert len(got) == 192
        assert set(ji[r, :128].tolist()) <= got
        inter = len(set(ji[r].tolist()) & got)
        assert inter >= int(0.98 * 192), (r, inter)


def test_pallas_adc_deep_end_to_end_refine(built):
    """refine_k=256 through the pallas backend: full probing + f32 refine
    must recover the exact top-10 and agree with the jnp backend."""
    idx, qp = built
    base = synth.low_rank(6000, 128, intrinsic=16, n_clusters=64, seed=3)

    class _Store:
        vectors = jnp.asarray(
            np.pad(base, ((0, 0), (0, idx.centroids.shape[1] - 128))))
        scales = None

    v_j, i_j = idx.search_device(qp, 10, nprobe=16, refine_k=256,
                                 refine_store=_Store, backend="jnp")
    v_p, i_p = idx.search_device(qp, 10, nprobe=16, refine_k=256,
                                 refine_store=_Store, backend="pallas")
    agree = np.mean(np.asarray(i_j) == np.asarray(i_p))
    assert agree > 0.95, agree

    # ids_mode="dma" override: exact-f32 candidate ranking end to end —
    # after the f32 refine it must also recover the jnp top-10
    v_d, i_d = idx.search_device(qp, 10, nprobe=16, refine_k=256,
                                 refine_store=_Store, backend="pallas",
                                 ids_mode="dma")
    agree_d = np.mean(np.asarray(i_j) == np.asarray(i_d))
    assert agree_d > 0.95, agree_d


def test_pallas_adc_deep_replicated_dedup():
    """Deep-k over a replicated index: a row's two copies can improve the
    buffer in different rounds — the widened merge must still absorb the
    duplicate (id-equality check spans all slot rows)."""
    from nvdb_tpu.formats import synth as _synth

    base = _synth.low_rank(4000, 64, intrinsic=8, n_clusters=32, seed=9)
    one = IVFPQIndex.build(base, nlist=16, m=8, use_opq=False, n_iters=4,
                           seed=7, train_size=4000)
    rep = IVFPQIndex.repack(one, base, pad_factor=2.0, replicas=2)
    qp = np.zeros((8, rep.centroids.shape[1]), np.float32)
    queries, _ = _synth.sample_queries(base, 8, seed=10, perturb=0.02)
    qp[:, :64] = queries
    pv, pi = _run(rep, jnp.asarray(qp), 192, 16, "pallas")
    pi = np.asarray(pi)
    for row in pi:
        live = [i for i in row.tolist() if i >= 0]
        assert len(live) == len(set(live))       # no duplicate ids
