"""Round-trip and bit-compatibility tests for vecbin64 / raw12 / gtbin."""

import numpy as np
import pytest

from nvdb_tpu.formats import gtbin, synth, vecbin


def test_vecbin_f32_roundtrip(tmp_path):
    x = synth.normalized_gaussian(100, 32, seed=1)
    p = str(tmp_path / "a.vecbin")
    info = vecbin.write_vecbin(p, x)
    assert info.count == 100 and info.dim == 32 and info.dtype == vecbin.DTYPE_F32
    f = vecbin.VecbinFile(p)
    assert f.count == 100 and f.dim == 32
    np.testing.assert_array_equal(np.asarray(f.vectors), x)
    np.testing.assert_array_equal(f.rows_f32(5, 10), x[5:10])


def test_vecbin_header_layout(tmp_path):
    """The on-disk header must match the reference struct byte-for-byte
    (vecbin_format.h:17-29): offsets magic@0 version@8 dtype@12 dim@16
    reserved0@20 count@24, total 64 bytes."""
    x = np.zeros((3, 7), dtype=np.float32)
    p = str(tmp_path / "h.vecbin")
    vecbin.write_vecbin(p, x)
    raw = open(p, "rb").read()
    assert len(raw) == 64 + 3 * 7 * 4
    assert int.from_bytes(raw[0:8], "little") == vecbin.MAGIC
    assert int.from_bytes(raw[8:12], "little") == 1  # version
    assert int.from_bytes(raw[12:16], "little") == vecbin.DTYPE_F32
    assert int.from_bytes(raw[16:20], "little") == 7  # dim
    assert int.from_bytes(raw[24:32], "little") == 3  # count


def test_raw12_roundtrip(tmp_path):
    x = synth.normalized_gaussian(17, 12, seed=2)
    p = str(tmp_path / "legacy.bin")
    info = vecbin.write_vecbin(p, x, legacy_raw12=True)
    assert info.legacy_raw12
    f = vecbin.VecbinFile(p)
    assert f.count == 17 and f.dim == 12 and f.dtype == vecbin.DTYPE_F32
    np.testing.assert_array_equal(np.asarray(f.vectors), x)


def test_vecbin_i8_roundtrip(tmp_path):
    x = synth.normalized_gaussian(50, 16, seed=3)
    q, scales = vecbin.quantize_i8(x)
    assert q.dtype == np.int8 and np.abs(q).max() <= 127
    p = str(tmp_path / "q.vecbin")
    vecbin.write_vecbin(p, q, dtype="i8", scales=scales)
    f = vecbin.VecbinFile(p)
    assert f.dtype == vecbin.DTYPE_I8
    np.testing.assert_array_equal(np.asarray(f.vectors), q)
    np.testing.assert_array_equal(np.asarray(f.scales), scales)
    # dequantized rows approximate originals within the max-abs/127 grid
    deq = f.rows_f32()
    assert np.max(np.abs(deq - x)) <= np.max(scales) * 0.5 + 1e-7


def test_quantize_matches_reference_scheme():
    """scale = max_abs/127, round, clamp (nvdb_quantize_i8.cpp:71-80)."""
    row = np.array([[0.5, -1.0, 0.25, 0.0]], dtype=np.float32)
    q, s = vecbin.quantize_i8(row)
    assert s[0] == np.float32(1.0 / 127.0)
    np.testing.assert_array_equal(q[0], [64, -127, 32, 0])  # rint(0.5*127)=64 (63.5->64)


def test_vecbin_bf16_roundtrip(tmp_path):
    x = synth.normalized_gaussian(20, 8, seed=4)
    b = vecbin.to_bf16(x)
    p = str(tmp_path / "b.vecbin")
    vecbin.write_vecbin(p, b, dtype="bf16")
    f = vecbin.VecbinFile(p)
    assert f.dtype == vecbin.DTYPE_BF16
    np.testing.assert_allclose(f.rows_f32(), x, atol=0.01)


def test_streaming_writer(tmp_path):
    x = synth.normalized_gaussian(33, 8, seed=5)
    q, s = vecbin.quantize_i8(x)
    p = str(tmp_path / "s.vecbin")
    with vecbin.StreamingVecbinWriter(p, 8, "i8") as w:
        w.append(q[:10], s[:10])
        w.append(q[10:], s[10:])
    f = vecbin.VecbinFile(p)
    assert f.count == 33
    np.testing.assert_array_equal(np.asarray(f.vectors), q)
    np.testing.assert_array_equal(np.asarray(f.scales), s)


def test_vecbin_size_validation(tmp_path):
    x = np.zeros((4, 4), dtype=np.float32)
    p = str(tmp_path / "bad.vecbin")
    vecbin.write_vecbin(p, x)
    with open(p, "ab") as f:
        f.write(b"xx")  # corrupt length
    with pytest.raises(ValueError, match="size mismatch"):
        vecbin.VecbinFile(p)


def test_gtbin_roundtrip(tmp_path):
    ids = np.arange(60, dtype=np.uint32).reshape(6, 10)
    p = str(tmp_path / "gt.gtbin")
    gtbin.write_gtbin(p, ids, dim=384, N=1000)
    info, got = gtbin.read_gtbin(p)
    assert (info.Q, info.k, info.dim, info.N) == (6, 10, 384, 1000)
    np.testing.assert_array_equal(np.asarray(got), ids)
    raw = open(p, "rb").read()
    assert int.from_bytes(raw[0:8], "little") == gtbin.GT_MAGIC
    assert len(raw) == 64 + 60 * 4


def test_sample_queries_unique_and_seeded():
    base = synth.normalized_gaussian(200, 16, seed=7)
    q1, i1 = synth.sample_queries(base, 50, seed=9)
    q2, i2 = synth.sample_queries(base, 50, seed=9)
    np.testing.assert_array_equal(i1, i2)
    assert len(set(i1.tolist())) == 50
    np.testing.assert_array_equal(q1, base[i1])


def test_synth_normalized():
    for gen in (synth.normalized_gaussian, synth.clustered):
        x = gen(64, 24, seed=11)
        np.testing.assert_allclose(np.linalg.norm(x, axis=1), 1.0, atol=1e-5)


def test_f16_file_loads_into_store(tmp_path):
    """f16 (dtype=2) files — the reference's reduced-precision format — load
    and re-encode to the TPU-native bf16 store."""
    from nvdb_tpu.formats import synth
    from nvdb_tpu.store import VectorStore

    x = synth.normalized_gaussian(64, 32, seed=9)
    p = str(tmp_path / "h.vecbin")
    vecbin.write_vecbin(p, x.astype(np.float16), dtype="f16")
    store = VectorStore.from_vecbin(p, row_block=32)
    assert store.dtype_code == vecbin.DTYPE_BF16
    assert store.src_dtype_code == vecbin.DTYPE_F16
    got = np.asarray(store.vectors[:64, :32], dtype=np.float32)
    np.testing.assert_allclose(got, x, atol=0.02)


def test_public_api_imports():
    import nvdb_tpu

    for name in ("VectorStore", "FlatIndex", "IVFFlatIndex", "IVFPQIndex",
                 "PartitionRerankIndex", "build_ground_truth"):
        assert hasattr(nvdb_tpu, name)


def test_clustered_chunked_shares_centers():
    """Chunked generation must produce ONE global cluster structure."""
    a = synth.clustered(256, 32, n_clusters=4, spread=0.05, seed=7, chunk_seed=0)
    b = synth.clustered(256, 32, n_clusters=4, spread=0.05, seed=7, chunk_seed=1)
    # rows of chunk b must sit near some center of chunk a's structure
    # (tight clusters: cos-sim to the nearest a-row > 0.99)
    sims = (b @ a.T).max(axis=1)
    assert sims.min() > 0.98
    # but the chunks themselves are different draws
    assert not np.allclose(a[:10], b[:10])


def test_hard_corpus_recall_slopes():
    """The hard() generator must produce a sloping recall-vs-nprobe curve —
    the property the round-1 sweeps lacked (flat lines at every nprobe)."""
    import numpy as np
    from nvdb_tpu.formats import synth
    from nvdb_tpu.index.ivf_flat import IVFFlatIndex

    base = synth.hard(8000, 64, intrinsic=16, topics=128, seed=1)
    assert np.allclose(np.linalg.norm(base, axis=1), 1.0, atol=1e-4)
    queries, _ = synth.sample_queries(base, 32, seed=2, perturb=0.05)
    s = queries @ base.T
    gt = np.argsort(-s, axis=1)[:, :10]
    idx = IVFFlatIndex.build(base, nlist=128, dtype="f32", n_iters=6, seed=0)

    def rec(npb):
        _, ids = idx.search(queries, 10, nprobe=npb)
        return np.mean([len(set(ids[q].tolist()) & set(gt[q].tolist()))
                        for q in range(32)]) / 10

    r1, r16, r64 = rec(1), rec(16), rec(64)
    assert r1 < 0.92, r1            # hard at low nprobe
    assert r16 > r1 + 0.05, (r1, r16)  # climbs with probes
    assert r64 > 0.93, r64          # recoverable at high nprobe


def test_hard_corpus_chunked_consistent():
    """Chunked generation shares topic geometry (same seed, different
    chunk_seed) so 'clusters' exist globally across chunks."""
    import numpy as np
    from nvdb_tpu.formats import synth

    a = synth.hard(2000, 64, intrinsic=16, topics=64, seed=5, chunk_seed=0)
    b = synth.hard(2000, 64, intrinsic=16, topics=64, seed=5, chunk_seed=2000)
    c = synth.hard(2000, 64, intrinsic=16, topics=64, seed=6, chunk_seed=0)
    # same-seed chunks share topic geometry: cross-chunk nearest neighbors
    # must be markedly closer than chunks drawn with independent centers
    same = np.mean((a @ b.T).max(axis=1))
    diff = np.mean((a @ c.T).max(axis=1))
    assert same > diff + 0.03, (same, diff)


def test_gt_build_chunked_matches_resident(tmp_path):
    """The chunked exact-GT path (for corpora larger than HBM) must produce
    the same ids as the resident scan, including across chunk boundaries."""
    import numpy as np
    import jax.numpy as jnp
    from nvdb_tpu.formats import vecbin
    from nvdb_tpu.index.flat import build_ground_truth_chunked
    from nvdb_tpu.kernels import ops

    rng = np.random.default_rng(9)
    base = rng.standard_normal((3000, 64)).astype(np.float32)
    path = str(tmp_path / "b.vecbin")
    vecbin.write_vecbin(path, base)
    q = base[:16] + 0.01 * rng.standard_normal((16, 64)).astype(np.float32)

    ids_c = build_ground_truth_chunked(path, q, 10, batch=8, row_chunk=1100)
    qp = np.zeros((16, 128), np.float32); qp[:, :64] = q
    bp = np.zeros((3072, 128), np.float32); bp[:3000, :64] = base
    _, ids_r = ops.scan_topk(jnp.asarray(qp), jnp.asarray(bp), None, 3000, 10)
    np.testing.assert_array_equal(ids_c, np.asarray(ids_r).astype(np.uint32))
