"""End-to-end CLI tool pipeline: synth -> query -> GT -> quantize/convert ->
bench with recall — the whole reference executable suite in-process."""

import numpy as np
import pytest

from nvdb_tpu.formats import gtbin, vecbin
from nvdb_tpu.tools import (bench, convert_bf16, dump, gt_build, make_query,
                            quantize_i8, sanity, search, slice as slice_tool,
                            synth as synth_tool)


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    d = tmp_path_factory.mktemp("tools")
    base = str(d / "base.vecbin")
    q = str(d / "q.vecbin")
    gt = str(d / "gt.gtbin")
    synth_tool.main([base, "--count", "3000", "--dim", "64", "--seed", "3",
                     "--clusters", "8", "--spread", "1.0"])
    make_query.main([base, q, "--q", "16", "--seed", "5"])
    gt_build.main([base, q, gt, "--k", "5", "--backend", "jnp"])
    return d, base, q, gt


def test_dump_sanity(files, capsys):
    _, base, _, _ = files
    dump.main([base])
    out = capsys.readouterr().out
    assert "count=3000 dim=64 dtype=f32" in out
    sanity.main([base, "--samples", "4"])
    assert "OK" in capsys.readouterr().out


def test_search_prints_topk(files, capsys):
    _, base, q, _ = files
    search.main([base, q, "--k", "3", "--q", "2", "--backend", "jnp"])
    out = capsys.readouterr().out
    assert out.count("query ") == 2 and "#0: id=" in out


def test_bench_recall_one(files, capsys):
    _, base, q, gt = files
    bench.main([base, q, "5", "--gt", gt, "--batch-q", "8", "--backend", "jnp"])
    out = capsys.readouterr().out
    assert "recall@5=1.0000" in out
    assert "RESULT mode=flat" in out
    assert "payload_equiv_bandwidth_GBps=" in out


def test_quantize_convert_bench(files, capsys):
    d, base, q, gt = files
    i8 = str(d / "base_i8.vecbin")
    bf = str(d / "base_bf16.vecbin")
    quantize_i8.main([base, i8])
    convert_bf16.main([base, bf])
    capsys.readouterr()
    bench.main([i8, q, "5", "--gt", gt, "--backend", "jnp"])
    out = capsys.readouterr().out
    recall = float(out.split("recall@5=")[1].split()[0])
    assert recall >= 0.9
    bench.main([bf, q, "5", "--gt", gt, "--backend", "jnp"])
    out = capsys.readouterr().out
    assert float(out.split("recall@5=")[1].split()[0]) >= 0.9


def test_slice(files, capsys):
    d, base, _, _ = files
    out_p = str(d / "sliced.vecbin")
    slice_tool.main([base, out_p, "--n", "500"])
    f = vecbin.VecbinFile(out_p)
    assert f.count == 500
    orig = vecbin.VecbinFile(base)
    np.testing.assert_array_equal(np.asarray(f.vectors),
                                  np.asarray(orig.vectors[:500]))


def test_make_query_reproducible(files, capsys):
    d, base, _, _ = files
    q2 = str(d / "q2.vecbin")
    make_query.main([base, q2, "--q", "16", "--seed", "5"])
    out1 = capsys.readouterr().out
    q3 = str(d / "q3.vecbin")
    make_query.main([base, q3, "--q", "16", "--seed", "5"])
    out2 = capsys.readouterr().out
    assert out1.split("chosen_indices:")[1].split("\n")[0] == \
           out2.split("chosen_indices:")[1].split("\n")[0]
    np.testing.assert_array_equal(
        np.asarray(vecbin.VecbinFile(q2).vectors),
        np.asarray(vecbin.VecbinFile(q3).vectors))


def test_gt_matches_oracle(files):
    _, base, q, gt = files
    info, gt_ids = gtbin.read_gtbin(gt)
    bf = vecbin.VecbinFile(base)
    qf = vecbin.VecbinFile(q)
    s = qf.rows_f32().astype(np.float64) @ bf.rows_f32().T.astype(np.float64)
    ref = np.argsort(-s, axis=1)[:, :5]
    got = np.take_along_axis(s, np.asarray(gt_ids, dtype=np.int64), axis=1)
    want = np.take_along_axis(s, ref, axis=1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pr_build_search_roundtrip(files, capsys):
    d, base, q, _ = files
    from nvdb_tpu.tools import pr_build, pr_search

    out = str(d / "pr.npz")
    pr_build.main([base, out, "--nlist", "32", "--iters", "4", "--backend", "jnp"])
    capsys.readouterr()
    pr_search.main([out, q, "--k", "3", "--nprobe", "32", "--base", base,
                    "--rerank-k", "10", "--backend", "jnp"])
    outp = capsys.readouterr().out
    assert outp.count("query ") == 16


def test_convert_f16_reference_dtype(files, capsys):
    d, base, _, _ = files
    from nvdb_tpu.tools import convert_bf16

    f16 = str(d / "base_f16.vecbin")
    convert_bf16.main([base, f16, "--f16"])
    f = vecbin.VecbinFile(f16)
    assert f.dtype == vecbin.DTYPE_F16  # dtype code 2, reference-readable
    orig = vecbin.VecbinFile(base)
    np.testing.assert_allclose(f.rows_f32(0, 10), orig.rows_f32(0, 10),
                               atol=2e-3)


def test_ab_compare(files, capsys):
    _, base, q, _ = files
    from nvdb_tpu.tools import ab_compare

    ab_compare.main([base, q, "--pairs", "4", "--a", "jnp", "--b", "jnp",
                     "--batch-q", "4"])
    out = capsys.readouterr().out
    assert "mean(A-B)" in out and "RESULT ab_a=jnp" in out


def test_ivf_build_eval_pipeline(files, capsys):
    """ivf_build -> ivf_eval RESULT grid, host and device-query paths, plus
    --repack-from: the nvdb_ivf_build + nvdb_ivf_eval pipeline in-process."""
    from nvdb_tpu.tools import ivf_build, ivf_eval

    d, base, q, gt = files
    idx = str(d / "ivfpq.npz")
    ivf_build.main([base, idx, "--kind", "ivfpq", "--nlist", "16",
                    "--pq-m", "8", "--no-opq", "--iters", "4"])
    capsys.readouterr()
    ivf_eval.main([idx, base, q, "--gt", gt, "--k", "5",
                   "--nprobe", "4", "--refine-k", "0", "20",
                   "--batch-q", "8", "--warmup", "1"])
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.startswith("RESULT")]
    assert len(lines) == 2
    assert "device_queries=0" in lines[0]
    refined = [l for l in lines if "refine_enabled=1" in l]
    assert len(refined) == 1 and "refine_backend=tpu-fused" in refined[0]

    ivf_eval.main([idx, base, q, "--gt", gt, "--k", "5",
                   "--nprobe", "8", "--refine-k", "20",
                   "--batch-q", "8", "--warmup", "1", "--device-queries"])
    out = capsys.readouterr().out
    rl = [l for l in out.splitlines() if l.startswith("RESULT")]
    assert len(rl) == 1 and "device_queries=1" in rl[0]
    rec = float(rl[0].split("recall=")[1].split()[0])
    assert rec >= 0.5

    ivf_eval.main([idx, base, q, "--gt", gt, "--k", "5",
                   "--nprobe", "8", "--refine-k", "20",
                   "--batch-q", "8", "--warmup", "1", "--chained"])
    out = capsys.readouterr().out
    cl = [l for l in out.splitlines() if l.startswith("RESULT")]
    assert len(cl) == 1 and "chained=1" in cl[0]
    assert float(cl[0].split("recall=")[1].split()[0]) >= 0.5

    idx2 = str(d / "ivfpq_repacked.npz")
    ivf_build.main([base, idx2, "--kind", "ivfpq", "--repack-from", idx,
                    "--pad-factor", "4.0", "--spill-candidates", "8"])
    out = capsys.readouterr().out
    assert "spilled=" in out


def test_ivf_eval_force_sharded(files, capsys):
    """--force-sharded runs the shard_map serving path on a 1-device mesh:
    the per-shard-Pallas-kernel path measured without a multi-chip slice."""
    from nvdb_tpu.tools import ivf_build, ivf_eval

    d, base, q, gt = files
    idx = str(d / "ivfpq_fs.npz")
    ivf_build.main([base, idx, "--kind", "ivfpq", "--nlist", "16",
                    "--pq-m", "8", "--no-opq", "--iters", "4"])
    capsys.readouterr()
    ivf_eval.main([idx, base, q, "--gt", gt, "--k", "5",
                   "--nprobe", "8", "--refine-k", "20",
                   "--batch-q", "8", "--warmup", "1", "--chained",
                   "--force-sharded"])
    out = capsys.readouterr().out
    assert "kind=ivfpq-sharded1" in out
    rl = [l for l in out.splitlines() if l.startswith("RESULT")]
    assert len(rl) == 1 and "chained=1" in rl[0]
    assert float(rl[0].split("recall=")[1].split()[0]) >= 0.5
