"""REAL multi-process jax.distributed run (VERDICT round-2 missing #3).

Two OS processes, each with 4 virtual CPU devices, join one global runtime
through a localhost coordinator (the NVDB_COORD explicit wiring of
dist/multihost.init_from_env), build the 8-device global row mesh, stream
DISJOINT row ranges of one vecbin file, and run the sharded flat search as
one SPMD program. The parent asserts both ranks return identical ids that
match the float64 oracle — validating the only seam of the 100M plan
(docs/SCALE_100M.md) that single-process tests cannot reach.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from nvdb_tpu.formats import synth, vecbin

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multiproc_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_search(tmp_path):
    # bounded by the communicate(timeout=240) below; no plugin marks
    n, d, q_n, k = 4096, 64, 8, 10
    base = synth.clustered(n, d, n_clusters=16, seed=3)
    base_path = str(tmp_path / "base.vecbin")
    vecbin.write_vecbin(base_path, base.astype(np.float32))
    queries, _ = synth.sample_queries(base, q_n, seed=5, perturb=0.05)
    q_path = str(tmp_path / "queries.npy")
    np.save(q_path, queries.astype(np.float32))

    port = _free_port()
    nproc = 2
    procs = []
    for rank in range(nproc):
        env = dict(os.environ)
        env["NVDB_COORD"] = f"localhost:{port}"
        env["NVDB_NPROC"] = str(nproc)
        env["NVDB_PROC_ID"] = str(rank)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, base_path, q_path, str(k), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for pp in procs:
                pp.kill()
            raise
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"OK rank={rank}" in out, out
        # the runtime really was multi-process
        assert "process %d/2" % rank in out and "global_devices=8" in out, out

    ids0 = np.load(tmp_path / "ids_0.npy")
    ids1 = np.load(tmp_path / "ids_1.npy")
    np.testing.assert_array_equal(ids0, ids1)  # replicated result agrees

    # oracle exactness: achieved f64 scores == top-k scores
    s64 = queries.astype(np.float64) @ base.T.astype(np.float64)
    ref = np.sort(s64, axis=1)[:, ::-1][:, :k]
    got = np.take_along_axis(s64, ids0.astype(np.int64), axis=1)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=0)


def test_two_process_ivf_eval_tool(tmp_path):
    """The full ivf_eval tool (sharded IVF-PQ + SHARDED refine) under a real
    2-process runtime: both ranks run the same SPMD eval; rank 0's RESULT
    line must report the same recall as a single-process run."""
    import re

    from nvdb_tpu.index.ivf_pq import IVFPQIndex

    n, d, q_n, k = 2048, 64, 16, 10
    base = synth.clustered(n, d, n_clusters=16, seed=11)
    base_path = str(tmp_path / "base.vecbin")
    vecbin.write_vecbin(base_path, base.astype(np.float32))
    queries, _ = synth.sample_queries(base, q_n, seed=13, perturb=0.05)
    q_path = str(tmp_path / "q.vecbin")
    vecbin.write_vecbin(q_path, queries.astype(np.float32))

    idx = IVFPQIndex.build(base, nlist=32, m=8, use_opq=False,
                           train_size=n, n_iters=3, seed=7)
    idx_path = str(tmp_path / "idx.npz")
    idx.save(idx_path)

    # ground truth via the tool chain (single process)
    gt_path = str(tmp_path / "gt.gtbin")
    run_env = dict(os.environ)
    run_env["PYTHONPATH"] = REPO + os.pathsep + run_env.get("PYTHONPATH", "")
    subprocess.run(
        [sys.executable, "-m", "nvdb_tpu.tools.gt_build", base_path, q_path,
         gt_path, "--k", str(k), "--cpu"],
        env=run_env, check=True, capture_output=True, text=True, timeout=240)

    args = [sys.executable, "-m", "nvdb_tpu.tools.ivf_eval", idx_path,
            base_path, q_path, "--k", str(k), "--nprobe", "32",
            "--refine-k", "64", "--gt", gt_path, "--cpu", "--shards", "8"]

    single = subprocess.run(args, env=run_env, check=True,
                            capture_output=True, text=True, timeout=240)
    m1 = re.search(r"recall=([0-9.]+)", single.stdout)
    assert m1, single.stdout

    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(run_env)
        env["NVDB_COORD"] = f"localhost:{port}"
        env["NVDB_NPROC"] = "2"
        env["NVDB_PROC_ID"] = str(rank)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        procs.append(subprocess.Popen(
            args, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for pp in procs:
                pp.kill()
            raise
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert "process %d/2" % rank in out, out
    m2 = re.search(r"recall=([0-9.]+)", outs[0])
    assert m2, outs[0]
    # full-probing recall identical across runtimes (deterministic program)
    assert abs(float(m1.group(1)) - float(m2.group(1))) < 1e-6, \
        (m1.group(1), m2.group(1))
