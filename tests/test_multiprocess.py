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
