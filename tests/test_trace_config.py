import os
import time

from nvdb_tpu.config import EvalConfig, IVFConfig, PQConfig, ScanConfig
from nvdb_tpu.eval.trace import Tracer


def test_tracer_spans(tmp_path):
    tr = Tracer()
    with tr.span("stage_a"):
        time.sleep(0.01)
    with tr.span("stage_a"):
        pass
    with tr.span("stage_b", sync=lambda: time.sleep(0.005)):
        pass
    assert len(tr.samples_ms["stage_a"]) == 2
    assert tr.samples_ms["stage_a"][0] >= 10.0
    assert tr.samples_ms["stage_b"][0] >= 5.0  # sync included in the span
    out = str(tmp_path / "t.tsv")
    tr.dump_tsv(out)
    lines = open(out).read().strip().split("\n")
    assert lines[0] == "span\tsample\tms"
    assert len(lines) == 4
    assert "stage_a" in tr.render()


def test_config_from_env(monkeypatch):
    monkeypatch.setenv("IVF_NLIST", "4096")
    monkeypatch.setenv("IVF_NPROBE", "64")
    monkeypatch.setenv("PQ_M", "64")
    monkeypatch.setenv("USE_OPQ", "0")
    monkeypatch.setenv("REFINE_K", "50")
    monkeypatch.setenv("WARMUP", "5")
    monkeypatch.setenv("EVAL_MODE", "ann_only")
    assert IVFConfig.from_env().nlist == 4096
    assert IVFConfig.from_env().nprobe == 64
    pqc = PQConfig.from_env()
    assert pqc.m == 64 and not pqc.use_opq and pqc.refine_k == 50
    ev = EvalConfig.from_env()
    assert ev.warmup == 5 and ev.ann_only


def test_config_defaults():
    for k in ("IVF_NLIST", "PQ_M", "WARMUP", "EVAL_MODE", "NVDB_FORCE_JNP"):
        os.environ.pop(k, None)
    assert IVFConfig.from_env().nlist == 1024
    assert PQConfig.from_env().m == 48
    assert ScanConfig.from_env().backend == "auto"
