"""Stats vocabulary parity with the reference harness."""

import numpy as np

from nvdb_tpu.eval.stats import LatencyStats, compute_stats, percentile, result_line
from nvdb_tpu.eval.recall import recall_at_k


def test_percentile_matches_reference_interpolation():
    """pos = p/100*(n-1), linear interp (nvdb_bench.cpp:370-377)."""
    vals = [1.0, 2.0, 3.0, 4.0]
    assert percentile(vals, 50) == 2.5
    assert percentile(vals, 0) == 1.0
    assert percentile(vals, 100) == 4.0
    assert abs(percentile(vals, 99) - (3.0 + 0.97 * 1.0)) < 1e-12
    assert percentile([], 50) == 0.0
    assert percentile([7.0], 99) == 7.0


def test_compute_stats_per_query():
    s = compute_stats([2.0, 4.0, 6.0, 8.0], n_queries=4, bytes_per_query=5e6)
    assert s.total_ms == 20.0
    assert s.avg_ms == 5.0
    assert s.qps == 200.0
    # 5e6 bytes / 5 ms = 1 GB/s
    assert abs(s.bandwidth_gbps - 1.0) < 1e-12
    out = s.render()
    assert "Avg_query: 5.000 ms/query" in out and "p99:" in out


def test_compute_stats_batched():
    # 10 queries in 3 batches of 4/4/2
    s = compute_stats([8.0, 8.0, 4.0], n_queries=10, batch_q=4)
    assert s.n_samples == 3
    assert s.avg_ms == 2.0
    assert s.avg_batch_ms == 20.0 / 3
    assert "batch_p99" in s.render() and "batch_samples=3" in s.render()


def test_result_line_format():
    line = result_line(refine_k=50, recall=0.974312, mode="staged", ok=True)
    assert line.startswith("RESULT ")
    assert " refine_k=50 " in line
    assert " recall=0.974312 " in line
    assert line.endswith("ok=1")


def test_recall_at_k():
    gt = np.array([[1, 2, 3], [4, 5, 6]])
    pred = np.array([[3, 2, 9], [4, 5, 6]])
    assert recall_at_k(pred, gt) == (2 + 3) / 6
    assert recall_at_k(pred, gt, k=1) == 0.5  # only first column each
