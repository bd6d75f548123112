"""Bench harness behavior: warmup exclusion, batch accounting, id collection."""

import numpy as np

from nvdb_tpu.eval.harness import run_benchmark


def test_harness_collects_all_ids_and_batches():
    calls = []

    def fake_search(qs, k):
        calls.append(qs.shape[0])
        ids = np.tile(np.arange(k), (qs.shape[0], 1)) + qs[:, :1].astype(int)
        return ids.astype(float), ids

    queries = np.arange(10, dtype=np.float32)[:, None] * np.ones((10, 4), np.float32)
    ids, stats = run_benchmark(fake_search, queries, k=3, batch_q=4, warmup=1)
    assert ids.shape == (10, 3)
    # every query's ids offset by its value (first column)
    np.testing.assert_array_equal(ids[7], [7, 8, 9])
    # 1 warmup call + ceil(10/4)=3 timed batches
    assert len(calls) == 4
    assert stats.n_samples == 3 and stats.batch_q == 4 and stats.n_queries == 10
    assert stats.total_ms > 0 and stats.qps > 0


def test_harness_per_query_mode():
    def fake_search(qs, k):
        return np.zeros((qs.shape[0], k)), np.zeros((qs.shape[0], k), int)

    queries = np.zeros((5, 4), np.float32)
    ids, stats = run_benchmark(fake_search, queries, k=2, batch_q=1, warmup=0)
    assert stats.n_samples == 5 and stats.batch_q == 1
    assert stats.avg_batch_ms is None
