"""Tracing / profiling utilities.

The reference's observability stack (SURVEY.md §5) maps here as:
- steady_clock spans around every stage (nvdb_bench.cpp:24-27)  -> ``Tracer.span``
- CUDA event H2D/kernel/D2H splits (cuda_refine.cu:917-1157)   -> per-stage spans
  ending in ``jax.block_until_ready`` / host fetches (no H2D/D2H stages exist on
  the fused TPU path; what remains is dispatch vs compute vs fetch)
- clock64 in-kernel sampling + Nsight counters                  -> ``jax_profile``
  (XLA/jax profiler traces viewable in TensorBoard/xprof)
- TSV dumps with self-describing filenames (nvdb_ivf_eval.cpp:47-126)
                                                               -> ``Tracer.dump_tsv``
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict
from typing import Dict, Iterator, List


class Tracer:
    """Named wall-clock spans with per-span sample lists."""

    def __init__(self) -> None:
        self.samples_ms: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def span(self, name: str, sync=None) -> Iterator[None]:
        """Time a stage. Pass ``sync=jax.block_until_ready``-style callable (or
        any result-fetching thunk) to close the async-dispatch gap before the
        span ends."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                sync()
            self.samples_ms[name].append((time.perf_counter() - t0) * 1e3)

    def totals(self) -> Dict[str, float]:
        return {k: sum(v) for k, v in self.samples_ms.items()}

    def render(self) -> str:
        lines = []
        for name, v in self.samples_ms.items():
            tot = sum(v)
            lines.append(f"{name}: total={tot:.3f} ms n={len(v)} "
                         f"avg={tot / len(v):.3f} ms")
        return "\n".join(lines)

    def dump_tsv(self, path: str) -> None:
        """Self-describing TSV: one row per (span, sample_idx, ms)."""
        with open(path, "w") as f:
            f.write("span\tsample\tms\n")
            for name, v in self.samples_ms.items():
                for i, ms in enumerate(v):
                    f.write(f"{name}\t{i}\t{ms:.6f}\n")


@contextlib.contextmanager
def jax_profile(log_dir: str = "/tmp/nvdb_xprof") -> Iterator[str]:
    """Capture an XLA profiler trace (the Nsight-counters analogue). View with
    tensorboard/xprof pointed at the returned directory."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
