"""Profiling/tracing helpers — the TPU counterpart of SURVEY §5's gap.

The reference has no tracer (proxies: wall-clock steps/s logs + psutil
sampling). Here:

- ``trace(log_dir)``: context manager around ``jax.profiler`` producing a
  TensorBoard-loadable device trace of the fused loop;
- ``StageTimer``: per-stage wall-clock aggregation for the trainer's host
  loop (iteration / eval / checkpoint breakdown, reported at close);
- ``annotate``: named ``TraceAnnotation`` scopes that show up inside the
  device trace.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from pathlib import Path

import jax


@contextlib.contextmanager
def trace(log_dir: str | Path, create_perfetto_link: bool = False):
    """Capture a device trace viewable in TensorBoard's profile plugin."""
    log_dir = str(log_dir)
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope that appears on the device timeline."""
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Accumulates wall-clock per named stage; cheap enough for every iteration."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> dict[str, dict[str, float]]:
        return {
            name: {
                "total_sec": self.totals[name],
                "count": self.counts[name],
                "mean_sec": self.totals[name] / max(self.counts[name], 1),
            }
            for name in self.totals
        }

    def summary_line(self) -> str:
        parts = [
            f"{name}={self.totals[name]:.1f}s/{self.counts[name]}x"
            for name in sorted(self.totals, key=self.totals.get, reverse=True)
        ]
        return " ".join(parts)
