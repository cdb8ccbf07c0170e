"""Profiling and timing instrumentation.

The reference's only observability is wall-clock prints
(/root/reference/src/libs/runner.py:83-96).  Here:

* :class:`StepTimer` — running per-step stats with events/sec, the runner's
  timing backend.
* :func:`trace` — context manager around ``jax.profiler`` so any run can
  capture a TensorBoard-viewable device trace (``--profile`` in the CLI).
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


class StepTimer:
    """Accumulates per-step wall times and event counts."""

    def __init__(self):
        self.times: list[float] = []
        self.events: list[int] = []
        self._t0 = None

    def start(self):
        self._t0 = time.time()

    def stop(self, num_events: int = 0) -> float:
        dt = time.time() - self._t0
        self.times.append(dt)
        self.events.append(num_events)
        return dt

    @property
    def steps(self) -> int:
        return len(self.times)

    def summary(self, skip_warmup: int = 1) -> dict:
        t = np.asarray(self.times[skip_warmup:] or self.times)
        e = np.asarray(self.events[skip_warmup:] or self.events)
        return {
            "steps": self.steps,
            "mean_sec_per_step": float(t.mean()) if t.size else 0.0,
            "p50_sec_per_step": float(np.percentile(t, 50)) if t.size else 0.0,
            "p99_sec_per_step": float(np.percentile(t, 99)) if t.size else 0.0,
            "events_per_sec": float(e.sum() / t.sum()) if t.size and t.sum() else 0.0,
        }


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Capture a jax.profiler trace under ``log_dir`` (no-op when None)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
