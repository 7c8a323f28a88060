"""Profiling hooks.

The reference has no tracing/profiling at all (SURVEY §5). These helpers
wrap ``jax.profiler`` so any pipeline region can be captured for
xprof/perfetto, plus a lightweight wall-clock step timer.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace_profile(logdir: str):
    """Capture a jax.profiler trace of the enclosed region into ``logdir``
    (viewable with xprof / tensorboard-profile / perfetto)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling wall-clock timer with warm-up skip (first N steps compile)."""

    def __init__(self, skip_first: int = 1):
        self.skip_first = skip_first
        self.times: list[float] = []
        self._seen = 0
        self._t0: float | None = None

    def __enter__(self) -> "StepTimer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self.skip_first:
            self.times.append(dt)

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0
