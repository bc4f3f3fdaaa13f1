"""Profiling hooks (SURVEY §5.1: the reference has none; we provide
jax.profiler traces + a step timer that powers the examples/s logging)."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a Perfetto-compatible device trace into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock EMA of step time -> examples/s."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self._last: float | None = None
        self.ema: float | None = None

    def tick(self) -> float | None:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self.ema = dt if self.ema is None else (
                self.alpha * dt + (1 - self.alpha) * self.ema
            )
        self._last = now
        return self.ema

    def examples_per_sec(self, batch_size: int) -> float | None:
        return batch_size / self.ema if self.ema else None
