"""Tracing / profiling hooks (SURVEY.md §5: the reference's only
observability is print statements; the rebuild adds jax.profiler traces and
per-step wall timing while keeping the reference's log line format).

Usage: pass --profile-dir to any train CLI; the driver traces steps
[profile_start, profile_start + profile_steps) of the first epoch into a
TensorBoard-loadable trace directory.
"""

import contextlib
import time

import jax


class StepTimer:
    """Rolling per-step wall-time stats (compile step excluded by warmup)."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.n = 0
        self.total = 0.0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        dt = time.perf_counter() - self._t0
        self.n += 1
        if self.n > self.warmup:
            self.total += dt
        return dt

    @property
    def steps_per_sec(self):
        steps = self.n - self.warmup
        return steps / self.total if steps > 0 and self.total > 0 else 0.0


@contextlib.contextmanager
def maybe_trace(profile_dir, enabled: bool):
    """jax.profiler trace context; no-op when disabled."""
    if not enabled or not profile_dir:
        yield
        return
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
