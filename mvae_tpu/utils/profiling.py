"""Tracing / profiling hooks (SURVEY.md §5: the reference's only
observability is print statements; the rebuild adds jax.profiler traces and
per-step wall timing while keeping the reference's log line format).

Usage: pass --profile-dir to any train CLI; the driver traces steps
[profile_start, profile_start + profile_steps) of the first epoch into a
TensorBoard-loadable trace directory.
"""

import contextlib

import jax


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
