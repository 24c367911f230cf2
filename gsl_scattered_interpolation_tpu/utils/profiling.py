"""Tracing/profiling hooks.

The reference's only instrumentation is the accel hit/miss counters
(gsl_interp.h:41-46).  Here: a wall-clock block timer that forces device
completion (block_until_ready) so timings are honest under async dispatch,
and a thin wrapper around the JAX profiler for trace capture.
"""

from __future__ import annotations

import contextlib
import time

import jax


class Timer:
    """Accumulating named wall-clock timer (device-synchronized)."""

    def __init__(self):
        self.times: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def time(self, name: str, result=None):
        t0 = time.perf_counter()
        yield
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - t0
        self.times[name] = self.times.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def timed(self, name: str, fn, *args, **kw):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args, **kw))
        dt = time.perf_counter() - t0
        self.times[name] = self.times.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1
        return out

    def report(self) -> str:
        lines = [
            f"{k}: {self.times[k]:.4f}s / {self.counts[k]}x"
            for k in sorted(self.times)
        ]
        return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a JAX profiler trace (view with tensorboard/xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
