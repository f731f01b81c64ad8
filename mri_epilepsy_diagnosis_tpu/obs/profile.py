"""Profiling hooks: `jax.profiler` traces + per-step wall timing.

Replaces the reference's ad-hoc `time.time()` epoch timing
(`utils/routine.py:52,72`) with structured traces a TPU profile viewer can
consume (SURVEY.md §5 'tracing/profiling: rebuild').
"""
from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def profile_trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates per-step wall times; blocks on device results so timings
    are true step latencies, not dispatch times."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, *sync_arrays):
        for a in sync_arrays:
            jax.block_until_ready(a)
        self.times.append(time.perf_counter() - self._t0)

    @property
    def mean(self):
        return float(np.mean(self.times)) if self.times else float("nan")

    @property
    def total(self):
        return float(np.sum(self.times))
