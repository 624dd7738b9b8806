"""Profiling and step-timing instrumentation.

The reference's only instrumentation is per-move proposal counters
(``/root/reference/src/eryn/moves/move.py:88-90``); the rebuild adds what
SURVEY flags as missing: JAX profiler hooks and segment/step timing.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np

__all__ = ["SegmentTimer", "trace_profile"]


class SegmentTimer:
    """Accumulates per-segment wall time and step counts.

    Attached to every :class:`~eryn_tpu.ensemble.EnsembleSampler` as
    ``sampler.timing``; updated around each compiled segment dispatch.
    """

    def __init__(self):
        self.reset()

    def reset(self):
        self.segments = 0
        self.total_steps = 0
        self.total_time = 0.0
        self._durations = []

    def record(self, nsteps, seconds):
        self.segments += 1
        self.total_steps += nsteps
        self.total_time += seconds
        self._durations.append((nsteps, seconds))

    @property
    def steps_per_second(self):
        if self.total_time == 0:
            return float("nan")
        return self.total_steps / self.total_time

    def summary(self):
        per_seg = (
            np.array([s / max(t, 1e-12) for s, t in self._durations])
            if self._durations
            else np.array([])
        )
        return {
            "segments": self.segments,
            "total_steps": self.total_steps,
            "total_time_s": self.total_time,
            "steps_per_second": self.steps_per_second,
            "steps_per_second_max": float(per_seg.max()) if per_seg.size else None,
        }

    def __repr__(self):
        return f"SegmentTimer({self.summary()})"


@contextlib.contextmanager
def trace_profile(log_dir):
    """Capture a JAX profiler trace of everything inside the context.

    Usage::

        with trace_profile("/tmp/eryn_trace"):
            sampler.run_mcmc(coords, 1000)

    View with TensorBoard / xprof.
    """
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
