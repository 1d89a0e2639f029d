"""Profiling hooks: jax.profiler traces + per-step wall timing.

The reference has no profiling support (SURVEY.md section 5.1 — tqdm bars
only); here tracing is first-class: wrap any pipeline loop section in
``trace(logdir)`` to capture a TensorBoard-viewable device trace, and use
``StepTimer`` for host-side step statistics.
"""

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace(logdir, enabled=True):
    """Capture a jax.profiler trace into ``logdir`` (TensorBoard format)."""
    if not enabled or logdir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name):
    """Named trace annotation visible in the profiler timeline."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Host-side step timing with summary statistics.

    Use as ``with timer.step(): ...`` around each training step; call
    ``summary()`` for mean/median/p90 (excluding warmup steps).
    """

    def __init__(self, warmup=2):
        self.times = []
        self.warmup = warmup

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - t0)

    def summary(self):
        steady = self.times[self.warmup:] or self.times
        if not steady:
            return {}
        arr = np.asarray(steady)
        return {
            "steps": len(self.times),
            "mean_s": float(arr.mean()),
            "median_s": float(np.median(arr)),
            "p90_s": float(np.percentile(arr, 90)),
            "steps_per_sec": float(1.0 / max(arr.mean(), 1e-9)),
        }

    def log(self, logger, prefix=""):
        s = self.summary()
        if s:
            logger.info(
                f"{prefix}steps/s {s['steps_per_sec']:.2f} "
                f"(median {s['median_s']*1e3:.1f} ms, "
                f"p90 {s['p90_s']*1e3:.1f} ms over {s['steps']} steps)")
