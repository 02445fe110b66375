"""Tracing / profiling hooks.

The reference has no tracer — only commented-out thop/ptflops calls and the
per-epoch wall time (SURVEY.md §5). The TPU-native equivalents:

- ``trace(logdir)``: context manager around ``jax.profiler`` — produces a
  TensorBoard-loadable device trace of everything inside.
- ``annotate(name)``: TraceAnnotation for labeling host-side spans.
- ``StepTimer``: per-step wall-time accounting with percentile summary
  (synchronizes via host readback — see documentation/benchmarking.md).
"""

import time
from contextlib import contextmanager
from typing import Optional

import numpy as np


@contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    import jax
    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Accumulates per-step durations; ``summary()`` gives mean/p50/p90."""

    def __init__(self):
        self.durations = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_value=None):
        if sync_value is not None:
            float(np.asarray(sync_value).ravel()[0])  # host readback = sync
        assert self._t0 is not None, "start() not called"
        self.durations.append(time.perf_counter() - self._t0)
        self._t0 = None

    @contextmanager
    def step(self):
        self.start()
        yield
        self.stop()

    def summary(self) -> dict:
        if not self.durations:
            return {}
        d = np.asarray(self.durations)
        return {"n": int(d.size), "mean_s": float(d.mean()),
                "p50_s": float(np.percentile(d, 50)),
                "p90_s": float(np.percentile(d, 90)),
                "min_s": float(d.min()), "max_s": float(d.max())}
