"""Profiling hooks (SURVEY.md section 5.1 — the reference has none beyond
wall-clock step timing; this adds the TPU-native tooling).

* :func:`trace` — context manager around `jax.profiler` writing a
  TensorBoard-compatible trace (xplane) for a window of steps.
* :class:`StepTimer` — blocking wall-clock timing with warmup discard and
  percentile summary (the honest way to time through an async dispatch
  queue: block on a representative output each step).
* :func:`annotate` — `jax.profiler.TraceAnnotation` wrapper so named
  regions show up in the trace viewer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np


@contextlib.contextmanager
def trace(logdir: str, enabled: bool = True):
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: List[float] = []
        self._t0: Optional[float] = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self._times.append(dt)

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {}
        a = np.asarray(self._times)
        return {
            "mean_s": float(a.mean()),
            "median_s": float(np.median(a)),
            "p90_s": float(np.percentile(a, 90)),
            "min_s": float(a.min()),
            "steps": len(a),
        }
