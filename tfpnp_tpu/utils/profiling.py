"""Profiling: XLA traces + lightweight step timers.

The reference has no tracing at all — only wall-clock deltas in the train
log (SURVEY §5; trainer.py:96-112). Here profiling is first-class:
``trace(dir)`` wraps a region in a ``jax.profiler`` trace viewable in
TensorBoard/Perfetto (op-level HLO timeline, HBM usage), and ``StepTimer``
aggregates host-side step latencies with percentiles.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List

import numpy as np

__all__ = ["trace", "StepTimer"]


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """Context manager: profile the enclosed region to ``log_dir``."""
    if not enabled:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Named wall-clock section timer with summary percentiles."""

    def __init__(self):
        self._t: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._t.setdefault(name, []).append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self._t.items():
            a = np.asarray(xs)
            out[name] = {"n": len(xs), "mean_s": float(a.mean()),
                         "p50_s": float(np.percentile(a, 50)),
                         "p95_s": float(np.percentile(a, 95)),
                         "total_s": float(a.sum())}
        return out
