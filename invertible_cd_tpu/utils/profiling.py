"""Profiling / tracing hooks (SURVEY.md §5: the reference has none — tqdm
only; this is the TPU-native observability layer).

  * `trace(dir)` — context manager around `jax.profiler` producing a
    TensorBoard-viewable trace of the wrapped region (XLA ops, TPU
    timelines).
  * `StageTimer` — lightweight wall-clock stage timing with device sync,
    for per-stage latency breakdowns (text encode / UNet loop / VAE).
  * `annotate(name)` — TraceAnnotation passthrough so stages show up
    named inside profiles.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Wall-clock timings with `block_until_ready` fencing.

    timer = StageTimer()
    with timer.stage("unet"):
        out = step(...)
    timer.result(out)   # fences the async dispatch into the stage
    print(timer.summary())
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}
        self._current: Optional[str] = None
        self._t0 = 0.0

    @contextlib.contextmanager
    def stage(self, name: str):
        self._current = name
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1
            self._current = None

    def result(self, value):
        """Call inside a stage with the stage's output to include device
        execution time (jax dispatch is async)."""
        jax.block_until_ready(value)
        return value

    def summary(self) -> Dict[str, float]:
        return {
            name: self.totals[name] / max(self.counts[name], 1)
            for name in self.totals
        }
