"""Profiling / tracing utilities.

The reference's only instrumentation is wall-clock prints
(`/root/reference/models/baseline.py:1181,1209-1212` — survey §5). Here:
* :func:`annotate` — named ``jax.profiler.TraceAnnotation`` scopes that show
  up in TensorBoard/XProf traces;
* :func:`capture_trace` — context manager writing an XPlane trace dir;
* :class:`StepTimer` — per-step wall time, steps/sec, frames/sec with
  warmup exclusion (a first-class metric, consumed by bench.py and the
  training loop logger).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax


def annotate(name: str):
    """``with annotate("warp"):`` — names a region in device traces."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def capture_trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace viewable with TensorBoard's profile plugin."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, frames_per_step: float = 1.0, warmup: int = 2):
        self.frames_per_step = frames_per_step
        self.warmup = warmup
        self._count = 0
        self._total = 0.0
        self._last = None

    def start(self) -> None:
        self._last = time.perf_counter()

    def stop(self) -> None:
        dt = time.perf_counter() - self._last
        self._count += 1
        if self._count > self.warmup:
            self._total += dt

    @property
    def steps_per_sec(self) -> float:
        n = max(self._count - self.warmup, 0)
        return n / self._total if self._total > 0 else 0.0

    @property
    def frames_per_sec(self) -> float:
        return self.steps_per_sec * self.frames_per_step

    def summary(self) -> dict:
        return {"steps_per_sec": self.steps_per_sec,
                "frames_per_sec": self.frames_per_sec,
                "steps_timed": max(self._count - self.warmup, 0)}
