"""Tracing / profiling subsystem.

The reference has none — wall-clock only (`timeit.default_timer` around
training, `/root/reference/core/executor/base_executor.py:88,126`). Here:

* `StepTimer` — per-step wall clock, rolling samples/sec (the BASELINE.json
  headline metric) and p50 latency.
* `maybe_trace` — wraps a region in a `jax.profiler` trace when a profile
  directory is configured (view with xprof/tensorboard).
* `enable_nan_checks` — flips `jax_debug_nans` (the functional-purity
  equivalent of torch anomaly detection).
"""

from __future__ import annotations

import contextlib
import statistics
import time
from typing import List, Optional

import jax

from .logger import get_logger

log = get_logger(__name__)


class StepTimer:
    """Rolling per-step timing; call `tick(n_samples)` once per step."""

    def __init__(self, window: int = 100):
        self.window = window
        self._durations: List[float] = []
        self._samples: List[int] = []
        self._last: Optional[float] = None

    def start(self) -> None:
        self._last = time.perf_counter()

    def tick(self, n_samples: int) -> float:
        now = time.perf_counter()
        dt = now - (self._last if self._last is not None else now)
        self._last = now
        self._durations.append(dt)
        self._samples.append(n_samples)
        if len(self._durations) > self.window:
            self._durations.pop(0)
            self._samples.pop(0)
        return dt

    @property
    def samples_per_sec(self) -> float:
        total = sum(self._durations)
        return sum(self._samples) / total if total else 0.0

    @property
    def p50_ms(self) -> float:
        return statistics.median(self._durations) * 1000 if self._durations else 0.0

    def summary(self) -> str:
        return f"{self.samples_per_sec:.1f} samples/s, p50 {self.p50_ms:.1f} ms/step"


@contextlib.contextmanager
def maybe_trace(profile_dir: Optional[str], name: str = "step"):
    """jax.profiler trace if a directory is configured, else a no-op."""
    if not profile_dir:
        yield
        return
    with jax.profiler.trace(profile_dir):
        with jax.profiler.TraceAnnotation(name):
            yield
    log.info(f"profiler trace written to {profile_dir}")


def enable_nan_checks(enabled: bool = True) -> None:
    jax.config.update("jax_debug_nans", enabled)
