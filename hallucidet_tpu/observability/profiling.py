"""Profiling/tracing: jax.profiler integration + per-step timing.

The reference has no tracing at all (SURVEY.md §5 — only cudnn.benchmark and
thread pinning). The TPU build gets first-class hooks: Perfetto traces via
jax.profiler and a host-side step timer with block_until_ready semantics for
honest wall-clock numbers.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/hallucidet_trace") -> Iterator[None]:
    """Capture a Perfetto/TensorBoard trace of the enclosed steps."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with device sync; keeps a running summary."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.times = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if self.sync and result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(1, len(self.times))

    def summary(self) -> dict:
        if not self.times:
            return {}
        ts = sorted(self.times)
        return {
            "mean_s": self.mean,
            "p50_s": ts[len(ts) // 2],
            "min_s": ts[0],
            "max_s": ts[-1],
            "steps": len(ts),
        }
