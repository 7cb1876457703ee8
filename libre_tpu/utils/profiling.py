"""Tracing / metrics (SURVEY.md §5.1, §5.5).

The reference has per-frame overlay statistics + cache hit/miss counters +
an exit-time FPS log (Channel::drawCacheStatistics, CacheStatistics.h,
Client.cpp:239-243).  Here: per-stage wall timers, a rays/s counter (the
BASELINE metric), and optional JAX profiler traces (Perfetto) around
frames.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class StageTimers:
    """Named accumulating wall-clock timers (select / upload / render /
    composite stages of the frame loop)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals):
            t, n = self.totals[name], self.counts[name]
            lines.append(f"{name}: {t * 1e3:.2f} ms total / {n} = "
                         f"{t / n * 1e3:.2f} ms avg")
        return "\n".join(lines)

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


class RaysPerSecond:
    """The BASELINE throughput counter: rays rendered / wall time."""

    def __init__(self):
        self.rays = 0
        self.seconds = 0.0

    @contextlib.contextmanager
    def measure(self, n_rays: int) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.seconds += time.perf_counter() - t0
            self.rays += n_rays

    @property
    def mrays_per_s(self) -> float:
        return self.rays / self.seconds / 1e6 if self.seconds else 0.0


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]) -> Iterator[None]:
    """JAX profiler trace (Perfetto/XPlane) around a region; no-op when
    ``log_dir`` is None."""
    if log_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    """Named trace annotation for host-side stages inside a device_trace."""
    import jax

    return jax.profiler.TraceAnnotation(name)
