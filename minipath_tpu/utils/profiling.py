"""Tracing and profiling utilities.

The reference ships no tracing framework — only a profiling cargo profile and
wall-time bookkeeping (SURVEY.md §5). Here the TPU-native equivalents are
first-class:

* :class:`PhaseTimers` — named wall-clock phase accumulation (built on the
  same :class:`~minipath_tpu.utils.stats.Stats` streaming accumulator the
  BVH statistics use); the render driver records dispatch/fetch phases.
* :func:`trace` — context manager around ``jax.profiler.trace`` producing a
  TensorBoard-compatible device trace.
* :func:`annotate` — named region annotation visible in device traces.
"""

from __future__ import annotations

import contextlib
import time

from minipath_tpu.utils.stats import Stats


class PhaseTimers:
    """Accumulates wall-clock durations per named phase."""

    def __init__(self):
        self._stats: dict[str, Stats] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.add(name, time.perf_counter() - t0)

    def add(self, name: str, seconds: float) -> None:
        self._stats.setdefault(name, Stats()).add_sample(seconds)

    def stats(self, name: str) -> Stats:
        return self._stats.get(name, Stats())

    def total(self, name: str) -> float:
        return self._stats[name].total if name in self._stats else 0.0

    def summary(self) -> dict:
        return {
            name: {
                "count": s.count,
                "total_s": round(s.total, 6),
                "avg_ms": round(1e3 * s.avg, 3) if s.count else None,
                "max_ms": round(1e3 * s.max, 3) if s.count else None,
            }
            for name, s in sorted(self._stats.items())
        }

    def __str__(self) -> str:
        lines = []
        for name, s in sorted(self._stats.items()):
            lines.append(f"{name}: n={s.count} total={s.total:.3f}s avg={1e3*s.avg:.1f}ms")
        return "\n".join(lines) or "no phases recorded"


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device/host profile viewable in TensorBoard/XProf."""
    import jax

    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    """Named region annotation shown in device traces."""
    import jax

    return jax.profiler.TraceAnnotation(name)
