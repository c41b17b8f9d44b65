"""Tracing and profiling utilities.

The reference instruments every pipeline stage with ``tracing`` spans
and RAII phase timers, and exposes Prometheus on every service (SURVEY
SS5). TPU equivalents:

- :func:`trace` — JAX profiler trace context writing TensorBoard-format
  traces (device + host timelines) to a directory.
- :func:`annotate` — named host-span annotation that shows up inside
  profiler traces (``jax.profiler.TraceAnnotation``).
- :class:`PhaseTimers` — process-wide named phase timer registry with a
  report, the Timer(lib.rs:389-401) analogue for multi-phase jobs.
- Prometheus metrics live next to each service (serving/*.py).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a JAX profiler trace (view with TensorBoard / Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in profiler timelines."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class PhaseTimers:
    """Accumulating named phase timers with a printable report."""

    def __init__(self):
        self._totals: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._totals[name] += time.perf_counter() - t0
            self._counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self._totals, key=self._totals.get, reverse=True):
            lines.append(
                f"{name}: {self._totals[name]:.2f}s "
                f"({self._counts[name]} calls)"
            )
        return "\n".join(lines)

    def totals(self) -> Dict[str, float]:
        return dict(self._totals)


GLOBAL_TIMERS = PhaseTimers()
