"""Profiling and phase-timing utilities.

The reference has no instrumentation beyond ad-hoc `@elapsed` wrappers
(SURVEY.md §5); this provides the TPU-native equivalents: `jax.profiler`
trace capture around arbitrary code, and a lightweight phase timer that
separates compile time from execute time (first call vs steady-state).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulate wall-clock per named phase; report compile vs execute."""

    def __init__(self):
        self.phases: dict[str, list[float]] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases.setdefault(name, []).append(time.perf_counter() - t0)

    def summary(self) -> dict:
        out = {}
        for name, times in self.phases.items():
            out[name] = {
                "calls": len(times),
                "first_s": times[0],  # includes compile on jitted phases
                "steady_s": min(times[1:]) if len(times) > 1 else None,
                "total_s": sum(times),
            }
        return out


def time_compiled(fn: Callable, *args, repeats: int = 3) -> dict:
    """Time a jitted callable: returns compile+first-run vs best steady-state."""
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    first = time.perf_counter() - t0
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return {"first_s": first, "best_s": min(times), "mean_s": sum(times) / len(times)}
