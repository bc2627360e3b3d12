"""Utility modules: profiling/tracing helpers."""

from .profiling import PhaseTimer, time_compiled, trace

__all__ = ["PhaseTimer", "time_compiled", "trace"]
