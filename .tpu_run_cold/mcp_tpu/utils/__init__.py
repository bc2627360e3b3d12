"""Utility modules: profiling/tracing helpers, probe device placement."""

from .devices import cpu_probe_device, enable_host_probe_backend, probes_on_cpu
from .profiling import PhaseTimer, time_compiled, trace

__all__ = [
    "PhaseTimer",
    "cpu_probe_device",
    "enable_host_probe_backend",
    "probes_on_cpu",
    "time_compiled",
    "trace",
]
