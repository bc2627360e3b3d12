"""Benchmark problems (random QPs, lane-change trajectory games) and the
timing/statistics harness (reference benchmark/ directory)."""

from . import lane_change, qp
from .harness import benchmark_batched, benchmark_sequential, summary_statistics

__all__ = [
    "lane_change",
    "qp",
    "benchmark_batched",
    "benchmark_sequential",
    "summary_statistics",
]
