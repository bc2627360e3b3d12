"""Batch (vmap) and distributed (mesh/shard_map) parallel solving."""

from .batch import batch_statistics, solve_batch
from .mesh import BATCH_AXIS, make_batch_mesh, solve_batch_sharded

__all__ = [
    "BATCH_AXIS",
    "batch_statistics",
    "make_batch_mesh",
    "solve_batch",
    "solve_batch_sharded",
]
