"""Heterogeneous-shape routing: device-group dispatch (the EP analog).

Games arrive in many (N, horizon) shapes — training scenarios with varying
player counts, subgame decompositions after hard masking, mixed QP sizes.
XLA compiles one program per shape (the bucketed-compile half already lives
in selection/subgame.py); what remained (VERDICT r2, P-EP) is the routing
half: running DIFFERENT shape buckets on DIFFERENT device groups at the
same time, the way expert-parallel layers route tokens to experts
(SURVEY.md §2.4: "heterogeneous game instances routed to device groups").

Design — MPMD over mesh partitions via async dispatch:

* `partition_devices` splits the device list into one contiguous group per
  bucket, sized by largest-remainder proportional allocation over the
  buckets' estimated costs (batch × dims³ by default — the factorization
  dominates, scripts/time_plot.py:14 fits the reference at O(N³)).
* Each bucket gets its own 1-D batch mesh over its group and dispatches the
  existing `solve_batch_sharded` program onto it. JAX dispatch is async:
  because the groups are disjoint, the distinct programs execute
  CONCURRENTLY — no SPMD trickery needed, the runtime interleaves them.
* Batches are padded (edge-replicated θ) to a multiple of the group size
  and unpadded on return; statistics are recomputed on the unpadded batch
  so padding lanes never leak into success counts.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..mcp import PrimalDualMCP
from ..solver import SolverOptions
from ..types import SolveResult
from .mesh import make_batch_mesh, solve_batch_sharded

Array = jax.Array


@dataclass
class ShapeBucket:
    """One same-shape group of instances: a compiled program's worth of
    work. θ batch (B, p); optional warm starts (B, n)/(B, m)."""

    mcp: PrimalDualMCP
    thetas: Array
    x0: Optional[Array] = None
    y0: Optional[Array] = None
    s0: Optional[Array] = None
    options: Optional[SolverOptions] = None
    weight: Optional[float] = None  # override the cost estimate

    def cost(self) -> float:
        if self.weight is not None:
            return float(self.weight)
        n = self.mcp.unconstrained_dimension + self.mcp.constrained_dimension
        return float(self.thetas.shape[0]) * float(n) ** 3


def partition_devices(
    costs: Sequence[float], devices=None
) -> list[list]:
    """Split `devices` into len(costs) contiguous groups, sizes proportional
    to costs (largest-remainder; every bucket gets ≥ 1 device). Requires
    len(devices) ≥ len(costs)."""
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    k, D = len(costs), len(devices)
    if k == 0:
        return []
    if D < k:
        raise ValueError(f"{k} buckets need at least {k} devices, got {D}")
    total = float(sum(costs)) or 1.0
    # Reserve one device per bucket, distribute the remaining D-k by cost.
    spare = D - k
    quotas = [spare * c / total for c in costs]
    sizes = [1 + int(q) for q in quotas]
    remainders = [q - int(q) for q in quotas]
    for i in np.argsort(remainders)[::-1][: D - sum(sizes)]:
        sizes[int(i)] += 1
    groups, at = [], 0
    for sz in sizes:
        groups.append(devices[at : at + sz])
        at += sz
    return groups


def _pad_batch(arr: Optional[Array], B_pad: int) -> Optional[Array]:
    if arr is None:
        return None
    B = arr.shape[0]
    if B == B_pad:
        return arr
    # Edge-replicate: padded lanes solve a real instance (no degenerate
    # all-zero θ that could diverge and skew device wall-clock).
    return jnp.concatenate(
        [arr, jnp.broadcast_to(arr[-1:], (B_pad - B,) + arr.shape[1:])]
    )


def solve_routed(
    buckets: Sequence[ShapeBucket],
    devices=None,
) -> list[SolveResult]:
    """Solve every bucket concurrently, each on its own device group.

    Returns one batched SolveResult per bucket (original batch sizes,
    padding stripped). All programs are dispatched before any is awaited —
    disjoint device groups execute them simultaneously."""
    if devices is None:
        devices = jax.devices()
    groups = partition_devices([b.cost() for b in buckets], devices)
    pending = []
    for bucket, group in zip(buckets, groups):
        mesh = make_batch_mesh(group)
        B = bucket.thetas.shape[0]
        nd = len(group)
        B_pad = -(-B // nd) * nd
        sol, _ = solve_batch_sharded(
            bucket.mcp,
            _pad_batch(jnp.asarray(bucket.thetas), B_pad),
            mesh=mesh,
            x0=_pad_batch(bucket.x0, B_pad),
            y0=_pad_batch(bucket.y0, B_pad),
            s0=_pad_batch(bucket.s0, B_pad),
            options=bucket.options or SolverOptions(),
        )
        pending.append((sol, B))
    # Await only after every group's program is in flight.
    results = []
    for sol, B in pending:
        jax.block_until_ready(sol.x)
        results.append(jax.tree.map(lambda leaf: leaf[:B], sol))
    return results
