"""Mesh-sharded batched solving over ICI/DCN (SURVEY.md §2.4, §7.2.6).

The reference has no distributed execution whatsoever; this module is new
design surface mandated by the TPU build: a `("batch",)` device mesh,
`shard_map` of the vmapped interior-point solve over the batch axis
(embarrassingly parallel — each instance's while_loop runs on its shard's
device, collectives only aggregate statistics), and `psum`-based
batch-convergence reductions.

Multi-host entry: call `jax.distributed.initialize()` before building the
mesh, then pass globally-sharded θ. On a single host this transparently uses
all local devices (e.g. the 8-device virtual CPU mesh in tests, or a v5e
slice's chips).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..diff import _solve
from ..mcp import PrimalDualMCP
from ..solver import SolverOptions
from ..types import SolveResult

Array = jax.Array

BATCH_AXIS = "batch"


def initialize_distributed(**kwargs) -> None:
    """Multi-host entry: initialize the JAX distributed runtime so
    jax.devices() spans all hosts of the slice; call once per process before
    building meshes. Thin wrapper over jax.distributed.initialize (kwargs:
    coordinator_address, num_processes, process_id — auto-detected on TPU
    pods)."""
    jax.distributed.initialize(**kwargs)


def make_batch_mesh(devices=None, *, axis_name: str = BATCH_AXIS) -> Mesh:
    """1-D mesh over all (or given) devices for batch-parallel solving."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


@functools.lru_cache(maxsize=None)
def _sharded_solver(mcp: PrimalDualMCP, options: SolverOptions, mesh: Mesh):
    """Batched solve distributed over the mesh's batch axis.

    shard_map splits the global batch across devices; inside each shard a
    vmapped solve runs independently; outputs are re-assembled as a global
    batch. A psum of per-lane success flags gives the global convergence
    count without gathering solutions.
    """

    def local_solve(thetas, x0, y0, s0):
        sol = jax.vmap(
            lambda t, x, y, s: _solve(mcp, options, t, x, y, s)
        )(thetas, x0, y0, s0)
        num_solved = jax.lax.psum(
            jnp.sum((sol.status == 0).astype(jnp.int32)), BATCH_AXIS
        )
        return sol, num_solved

    spec = P(BATCH_AXIS)
    fn = jax.shard_map(
        local_solve,
        mesh=mesh,
        # The solver's while-loop carries mix per-lane (sharded) values with
        # fresh scalar constants; skip the varying-manual-axes consistency
        # check rather than pcast every constant in the carry.
        check_vma=False,
        in_specs=(spec, spec, spec, spec),
        out_specs=(
            SolveResult(
                x=spec,
                y=spec,
                s=spec,
                kkt_error=spec,
                epsilon=spec,
                outer_iters=spec,
                status=spec,
            ),
            P(),
        ),
    )
    return jax.jit(fn)


def solve_batch_sharded(
    mcp: PrimalDualMCP,
    thetas: Array,
    *,
    mesh: Optional[Mesh] = None,
    x0: Optional[Array] = None,
    y0: Optional[Array] = None,
    s0: Optional[Array] = None,
    options: Optional[SolverOptions] = None,
    **option_overrides,
) -> tuple[SolveResult, Array]:
    """Solve a global batch sharded across the mesh's devices.

    The batch size must divide the mesh size. Returns (batched SolveResult,
    global solved-count).
    """
    if options is None:
        options = SolverOptions(**option_overrides)
    elif option_overrides:
        import dataclasses

        options = dataclasses.replace(options, **option_overrides)
    if mesh is None:
        mesh = make_batch_mesh()
    thetas = jnp.asarray(thetas)
    B = thetas.shape[0]
    ndev = mesh.devices.size
    if B % ndev != 0:
        raise ValueError(f"batch size {B} must be divisible by mesh size {ndev}")
    n, m = mcp.unconstrained_dimension, mcp.constrained_dimension
    dtype = thetas.dtype
    if x0 is None:
        x0 = jnp.zeros((B, n), dtype)
    if y0 is None:
        y0 = jnp.ones((B, m), dtype)
    if s0 is None:
        s0 = jnp.ones((B, m), dtype)

    sharding = NamedSharding(mesh, P(BATCH_AXIS))
    thetas, x0, y0, s0 = (
        jax.device_put(a, sharding) for a in (thetas, x0, y0, s0)
    )
    return _sharded_solver(mcp, options, mesh)(thetas, x0, y0, s0)
