"""Batched MCP solving: `vmap` over θ (and warm starts) as the parallelism
primitive (SURVEY.md §7.1.3).

The reference solves one instance at a time on a single CPU thread
(SURVEY.md §2.4: no parallelism of any kind exists there); batching whole
θ sweeps — benchmark samples, receding-horizon agents, training batches —
into one compiled program is the single biggest TPU win: every Newton
iteration becomes a batched (n+m)³ LU + batched residual evaluation on the
MXU, and instances that converge early are masked (XLA's batched while_loop
runs until all lanes finish).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..diff import _solve
from ..mcp import PrimalDualMCP
from ..solver import SolverOptions, default_initialization
from ..types import SolveResult

Array = jax.Array


@functools.lru_cache(maxsize=None)
def _batched_solver(mcp: PrimalDualMCP, options: SolverOptions):
    """(B,p),(B,n),(B,m),(B,m) → batched SolveResult; jitted per (mcp, opts).

    Differentiable: vmap of the custom_jvp solve keeps the IFT rule per lane.
    """
    fn = jax.vmap(lambda theta, x0, y0, s0: _solve(mcp, options, theta, x0, y0, s0))
    return jax.jit(fn)


def solve_batch(
    mcp: PrimalDualMCP,
    thetas: Array,
    *,
    x0: Optional[Array] = None,
    y0: Optional[Array] = None,
    s0: Optional[Array] = None,
    options: Optional[SolverOptions] = None,
    **option_overrides,
) -> SolveResult:
    """Solve a batch of MCP instances in parallel on one device.

    Args:
      thetas: (B, p) parameter batch.
      x0/y0/s0: optional (B, n)/(B, m)/(B, m) warm starts.
    Returns a SolveResult whose leaves carry a leading batch axis.
    """
    if options is None:
        options = SolverOptions(**option_overrides)
    elif option_overrides:
        import dataclasses

        options = dataclasses.replace(options, **option_overrides)
    thetas = jnp.asarray(thetas)
    B = thetas.shape[0]
    n, m = mcp.unconstrained_dimension, mcp.constrained_dimension
    dtype = thetas.dtype
    if x0 is None:
        x0 = jnp.zeros((B, n), dtype)
    if y0 is None:
        y0 = jnp.ones((B, m), dtype)
    if s0 is None:
        s0 = jnp.ones((B, m), dtype)
    return _batched_solver(mcp, options)(thetas, x0, y0, s0)


def batch_statistics(result: SolveResult) -> dict:
    """Success rate + iteration stats over a batched SolveResult — the
    batched analog of the reference benchmark's summary statistics
    (benchmark/path.jl:101-126)."""
    solved = result.status == 0
    return {
        "num_instances": int(result.status.shape[0]),
        "success_rate": float(jnp.mean(solved.astype(jnp.float32))),
        "median_outer_iters": float(jnp.median(result.outer_iters)),
        "mean_outer_iters": float(jnp.mean(result.outer_iters.astype(jnp.float32))),
        "max_kkt_error_solved": float(
            jnp.max(jnp.where(solved, result.kkt_error, -jnp.inf))
        ),
    }
