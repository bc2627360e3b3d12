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


@functools.lru_cache(maxsize=None)
def _streamed_solver(
    mcp: PrimalDualMCP,
    options: SolverOptions,
    warm_chain: bool,
    warm_slacks: bool,
):
    """(K,B,p),(B,n),(B,m),(B,m) → SolveResult stacked (K,B,...), ONE dispatch."""
    vsolve = jax.vmap(lambda th, a, b, c: _solve(mcp, options, th, a, b, c))

    def run(theta_stack, x0, y0, s0):
        def step(carry, th):
            x, y, s = carry
            res = vsolve(th, x, y, s)
            if warm_chain:
                # Failed lanes keep their previous warm start — the
                # reference's receding-horizon rule (examples/utils.jl:232-234).
                ok = (res.status == 0)[:, None]
                x = jnp.where(ok, res.x, x)
                y = jnp.where(ok, res.y, y)
                s = jnp.where(ok, res.s, s) if warm_slacks else s
                return (x, y, s), res
            return carry, res

        _, out = jax.lax.scan(step, (x0, y0, s0), theta_stack)
        return out

    return jax.jit(run)


def solve_batches_streamed(
    mcp: PrimalDualMCP,
    theta_stack: Array,
    *,
    x0: Optional[Array] = None,
    y0: Optional[Array] = None,
    s0: Optional[Array] = None,
    options: Optional[SolverOptions] = None,
    warm_chain: bool = False,
    warm_slacks: bool = False,
    **option_overrides,
) -> SolveResult:
    """Solve K batches of MCP instances inside ONE compiled dispatch.

    The serving-path companion to `solve_batch`: on the single-chip headline
    shape each host→device dispatch costs ~14 ms through the tunnel — more
    than a quarter of the 52 ms batch solve time — so a pipeline that solves
    K θ-batches back-to-back in one `lax.scan` dispatch runs at the device
    rate (measured 6,683/s in-graph vs 4,942/s per-dispatch on the batch-256
    lane-change headline). No reference counterpart (the reference solves one
    instance per call on one CPU thread).

    Args:
      theta_stack: (K, B, p) — K parameter batches.
      x0/y0/s0: optional (B, n)/(B, m)/(B, m) initial warm starts.
      warm_chain: when True, step k warm-starts from step k-1's solution
        (x, y) — the receding-horizon sweep (examples/utils.jl:209-216)
        executed entirely on-device; failed lanes keep their previous warm
        start. When False, every batch solves independently from x0/y0/s0.
      warm_slacks: also chain s (needed for `algorithm="mehrotra"`, which
        stalls from an off-central s0 = 1).

    Returns a SolveResult whose leaves carry leading (K, B) axes.
    """
    if options is None:
        options = SolverOptions(**option_overrides)
    elif option_overrides:
        import dataclasses

        options = dataclasses.replace(options, **option_overrides)
    theta_stack = jnp.asarray(theta_stack)
    _, B, _ = theta_stack.shape
    n, m = mcp.unconstrained_dimension, mcp.constrained_dimension
    dtype = theta_stack.dtype
    if x0 is None:
        x0 = jnp.zeros((B, n), dtype)
    if y0 is None:
        y0 = jnp.ones((B, m), dtype)
    if s0 is None:
        s0 = jnp.ones((B, m), dtype)
    return _streamed_solver(mcp, options, bool(warm_chain), bool(warm_slacks))(
        theta_stack, x0, y0, s0
    )


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
