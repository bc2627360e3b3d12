"""Benchmark harness: success rate, μ±σ runtimes, and batched throughput.

Shape-parity with the reference's harness (benchmark/path.jl:2-126): generate
one problem + num_samples random θ, warm both solve paths up, time each
solve, report success rate and mean/std of successful runtimes. The PATH
solver is closed-source and absent here (SURVEY.md §2.3); the comparison
axes are instead (a) sequential single solves — the reference's execution
model — vs (b) the TPU-native batched/vmapped path, plus solves/s and median
IP iteration counts (BASELINE.json metrics).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..mcp import PrimalDualMCP
from ..parallel.batch import batch_statistics, solve_batch
from ..solver import SolverOptions
from .. import diff as _diff


def summary_statistics(elapsed: np.ndarray, success: np.ndarray) -> dict:
    """Success rate + mean/std of *successful* runtimes
    (benchmark/path.jl:101-126)."""
    ok = success.astype(bool)
    succeeded = elapsed[ok]
    return {
        "num_samples": int(len(elapsed)),
        "success_rate": float(ok.mean()) if len(elapsed) else 0.0,
        "mean_time_s": float(succeeded.mean()) if len(succeeded) else float("nan"),
        "std_time_s": float(succeeded.std()) if len(succeeded) else float("nan"),
    }


def benchmark_sequential(
    mcp: PrimalDualMCP,
    thetas,
    *,
    options: Optional[SolverOptions] = None,
    **option_overrides,
) -> dict:
    """One-at-a-time jitted solves, timed per instance — the reference's
    execution model (benchmark/path.jl:78-87)."""
    if options is None:
        options = SolverOptions(**option_overrides)
    thetas = jnp.asarray(thetas)
    # Warm up (compile) on the first sample (path.jl:66-75).
    _diff.solve(mcp, thetas[0], options=options).x.block_until_ready()
    elapsed, success = [], []
    for i in range(thetas.shape[0]):
        t0 = time.perf_counter()
        sol = _diff.solve(mcp, thetas[i], options=options)
        sol.x.block_until_ready()
        elapsed.append(time.perf_counter() - t0)
        success.append(int(sol.status) == 0)
    stats = summary_statistics(np.asarray(elapsed), np.asarray(success))
    stats["solves_per_sec"] = (
        stats["num_samples"] / float(np.sum(elapsed)) if elapsed else float("nan")
    )
    return stats


def relative_runtime(stats_a: dict, stats_b: dict) -> str:
    """"A runtime is X% that of B" — the reference's headline comparison line
    (benchmark/path.jl:108), applied to any two stats dicts with
    mean_time_s or per-solve timing."""
    a = stats_a.get("mean_time_s") or 1.0 / stats_a["solves_per_sec"]
    b = stats_b.get("mean_time_s") or 1.0 / stats_b["solves_per_sec"]
    return f"first runtime is {100.0 * a / b:.1f}% that of second"


def benchmark_warm_sweep(
    mcp: PrimalDualMCP,
    theta_sweep,
    *,
    options: Optional[SolverOptions] = None,
    warm_slacks: bool = False,
    cold_options: Optional[SolverOptions] = None,
    **option_overrides,
) -> dict:
    """Warm-started re-solves across a θ sweep (the reference's receding-
    horizon/benchmark pattern, BASELINE.json config 2): step k's batch
    warm-starts from step k-1's solution (x, y), as in
    examples/utils.jl:209-216 — plus s when ``warm_slacks`` (needed for the
    Mehrotra algorithm, which stalls from an off-central s₀ = 1).
    ``cold_options`` overrides the algorithm for the cold first solve
    (e.g. annealed-IP cold start + Mehrotra re-solves).
    theta_sweep: (K, B, p)."""
    if options is None:
        options = SolverOptions(**option_overrides)
    theta_sweep = jnp.asarray(theta_sweep)
    K, B, _ = theta_sweep.shape
    # Compile + cold-start on the first step.
    result = solve_batch(mcp, theta_sweep[0], options=cold_options or options)
    result.x.block_until_ready()
    iters = [batch_statistics(result)["median_outer_iters"]]
    times = []
    for k in range(1, K):
        warm = {"s0": result.s} if warm_slacks else {}
        t0 = time.perf_counter()
        result = solve_batch(
            mcp, theta_sweep[k], x0=result.x, y0=result.y, options=options, **warm
        )
        result.x.block_until_ready()
        times.append(time.perf_counter() - t0)
        iters.append(batch_statistics(result)["median_outer_iters"])
    return {
        "sweep_steps": K,
        "batch_size": B,
        "warm_solves_per_sec": (K - 1) * B / sum(times) if times else float("nan"),
        "median_outer_iters_per_step": iters,
        "final_success_rate": batch_statistics(result)["success_rate"],
    }


def true_kkt_errors(mcp: PrimalDualMCP, result, thetas) -> jnp.ndarray:
    """Recomputed ‖F‖∞ at the FINAL iterates, per instance.

    The solver's own `kkt_error` is the reference's stale pre-step metric
    (src/solver.jl:107) and its exit can be triggered by ϵ ≤ tol rather than
    kkt ≤ tol (src/solver.jl:67-119) — so for honest benchmark reporting the
    residual is re-evaluated at the returned point. Evaluated at highest
    matmul precision: on TPU the bf16 default would put ~1e-2 of pure
    measurement noise into a residual METRIC (measured: 0.077 median on
    residuals the solver certifies at 1e-5)."""

    def kkt(x, y, s, theta):
        g, h = mcp.gh(x, y, theta)
        return jnp.maximum(
            jnp.max(jnp.abs(g), initial=0.0),
            jnp.maximum(
                jnp.max(jnp.abs(h - s), initial=0.0),
                jnp.max(jnp.abs(s * y), initial=0.0),
            ),
        )

    with jax.default_matmul_precision("highest"):
        return jax.jit(jax.vmap(kkt))(result.x, result.y, result.s, jnp.asarray(thetas))


def benchmark_batched(
    mcp: PrimalDualMCP,
    thetas,
    *,
    repeats: int = 3,
    options: Optional[SolverOptions] = None,
    **option_overrides,
) -> dict:
    """Whole-batch vmapped solve, timed over `repeats` runs after a compile
    warm-up. Reports solves/s + per-instance convergence statistics,
    including the recomputed (non-stale) final KKT errors and the fraction
    of instances truly at ‖F‖∞ ≤ tol (see `true_kkt_errors`)."""
    if options is None:
        options = SolverOptions(**option_overrides)
    thetas = jnp.asarray(thetas)
    B = thetas.shape[0]
    # Warm-up/compile.
    result = solve_batch(mcp, thetas, options=options)
    result.x.block_until_ready()
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        result = solve_batch(mcp, thetas, options=options)
        result.x.block_until_ready()
        times.append(time.perf_counter() - t0)
    best = min(times)
    stats = batch_statistics(result)
    true_kkt = np.asarray(true_kkt_errors(mcp, result, thetas))
    # True-KKT stats over SOLVED instances (failed ones return their last
    # iterate, whose residual is meaningless for convergence reporting —
    # the success_rate already accounts for them). frac_true_kkt_at_tol
    # stays over ALL instances: it is the honest end-to-end success rate.
    solved = np.asarray(result.status) == 0
    solved_kkt = true_kkt[solved] if solved.any() else true_kkt
    stats.update(
        {
            "batch_size": B,
            "best_batch_time_s": best,
            "mean_batch_time_s": float(np.mean(times)),
            "solves_per_sec": B / best,
            "true_kkt_max": float(solved_kkt.max()),
            "true_kkt_median": float(np.median(solved_kkt)),
            "frac_true_kkt_at_tol": float(np.mean(true_kkt <= options.tol)),
        }
    )
    return stats
