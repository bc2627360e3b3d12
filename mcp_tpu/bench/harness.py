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

import functools

from ..mcp import PrimalDualMCP
from ..parallel.batch import batch_statistics, solve_batch
from ..solver import SolverOptions
from ..diff import _solve
from .. import diff as _diff


def timing_consistency(host_t: float, ingraph_t: float, *, ratio: float = 2.0,
                       dispatch_slack_s: float = 0.03) -> bool:
    """One-SIDED host-vs-in-graph timing agreement.

    Host per-dispatch time may legitimately EXCEED the in-graph time by the
    tunnel dispatch overhead (~14-30 ms) — excused by `dispatch_slack_s` or
    the ratio. Host time BELOW the in-graph time beyond the ratio is the
    buffer-under-wait signature (scripts/diag_qp_timing.py: block_until_ready
    returning ~1600x early) and is never excused by the absolute slack — a
    symmetric window would let a real 15 ms step ship as an under-waited
    0.1 ms on any sub-20 ms workload (ADVICE r3)."""
    if not (host_t == host_t and ingraph_t == ingraph_t):  # NaN → unknown
        return True
    if host_t >= ingraph_t:
        return (
            host_t / max(ingraph_t, 1e-12) <= ratio
            or (host_t - ingraph_t) <= dispatch_slack_s
        )
    return ingraph_t / max(host_t, 1e-12) <= ratio


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
    # Compile the WARM-start program (different jit signature: x0/y0[/s0]
    # arguments) outside the clock too — otherwise its one-off compile lands
    # in times[0] and the sum-based rate reports compile, not solving
    # (measured: 184/s reported vs 6.4K/s steady-state on the TPU tunnel,
    # where a compile costs ~12 s). The probe re-solves step 1 with the
    # exact warm state the loop will use, so chain semantics are unchanged.
    if K > 1:
        warm0 = {"s0": result.s} if warm_slacks else {}
        solve_batch(
            mcp, theta_sweep[1], x0=result.x, y0=result.y, options=options, **warm0
        ).x.block_until_ready()
    iters = [batch_statistics(result)["median_outer_iters"]]
    # Warm-start carry with failed-lane protection: lanes whose solve failed
    # keep their previous warm start — the reference's receding-horizon rule
    # (examples/utils.jl:231-234), and what the in-graph warm_chain
    # cross-check below times (ADVICE r3: the two chains must agree).
    warm_x, warm_y, warm_s = result.x, result.y, result.s
    times = []
    for k in range(1, K):
        warm = {"s0": warm_s} if warm_slacks else {}
        t0 = time.perf_counter()
        result = solve_batch(
            mcp, theta_sweep[k], x0=warm_x, y0=warm_y, options=options, **warm
        )
        # Force the VALUE (CLAUDE.md timing rule): buffer-block can return
        # early on the tunnel backend; the scalar d2h round-trip is what a
        # real receding-horizon caller pays per step anyway.
        float(jnp.sum(result.x))
        times.append(time.perf_counter() - t0)
        ok = (result.status == 0)[:, None]
        warm_x = jnp.where(ok, result.x, warm_x)
        warm_y = jnp.where(ok, result.y, warm_y)
        if warm_slacks:
            warm_s = jnp.where(ok, result.s, warm_s)
        iters.append(batch_statistics(result)["median_outer_iters"])
    # Scalar-forced in-graph timing of the same warm chain: one lax.scan
    # dispatch over steps 1..K-1 (solve_batches_streamed warm_chain) whose
    # VALUE is forced to the host. On the axon tunnel, block_until_ready on
    # a device BUFFER can return ~1000x before the computation finishes
    # (measured on the QP suite: 0.76 ms buffer-block vs 1248 ms
    # value-force for the same batch), so per-step host times above are a
    # lower bound, not a measurement. The in-graph chain amortizes the one
    # forced d2h round-trip over all steps; it is the honest steady-state
    # warm re-solve time and ships as warm_solves_per_sec.
    ingraph_step_t = float("nan")
    if K > 1:
        from .. import parallel as _parallel

        cold = solve_batch(mcp, theta_sweep[0], options=cold_options or options)
        streamed = _parallel.solve_batches_streamed(
            mcp,
            theta_sweep[1:],
            x0=cold.x,
            y0=cold.y,
            s0=cold.s if warm_slacks else None,
            options=options,
            warm_chain=True,
            warm_slacks=warm_slacks,
        )
        float(jnp.sum(streamed.x))  # compile + warm outside the clock
        t0 = time.perf_counter()
        streamed = _parallel.solve_batches_streamed(
            mcp,
            theta_sweep[1:],
            x0=cold.x,
            y0=cold.y,
            s0=cold.s if warm_slacks else None,
            options=options,
            warm_chain=True,
            warm_slacks=warm_slacks,
        )
        float(jnp.sum(streamed.x))  # force the VALUE, not buffer metadata
        ingraph_step_t = (time.perf_counter() - t0) / (K - 1)
    # Honest convergence reporting for the warm suite too (VERDICT r2 #7):
    # recomputed final-step ‖F‖∞ over the final batch, solved-only extremes.
    true_kkt = np.asarray(true_kkt_errors(mcp, result, theta_sweep[-1]))
    solved = np.asarray(result.status) == 0
    solved_kkt = true_kkt[solved] if solved.any() else np.asarray([np.nan])
    # Same policy as benchmark_batched: the host per-dispatch median is the
    # primary (it is what a per-step caller pays); the scalar-forced
    # in-graph chain is the cross-check that cannot under-wait. On
    # disagreement the conservative (larger) time ships — which also covers
    # a buffer-under-waiting host loop, since the under-waited time is the
    # SMALLER one. (Measured TPU warm sweep: host 36 ms/step incl. ~14 ms
    # tunnel dispatch vs in-graph 15.9 ms — the device rate is reported
    # separately via ingraph_step_time_s.)
    host_step_t = float(np.median(times)) if times else float("nan")
    both = host_step_t == host_step_t and ingraph_step_t == ingraph_step_t
    # One-sided window (see timing_consistency): dispatch overhead only
    # excuses host > in-graph; an under-waited (smaller) host time beyond
    # the ratio always flags and the larger time ships.
    consistent = timing_consistency(host_step_t, ingraph_step_t, ratio=2.5)
    if both:
        # Host below in-graph has no legitimate cause (ADVICE r4): the
        # larger time ships whenever host < in-graph, not only past ratio.
        step_t = (
            host_step_t
            if consistent and host_step_t >= ingraph_step_t
            else max(host_step_t, ingraph_step_t)
        )
    else:
        step_t = host_step_t if host_step_t == host_step_t else ingraph_step_t
    return {
        "sweep_steps": K,
        "batch_size": B,
        "warm_solves_per_sec": B / step_t if step_t == step_t else float("nan"),
        "median_step_time_s": host_step_t,
        "ingraph_step_time_s": ingraph_step_t,
        "timing_consistent": bool(consistent),
        "step_times_s": [float(t) for t in times],
        "median_outer_iters_per_step": iters,
        "final_success_rate": batch_statistics(result)["success_rate"],
        "true_kkt_max": float(np.max(solved_kkt)),
        "true_kkt_median": float(np.median(solved_kkt)),
        "frac_true_kkt_at_tol": float(np.mean(true_kkt <= options.tol)),
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


@functools.lru_cache(maxsize=None)
def _ingraph_repeat_solver(mcp: PrimalDualMCP, options: SolverOptions, repeats: int):
    """One jitted dispatch that solves `repeats` DIFFERENT θ batches
    sequentially inside a lax.fori_loop and reduces each solution into a
    scalar (so no solve can be dead-code-eliminated). Host-times device
    compute with the per-dispatch overhead amortized over all repeats —
    immune to any execution-level dispatch caching by construction (every
    iteration consumes different data inside one executable)."""

    def run(theta_stack, x0, y0, s0):  # (R, B, p), (B, n), (B, m), (B, m)
        vsolve = jax.vmap(
            lambda th, a, b, c: _solve(mcp, options, th, a, b, c)
        )

        def body(i, acc):
            res = vsolve(theta_stack[i], x0, y0, s0)
            return (
                acc
                + jnp.sum(res.x).astype(jnp.float32)
                + jnp.sum(res.outer_iters).astype(jnp.float32)
            )

        return jax.lax.fori_loop(0, repeats, body, jnp.float32(0.0))

    return jax.jit(run)


def benchmark_batched(
    mcp: PrimalDualMCP,
    thetas,
    *,
    repeats: int = 5,
    options: Optional[SolverOptions] = None,
    theta_sampler=None,
    ingraph_check: bool = True,
    **option_overrides,
) -> dict:
    """Whole-batch vmapped solve, timed over `repeats` runs after a compile
    warm-up. Reports solves/s + per-instance convergence statistics,
    including the recomputed (non-stale) final KKT errors and the fraction
    of instances truly at ‖F‖∞ ≤ tol (see `true_kkt_errors`).

    Timing is hardened against backend execution caching (round-2 BENCH
    artifact: repeats of byte-identical inputs collapsed to an ~85x-fast
    round-trip on the experimental axon backend, and `min` picked it):
      * every repeat solves a FRESH θ batch — `theta_sampler(i) -> (B, p)`
        when given, else a deterministic small perturbation of `thetas`;
      * the headline time is the MEDIAN over repeats, not the min;
      * when `ingraph_check`, the same solve also runs `repeats` times
        inside ONE compiled fori_loop dispatch (`_ingraph_repeat_solver`)
        and the two per-batch times must agree within 2x, else a warning
        prints and `timing_consistent: false` is reported. The in-graph
        number amortizes the per-dispatch tunnel overhead, so it is the
        defensible device-throughput figure; the host median includes
        real dispatch latency an end user would also pay.
    """
    if options is None:
        options = SolverOptions(**option_overrides)
    thetas = jnp.asarray(thetas)
    B = thetas.shape[0]

    def batch_for(i: int):
        if theta_sampler is not None:
            return jnp.asarray(theta_sampler(i), thetas.dtype)
        # Fallback: deterministic per-repeat perturbation — small enough to
        # keep the problem distribution, non-zero so no two dispatches see
        # identical bytes.
        key = jax.random.PRNGKey(1000 + i)
        return thetas + 1e-3 * jax.random.normal(key, thetas.shape, thetas.dtype)

    # Warm-up/compile.
    result = solve_batch(mcp, thetas, options=options)
    result.x.block_until_ready()
    times = []
    for r in range(repeats):
        th = batch_for(r)
        # θ generation AND its h2d upload stay outside the clock — force
        # the VALUE (buffer-block under-waits on the tunnel backend and the
        # upload then lands inside the timed dispatch; measured as most of
        # the round-5 "dispatch slack").
        float(jnp.sum(th))
        t0 = time.perf_counter()
        result = solve_batch(mcp, th, options=options)
        # Force a VALUE, not buffer metadata: on the axon tunnel backend
        # block_until_ready on a device buffer can return ~1600x before the
        # computation finishes (scripts/diag_qp_timing.py). One d2h scalar
        # round-trip is part of what any real caller pays per dispatch.
        float(jnp.sum(result.x))
        times.append(time.perf_counter() - t0)
        last_thetas = th
    median_t = float(np.median(times))

    stats = batch_statistics(result)
    true_kkt = np.asarray(true_kkt_errors(mcp, result, last_thetas))
    # True-KKT stats over SOLVED instances (failed ones return their last
    # iterate, whose residual is meaningless for convergence reporting —
    # the success_rate already accounts for them; with zero solved the
    # extremes are NaN, not garbage residuals of failed runs).
    # frac_true_kkt_at_tol stays over ALL instances: it is the honest
    # end-to-end success rate.
    solved = np.asarray(result.status) == 0
    solved_kkt = true_kkt[solved] if solved.any() else np.asarray([np.nan])
    stats.update(
        {
            "batch_size": B,
            "best_batch_time_s": float(min(times)),
            "median_batch_time_s": median_t,
            "mean_batch_time_s": float(np.mean(times)),
            "solves_per_sec": B / median_t,
            "true_kkt_max": float(np.max(solved_kkt)),
            "true_kkt_median": float(np.median(solved_kkt)),
            "frac_true_kkt_at_tol": float(np.mean(true_kkt <= options.tol)),
        }
    )

    if ingraph_check:
        apply_ingraph_crosscheck(
            mcp, stats, batch_for, options=options, repeats=min(repeats, 3)
        )
    return stats


def apply_ingraph_crosscheck(
    mcp: PrimalDualMCP,
    stats: dict,
    batch_for,
    *,
    options: SolverOptions,
    repeats: int = 3,
) -> dict:
    """Run the in-graph fori-loop timing cross-check and fold the result into
    `stats` (as produced by `benchmark_batched(..., ingraph_check=False)`).

    Split out so callers (bench.py) can emit the certified host-timed result
    FIRST and run this second — a capture-window timeout then still leaves a
    parseable certified number in the output tail (VERDICT r3 item 1)."""
    B = stats["batch_size"]
    median_t = stats["median_batch_time_s"]
    stack = jnp.stack([jnp.asarray(batch_for(1000 + r)) for r in range(repeats)])
    n, m = mcp.unconstrained_dimension, mcp.constrained_dimension
    x0 = jnp.zeros((B, n), stack.dtype)
    y0 = jnp.ones((B, m), stack.dtype)
    s0 = jnp.ones((B, m), stack.dtype)
    fn = _ingraph_repeat_solver(mcp, options, repeats)
    # Force the VALUE, not the buffer: block_until_ready on this backend can
    # return early (CLAUDE.md timing rule; measured 0.1 ms/batch "timings"
    # from exactly this call in the round-5 driver capture).
    float(fn(stack, x0, y0, s0))  # compile
    t0 = time.perf_counter()
    float(fn(stack, x0, y0, s0))
    ingraph_t = (time.perf_counter() - t0) / repeats
    # One-sided window (see timing_consistency): dispatch overhead only
    # excuses host > in-graph; an under-waited host time always flags.
    consistent = timing_consistency(median_t, ingraph_t)
    if not consistent:
        import warnings

        ratio = max(median_t, ingraph_t) / max(min(median_t, ingraph_t), 1e-12)
        warnings.warn(
            f"benchmark timing cross-check FAILED: host median "
            f"{median_t:.4f} s/batch vs in-graph {ingraph_t:.4f} s/batch "
            f"({ratio:.1f}x apart) — one of them is a measurement "
            "artifact; trust the larger.",
            stacklevel=2,
        )
    stats.update(
        {
            "ingraph_batch_time_s": ingraph_t,
            "ingraph_solves_per_sec": B / ingraph_t,
            "timing_consistent": bool(consistent),
        }
    )
    if not consistent or median_t < ingraph_t:
        # Conservative headline: never let a caching artifact inflate the
        # reported rate. A host time BELOW the in-graph time has no
        # legitimate cause even within the 2x window (partial buffer
        # under-wait, ADVICE r4) — the larger time ships whenever
        # host < in-graph, not only past the ratio.
        stats["solves_per_sec"] = B / max(median_t, ingraph_t)
    return stats
