"""Interior-point MCP solver as a single fixed-shape ``lax.while_loop``.

Algorithm parity target: the reference's Nocedal & Wright ch. 19-style solver
(reference src/solver.jl:35-138) —

  outer loop (≤ max_outer_iters): anneal ϵ from 1.0
    inner Newton loop (≤ max_inner_iters): while ‖F‖∞ > ϵ
      δz ← (∇F + tol·I)⁻¹ (-F)              (src/solver.jl:79-83)
      α_s ← frac-to-boundary on (s, δs); α_y on (y, δy)   (:93-94, :127-138)
      x += α_s δx;  s += α_s δs;  y += α_y δy             (:103-105)
      kkt_error ← ‖F‖∞ (at the *pre-step* point, as in the reference :107)
    ϵ *= (1 - exp(-tightening·inner))  on success          (:111-113)
    ϵ *= (1 + exp(-loosening·inner))   on failure
  status := failed if outer_iters hits max_outer_iters     (:117-119)

TPU-first deltas (SURVEY.md §7.1.2):
  * Both loops are ``lax.while_loop``s with a fixed-shape carry, so the whole
    solve jit-compiles once per (MCP, options) pair and ``vmap``s over θ.
  * The backtracking linesearch is an exact replica of the reference's
    halving loop (power-of-two step sizes, NaN on failure below min_stepsize),
    implemented as a bounded while_loop — its O(m) iterations are negligible
    next to the O((n+m)³) Newton solve.
  * The Newton system is solved by a structure-exploiting condensed
    elimination by default (see linalg.py), algebraically identical to the
    reference's full regularized system.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from .linalg import NEWTON_STEPS
from .mcp import PrimalDualMCP
from .types import FAILED, SOLVED, SolveResult

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class SolverOptions:
    """Solver options; field names and defaults mirror the reference kwargs
    (src/solver.jl:42-50; min_stepsize changed to 1e-4 by the fork at :48)."""

    tol: float = 1e-4
    max_inner_iters: int = 20
    max_outer_iters: int = 50
    tightening_rate: float = 0.1
    loosening_rate: float = 0.5
    min_stepsize: float = 1e-4
    tau: float = 0.995  # fraction-to-boundary parameter (src/solver.jl:127)
    decay: float = 0.5  # linesearch halving factor (src/solver.jl:127)
    # Pluggable linear solver, the counterpart of the reference's
    # `linear_solve_algorithm` kwarg (src/solver.jl:33,50).
    linear_solver: str = "condensed"
    # IFT sensitivity linear solve: "lu" (regular solve) or "lstsq"
    # (rank-revealing, the analog of the reference's pivoted QR,
    # src/AutoDiff.jl:39).
    sensitivity_solver: str = "lu"
    # TPU matmul precision for the Newton iteration. TPUs default f32
    # matmuls to bfloat16 passes, which corrupts Newton steps enough to
    # ~4x the outer-iteration count; "highest" restores full f32 and the
    # CPU-equivalent 7-9 outer iterations. "high" (3-pass) is a middle tier
    # worth benchmarking.
    matmul_precision: str = "highest"
    # Debug printing of step failures from inside the compiled loop
    # (the reference's `verbose` kwarg, src/solver.jl:49,85,97).
    verbose: bool = False
    # IP algorithm: "ip" is the reference's ϵ-annealed double loop
    # (src/solver.jl:67-119, the conformance default); "mehrotra" is an
    # opt-in predictor-corrector (Nocedal & Wright ch. 14.2 / Mehrotra '92)
    # with no reference counterpart — typically 2-3x fewer Jacobian
    # evaluations per solve on monotone problems and warm-started re-solves.
    # Both share the linear-solver tiers.
    algorithm: str = "ip"
    # Mehrotra-only knobs. centering_floor keeps the complementarity target
    # ≥ floor·‖(rG, rH)‖∞ so μ cannot collapse ahead of feasibility (the
    # classic infeasible-PC stall: boundary-pinned duals block the feasibility
    # steps). refinement_steps adds that many iterative-refinement back-solves
    # per Newton solve against the TRUE (unregularized) Jacobian, cancelling
    # the tol·I bias that otherwise floors the achievable KKT error at
    # ~tol·‖δ‖ (the factorization is reused, so a refinement costs one
    # back-substitution + three matvecs).
    centering_floor: float = 0.01
    refinement_steps: int = 1
    # GMRES tier knobs (linear_solver="gmres") — the reference accepts any
    # LinearSolve.jl algorithm with its own options (src/solver.jl:33,50);
    # these are the iterative tier's equivalents. preconditioner: "none"
    # (default) or "jacobi" — measured on the QP bench the diagonal
    # preconditioner HURTS (26 vs 9 median outer iterations: the Schur
    # diagonal varies over ~4 orders near the boundary and scaling by it
    # distorts the restart-limited Krylov space), so it is opt-in.
    gmres_tol: float = 1e-8
    gmres_restart: int = 50
    gmres_maxiter: int = 5
    gmres_preconditioner: str = "none"
    # Fused Pallas linesearch+update kernel (kernels/linesearch_pallas.py):
    # one pallas_call replaces the per-iteration glue (pair
    # fraction-to-the-boundary search, failure detection, iterate update,
    # ‖F‖∞) — ~1 ms of pure dispatch latency at headline shapes. None =
    # enabled exactly for the Pallas tridiag tiers (where the rest of the
    # iteration is already kernel-fused); True/False force it. Disabled
    # under `verbose` (the debug print needs the split lin/ls flags).
    fused_linesearch: Optional[bool] = None
    # Newton-system regularization override. None = the reference's tol·I
    # (src/solver.jl:81). The hybrid algorithm's warm-up phase sets the
    # EXIT tolerance loose (hybrid_switch_tol) while keeping the final
    # tolerance's regularization, so the two roles of `tol` can split.
    regularization: Optional[float] = None
    # Hybrid algorithm (algorithm="hybrid"): ϵ-annealed IP warm-up until
    # ϵ ≤ hybrid_switch_tol (globalization — the annealing homotopy is what
    # makes cold-started nonmonotone games converge), then Mehrotra
    # predictor-corrector to tolerance (~2-3 iterations where the annealed
    # loop spends ~10+). No reference counterpart; targets the N=4
    # small-batch plateau where iteration count, not factorization layout,
    # bounds throughput (VERDICT r3 item 4).
    hybrid_switch_tol: float = 1e-2
    # Opt-in terminal polish (no reference counterpart): the reference's
    # annealed loop can exit with status :solved on ϵ ≤ tol while the TRUE
    # residual ‖(g, h−s, s∘y)‖∞ is still above tol (src/solver.jl:67-119 —
    # measured: the 100-dim QP bench at tol 1e-6 lands at ~4e-6..1e-4 true
    # KKT even in f64). With polish=True, up to max_inner_iters extra Newton
    # steps run at fixed ϵ = tol/2, exiting when the true residual is ≤ tol;
    # kkt_error then reports the true final residual and status demands it.
    polish: bool = False
    # In-graph loosened retries for failed lanes (VERDICT r4 item 4): after
    # the primary solve, each retry round re-solves FAILED lanes from the
    # reference cold start (x=0, y=s=1) under the robust reference annealing
    # schedule (algorithm="ip", tightening_rate=retry_tightening_rate) —
    # the in-graph analog of the reference's failure loosening
    # (src/solver.jl:111-113). The retry loops are GATED per lane: in a
    # vmapped batch their while-conditions are False for already-solved
    # lanes, so when every lane succeeded the retry costs one residual
    # evaluation, not a second solve. Solved-lane results are untouched.
    retry: int = 0
    retry_tightening_rate: float = 0.1
    # Optional safer linear-solver tier for the retry rounds (None = keep
    # the primary tier). Lets a fast-but-specialized primary tier (e.g. the
    # no-pivot GJ dense kernel) fall back to the unconditionally-stable QR
    # tier on the rare ill-conditioned lanes it cannot certify.
    retry_linear_solver: Optional[str] = None
    # Outer-iteration budget for the retry rounds (None = inherit
    # max_outer_iters). In a vmapped batch a hard lane drags its WHOLE
    # batch's while_loop to the iteration cap (SPMD: wall-clock = slowest
    # lane), so serving protocols cap the primary solve near the solving
    # population's p99.9 and give the gated retry its own budget — bounding
    # worst-case batch latency at primary_cap + retry_cap instead of 2x the
    # monolithic cap (VERDICT r4 items 2/4: hard lanes stalled the streamed
    # scan steps).
    retry_max_outer_iters: Optional[int] = None
    # Polish exit margin: polish drives the (f32-measured) true residual to
    # margin*tol rather than tol, so an independently-rounded external
    # recompute does not flip boundary-riding lanes (round-5 QP capture:
    # frac 0.9961 from one lane at 1.01e-5 vs tol 1e-5). Protocols whose
    # tol sits AT the f32 evaluation-noise floor (QP: ~6e-6 at data scale
    # ~10-100) want a stronger margin (bench.py uses 0.5 for the QP suite).
    polish_margin: float = 0.85


def auto_tightening_rate(mcp) -> float:
    """Shape-keyed ϵ-annealing (tightening) rate — one config that certifies
    every flagship shape with no per-shape flag (VERDICT r3 item 6), keyed
    on the time-block size like the kernel dispatcher. Measured sweeps
    (benchmarks_round3.json): small-block trajectory games anneal fastest at
    0.02 (headline b=20: 865 → 1174 solves/s at success 1.0; N=4 b=40
    likewise), while large-block games need the gentler 0.05 (N=10 b=100 at
    0.02 drops success to 0.75 — schedules are shape-dependent). Problems
    without time structure keep the reference default 0.1
    (src/solver.jl:44)."""
    st = getattr(mcp, "time_structure", None)
    if st is None:
        return 0.1
    return 0.05 if st.block_size >= 64 else 0.02


def linesearch_candidates(decay: float, min_stepsize: float) -> tuple[float, ...]:
    """The reference's backtracking grid, as a static tuple: decay^k for
    k = 0..K where decay^K is the first value below min_stepsize. That last
    candidate is still tested — the reference's `α < tol` check runs *after*
    the violation test (src/solver.jl:131-136). Single source of truth for
    both the unfused linesearch below and the fused Pallas kernel
    (kernels/linesearch_pallas.py) so the two paths cannot diverge."""
    import math

    K = max(0, math.ceil(math.log(min_stepsize) / math.log(decay)))
    while decay**K >= min_stepsize:  # guard rounding at the boundary
        K += 1
    return tuple(decay**k for k in range(K + 1))


def fraction_to_the_boundary_linesearch(
    v: Array, dv: Array, *, tau: float, decay: float, min_stepsize: float
) -> Array:
    """α = the first power of `decay` in {1, decay, decay², …} satisfying
    v + α·δ ≥ (1-τ)·v for all components, or NaN if none down to
    min_stepsize does — exactly the reference's backtracking loop
    (src/solver.jl:127-138), evaluated loop-free.

    The candidate set is static (see linesearch_candidates). Feasibility of
    all candidates is one broadcasted (K+1, m) check and the answer is the
    first feasible k — no data-dependent while_loop in the hot path (a
    serial ~14-iteration loop per Newton step costs real wall-clock on TPU).
    """
    candidates = jnp.asarray(
        linesearch_candidates(decay, min_stepsize), dtype=v.dtype
    )  # (K+1,)
    # feasible[k] ⟺ all_i( candidates[k]·δ_i ≥ -τ·v_i )
    lhs = candidates[:, None] * dv[None, :]
    feasible = jnp.all(lhs >= -tau * v[None, :], axis=1)
    first = jnp.argmax(feasible)  # index of first True (0 if none)
    any_feasible = jnp.any(feasible)
    return jnp.where(any_feasible, candidates[first], jnp.nan)


def fraction_to_the_boundary_linesearch_pair(
    v: Array, dv: Array, *, tau: float, decay: float, min_stepsize: float
) -> Array:
    """Vectorized `fraction_to_the_boundary_linesearch` over a leading pair
    axis: v, dv (2, m) → alphas (2,). One fused feasibility check instead of
    two dispatch chains — the two per-iteration searches (α_s over s, α_y
    over y) are ~25% of the lane-change iteration's wall-clock and entirely
    latency-bound. Float semantics are identical: vmap batches the very
    same candidate·δ ≥ -τ·v test, boolean all-reduce, and first-feasible
    argmax into one dispatch chain."""
    return jax.vmap(
        functools.partial(
            fraction_to_the_boundary_linesearch,
            tau=tau,
            decay=decay,
            min_stepsize=min_stepsize,
        )
    )(v, dv)


def ip_solve(
    mcp: PrimalDualMCP,
    options: SolverOptions,
    theta: Array,
    x0: Array,
    y0: Array,
    s0: Array,
    tridiag_solver=None,
    newton_solver=None,
) -> SolveResult:
    """One interior-point solve. Pure, shape-static, vmap-able over
    (theta, x0, y0, s0). Not differentiable — use diff.solve for that.
    ``tridiag_solver`` optionally overrides the block-tridiagonal backend
    with a callable (e.g. the horizon-sharded SPIKE solve);
    ``newton_solver`` overrides the whole non-tridiag Newton step with a
    callable of the NEWTON_STEPS signature
    (Gx, Gy, Hx, Hy, y, s, rG, rH, rC, reg) -> (dx, dy, ds) — e.g. the
    tensor-parallel sharded factorization (parallel/tensor.py)."""
    if options.linear_solver.startswith("schur_pallas_gj") and not mcp.affine:
        # No-pivot Gauss-Jordan is only backward-stable on (near-)SPD
        # schur systems — the affine convex-QP path. On game
        # (nonsymmetric/saddle) systems it can silently produce unstable
        # Newton steps; surface that instead of failing quietly
        # (ADVICE r4). polish=True at least certifies the final residual.
        import warnings

        warnings.warn(
            f"linear_solver={options.linear_solver!r} (no-pivot Gauss-"
            "Jordan) selected for a non-affine MCP: only valid when the "
            "schur matrix is SPD (convex QPs). Game systems should use "
            "the QR tiers ('schur_pallas'); enable polish=True to at "
            "least certify the terminal residual.",
            stacklevel=2,
        )
    with jax.default_matmul_precision(options.matmul_precision):
        if options.algorithm == "mehrotra":
            if newton_solver is not None:
                raise NotImplementedError(
                    "newton_solver override currently supports algorithm='ip'"
                )
            res = _mehrotra_solve_body(
                mcp, options, theta, x0, y0, s0, tridiag_solver=tridiag_solver
            )
        elif options.algorithm == "hybrid":
            if newton_solver is not None:
                raise NotImplementedError(
                    "newton_solver override currently supports algorithm='ip'"
                )
            # Phase 1: annealed warm-up to ϵ ≤ hybrid_switch_tol with the
            # FINAL tolerance's Newton regularization (loose exit, tight
            # linear algebra); no polish — phase 2 finishes the job.
            warm_options = dataclasses.replace(
                options,
                algorithm="ip",
                tol=options.hybrid_switch_tol,
                regularization=(
                    options.regularization
                    if options.regularization is not None
                    else options.tol
                ),
                polish=False,
            )
            r1 = _ip_solve_body(
                mcp, warm_options, theta, x0, y0, s0,
                tridiag_solver=tridiag_solver,
            )
            # Phase 2: Mehrotra PC from the interior warm point (slacks and
            # duals carried — PC needs a centered-ish start, which the
            # annealed phase provides by construction).
            r2 = _mehrotra_solve_body(
                mcp, options, theta, r1.x, r1.y, r1.s,
                tridiag_solver=tridiag_solver,
            )
            res = r2._replace(outer_iters=r1.outer_iters + r2.outer_iters)
        elif options.algorithm == "ip":
            res = _ip_solve_body(
                mcp,
                options,
                theta,
                x0,
                y0,
                s0,
                tridiag_solver=tridiag_solver,
                newton_solver=newton_solver,
            )
        else:
            raise ValueError(f"unknown algorithm {options.algorithm!r}")

        for _ in range(int(options.retry)):
            res = _retry_failed(
                mcp, options, theta, res,
                tridiag_solver=tridiag_solver, newton_solver=newton_solver,
            )
        return res


def _retry_failed(
    mcp, options, theta, res, *, tridiag_solver=None, newton_solver=None
):
    """One gated loosened-retry round (see SolverOptions.retry): failed
    lanes re-solve from the reference cold start (src/solver.jl:38-41)
    under the reference annealing schedule; solved lanes' while-loops are
    gated off (their conditions are False at entry, so in a vmapped batch
    the retry's marginal cost is ~one residual evaluation when every lane
    already succeeded)."""
    need = res.status != SOLVED
    retry_options = dataclasses.replace(
        options,
        algorithm="ip",
        tightening_rate=options.retry_tightening_rate,
        linear_solver=options.retry_linear_solver or options.linear_solver,
        retry=0,
        max_outer_iters=(
            options.retry_max_outer_iters
            if options.retry_max_outer_iters is not None
            else options.max_outer_iters
        ),
    )
    x0 = jnp.zeros_like(res.x)
    y0 = jnp.ones_like(res.y)
    s0 = jnp.ones_like(res.s)
    r2 = _ip_solve_body(
        mcp, retry_options, theta, x0, y0, s0,
        tridiag_solver=tridiag_solver, newton_solver=newton_solver,
        gate=need,
    )
    take = need & (r2.status == SOLVED)
    pick = lambda a, b: jnp.where(take, a, b)
    return SolveResult(
        x=pick(r2.x, res.x),
        y=pick(r2.y, res.y),
        s=pick(r2.s, res.s),
        kkt_error=pick(r2.kkt_error, res.kkt_error),
        epsilon=pick(r2.epsilon, res.epsilon),
        # Honest accounting: lanes that entered the retry pay its
        # iterations whether or not it rescued them.
        outer_iters=res.outer_iters
        + jnp.where(need, r2.outer_iters, jnp.zeros_like(r2.outer_iters)),
        status=jnp.where(take, jnp.int32(SOLVED), res.status),
    )


def _tridiag_algorithm(options, tridiag_solver):
    """The block-tridiagonal backend: an override callable
    (diag, lower, upper, rhs) -> x (e.g. the horizon-sharded SPIKE solve,
    parallel/horizon.py) wins over the options string."""
    if tridiag_solver is not None:
        return tridiag_solver
    if options.linear_solver == "tridiag_pallas":
        from .kernels.thomas_pallas import thomas_solve

        return thomas_solve
    if options.linear_solver == "tridiag_pallas_cr":
        from .kernels.thomas_pallas import cr_thomas_solve

        return cr_thomas_solve
    if options.linear_solver == "tridiag_pallas_gj":
        from .kernels.thomas_pallas import gj_thomas_solve

        return gj_thomas_solve
    if options.linear_solver == "tridiag_pallas_crgj":
        from .kernels.thomas_pallas import crgj_thomas_solve

        return crgj_thomas_solve
    if options.linear_solver == "tridiag_pallas_gjp":
        from .kernels.thomas_pallas import gjp_thomas_solve

        return gjp_thomas_solve
    if options.linear_solver == "tridiag_pallas_crgjp":
        from .kernels.thomas_pallas import crgjp_thomas_solve

        return crgjp_thomas_solve
    if options.linear_solver == "tridiag_pallas_gjpr":
        from .kernels.thomas_pallas import gjpr_thomas_solve

        return gjpr_thomas_solve
    if options.linear_solver == "tridiag_pallas_crgjpr":
        from .kernels.thomas_pallas import crgjpr_thomas_solve

        return crgjpr_thomas_solve
    if options.linear_solver == "tridiag_pallas_crgjb":
        from .kernels.thomas_pallas import crgjb_thomas_solve

        return crgjb_thomas_solve
    if options.linear_solver == "tridiag_pallas_crgjbr":
        from .kernels.thomas_pallas import crgjbr_thomas_solve

        return crgjbr_thomas_solve
    if options.linear_solver == "tridiag_pallas_crgjbr2":
        from .kernels.thomas_pallas import crgjbr2_thomas_solve

        return crgjbr2_thomas_solve
    if options.linear_solver == "tridiag_pallas_crgjbpr":
        from .kernels.thomas_pallas import crgjbpr_thomas_solve

        return crgjbpr_thomas_solve
    if options.linear_solver == "tridiag_pallas_crgjbpr2":
        from .kernels.thomas_pallas import crgjbpr2_thomas_solve

        return crgjbpr2_thomas_solve
    if options.linear_solver == "tridiag_pallas_crgjbprl":
        from .kernels.thomas_pallas import crgjbprl_thomas_solve

        return crgjbprl_thomas_solve
    if options.linear_solver == "tridiag_pallas_lanes":
        from .kernels.thomas_pallas import lanes_thomas_solve

        return lanes_thomas_solve
    if options.linear_solver == "tridiag_auto":
        from .kernels.thomas_pallas import auto_thomas_solve

        return auto_thomas_solve
    return "cr" if options.linear_solver == "tridiag_cr" else "thomas"


def _make_linearizer(mcp: PrimalDualMCP, theta: Array, dtype):
    """Per-solve linearizer ``lin(x, y) -> (g, h, Gx, Gy, Hx, Hy)``.

    For ``mcp.affine`` problems (constant (x, y)-Jacobians — e.g. the QP
    benchmark's KKT system) the Jacobian and offsets are extracted ONCE here,
    outside the Newton while_loop; each iteration's residual then costs two
    matvecs instead of an (n+m)-seed forward-mode sweep. This is the dense
    analog of the trajectory games' affine_bands fast path (VERDICT r3
    item 2: the solver re-ran the (n+m)-seed gh_linearized every inner
    iteration of a constant-Jacobian problem)."""
    if mcp.affine:
        g0, h0, Gx, Gy, Hx, Hy = mcp.gh_affine_data(theta, dtype=dtype)
        g0 = g0.astype(dtype)
        h0 = h0.astype(dtype)
        Gx, Gy, Hx, Hy = (J.astype(dtype) for J in (Gx, Gy, Hx, Hy))

        def lin(x, y):
            return g0 + Gx @ x + Gy @ y, h0 + Hx @ x + Hy @ y, Gx, Gy, Hx, Hy

        return lin
    return lambda x, y: mcp.gh_linearized(x, y, theta)


_TRIDIAG_TIERS = (
    "tridiag",
    "tridiag_cr",
    "tridiag_pallas",
    "tridiag_pallas_cr",
    "tridiag_pallas_gj",
    "tridiag_pallas_gjp",
    "tridiag_pallas_crgj",
    "tridiag_pallas_crgjp",
    "tridiag_pallas_gjpr",
    "tridiag_pallas_crgjpr",
    "tridiag_pallas_crgjb",
    "tridiag_pallas_crgjbr",
    "tridiag_pallas_crgjbr2",
    "tridiag_pallas_crgjbpr",
    "tridiag_pallas_crgjbpr2",
    "tridiag_pallas_crgjbprl",
    "tridiag_pallas_lanes",
    "tridiag_auto",
)


def _ip_solve_body(
    mcp: PrimalDualMCP,
    options: SolverOptions,
    theta: Array,
    x0: Array,
    y0: Array,
    s0: Array,
    tridiag_solver=None,
    newton_solver=None,
    gate=None,
) -> SolveResult:
    tridiag_family = options.linear_solver in _TRIDIAG_TIERS
    if tridiag_family and mcp.time_structure is None:
        raise ValueError(
            "linear_solver='tridiag' requires an MCP with time_structure "
            "(built by build_parametric_game for trajectory games)."
        )
    tridiag_algorithm = _tridiag_algorithm(options, tridiag_solver)
    # Fully-banded fast path: colored-seed Jacobian extraction + band-only
    # assembly; no (n, n) or (n, m) matrix is ever materialized
    # (kernels/block_tridiag.py — at N=10/horizon-30 the dense linearize
    # alone costs 2 s per Newton iteration, the colored one ~1/10th).
    use_banded_fused = (
        tridiag_family and mcp.time_structure.row_permutation is not None
        if tridiag_family
        else False
    )
    if tridiag_family and not use_banded_fused:
        from .linalg import newton_step_tridiag

        newton_step = functools.partial(
            newton_step_tridiag,
            structure=mcp.time_structure,
            algorithm=tridiag_algorithm,
        )
    elif newton_solver is not None:
        # Injected Newton-step backend (e.g. the tensor-parallel sharded
        # factorization, parallel/tensor.py); same signature as the
        # NEWTON_STEPS entries. The polish loop below reuses it too.
        newton_step = newton_solver
    elif not tridiag_family:
        newton_step = NEWTON_STEPS[options.linear_solver]
        if options.linear_solver == "gmres":
            newton_step = functools.partial(
                newton_step,
                tol=options.gmres_tol,
                restart=options.gmres_restart,
                maxiter=options.gmres_maxiter,
                preconditioner=options.gmres_preconditioner,
            )
    tol = options.tol
    reg = options.regularization if options.regularization is not None else tol
    dtype = x0.dtype
    # Hoisted once per solve; for affine problems this extracts the constant
    # Jacobian OUTSIDE the Newton loop (see _make_linearizer).
    lin = None if use_banded_fused else _make_linearizer(mcp, theta, dtype)

    if options.fused_linesearch and options.verbose:
        import warnings

        warnings.warn(
            "fused_linesearch=True is incompatible with verbose=True (the "
            "debug print needs the split linear/linesearch failure flags); "
            "falling back to the unfused path.",
            stacklevel=2,
        )
    use_fused_ls = (
        options.fused_linesearch
        if options.fused_linesearch is not None
        else options.linear_solver in ("tridiag_pallas", "tridiag_auto")
    ) and not options.verbose
    if use_fused_ls:
        from .kernels.linesearch_pallas import make_linesearch_update

        ls_update = make_linesearch_update(
            tau=options.tau,
            decay=options.decay,
            min_stepsize=options.min_stepsize,
        )

    def inner_body(carry):
        x, y, s, kkt_error, inner, failed, eps = carry

        # Fused residual + Jacobian evaluation (one linearize pass). The
        # solve runs in the iterate dtype regardless of problem-data dtype
        # (f64 data must not promote an f32 TPU solve's carry).
        if use_banded_fused:
            from .kernels.block_tridiag import (
                banded_newton_step_compressed,
                gh_banded_fast,
            )

            g, h, diag_b, lower_b, upper_b, Gy_b, Hx_b = gh_banded_fast(
                mcp, mcp.time_structure, x, y, theta
            )
            rG = g.astype(dtype)
            rH = (h - s).astype(dtype)
            rC = (s * y - eps).astype(dtype)
            dx, dy, ds = banded_newton_step_compressed(
                diag_b.astype(dtype),
                lower_b.astype(dtype),
                upper_b.astype(dtype),
                Gy_b.astype(dtype),
                Hx_b.astype(dtype),
                y, s, rG, rH, rC, reg,
                mcp.time_structure,
                algorithm=tridiag_algorithm,
            )
        else:
            g, h, Gx, Gy, Hx, Hy = lin(x, y)
            rG = g.astype(dtype)
            rH = (h - s).astype(dtype)
            rC = (s * y - eps).astype(dtype)
            Gx, Gy, Hx, Hy = (J.astype(dtype) for J in (Gx, Gy, Hx, Hy))
            dx, dy, ds = newton_step(Gx, Gy, Hx, Hy, y, s, rG, rH, rC, reg)

        if use_fused_ls:
            # One kernel for linesearch + failure detection + update + ‖F‖∞
            # (semantics identical to the unfused branch below; see
            # kernels/linesearch_pallas.py).
            x, s, y, F_norm, step_failed = ls_update(
                x, dx.astype(dtype), s, ds.astype(dtype), y, dy.astype(dtype),
                rG, rH, rC,
            )
            kkt_error = jnp.where(step_failed, kkt_error, F_norm)
            inner = jnp.where(step_failed, inner, inner + 1)
            return x, y, s, kkt_error, inner, step_failed, eps

        # Linear-solve failure detection: the reference checks the LinearSolve
        # retcode (src/solver.jl:84-88); dense LU signals failure via
        # non-finite step entries.
        lin_failed = ~(
            jnp.all(jnp.isfinite(dx))
            & jnp.all(jnp.isfinite(dy))
            & jnp.all(jnp.isfinite(ds))
        )

        # NaN steps would spin the linesearch loop forever; guard with 0.
        safe = lambda d: jnp.where(lin_failed, jnp.zeros_like(d), d)
        alphas = fraction_to_the_boundary_linesearch_pair(
            jnp.stack([s, y]),
            jnp.stack([safe(ds), safe(dy)]),
            tau=options.tau,
            decay=options.decay,
            min_stepsize=options.min_stepsize,
        )
        alpha_s, alpha_y = alphas[0], alphas[1]
        ls_failed = jnp.isnan(alpha_s) | jnp.isnan(alpha_y)

        step_failed = lin_failed | ls_failed
        if options.verbose:
            lax.cond(
                step_failed,
                lambda: jax.debug.print(
                    "inner step failed (linear={lin}, linesearch={ls}) at eps={eps}",
                    lin=lin_failed,
                    ls=ls_failed,
                    eps=eps,
                    ordered=False,
                ),
                lambda: None,
            )
        # The reference breaks *before* applying the update and before
        # refreshing kkt_error / inner count (src/solver.jl:84-105).
        a_s = jnp.where(step_failed, 0.0, alpha_s).astype(dtype)
        a_y = jnp.where(step_failed, 0.0, alpha_y).astype(dtype)
        # safe(), not a bare α=0 gate: 0·NaN = NaN would poison the iterates
        # on a linear failure, but the reference breaks BEFORE applying the
        # update and retries from the last good point (src/solver.jl:84-105).
        x = x + a_s * safe(dx)
        s = s + a_s * safe(ds)
        y = y + a_y * safe(dy)

        F_norm = jnp.maximum(
            jnp.max(jnp.abs(rG), initial=0.0),
            jnp.maximum(
                jnp.max(jnp.abs(rH), initial=0.0), jnp.max(jnp.abs(rC), initial=0.0)
            ),
        )
        kkt_error = jnp.where(step_failed, kkt_error, F_norm)
        inner = jnp.where(step_failed, inner, inner + 1)
        return x, y, s, kkt_error, inner, step_failed, eps

    def inner_cond(carry):
        _, _, _, kkt_error, inner, failed, eps = carry
        return (kkt_error > eps) & (inner < options.max_inner_iters) & ~failed

    def outer_body(carry):
        x, y, s, kkt_error, eps, outer, _ = carry
        # status resets to :solved at the top of each outer iteration
        # (src/solver.jl:72-73).
        inner_carry = (x, y, s, kkt_error, jnp.int32(1), jnp.bool_(False), eps)
        x, y, s, kkt_error, inner, failed, _ = lax.while_loop(
            inner_cond, inner_body, inner_carry
        )
        inner_f = inner.astype(dtype)
        eps = eps * jnp.where(
            failed,
            1.0 + jnp.exp(-options.loosening_rate * inner_f),
            1.0 - jnp.exp(-options.tightening_rate * inner_f),
        )
        return x, y, s, kkt_error, eps, outer + 1, failed

    def outer_cond(carry):
        _, _, _, kkt_error, eps, outer, _ = carry
        live = (kkt_error > tol) & (eps > tol) & (outer < options.max_outer_iters)
        # Per-lane gating (SolverOptions.retry): a gated-off lane's loop
        # condition is False at entry, so the vmapped batch only iterates
        # for lanes that actually need this solve.
        return live if gate is None else live & gate

    init = (
        x0,
        y0,
        s0,
        jnp.asarray(jnp.inf, dtype),
        jnp.asarray(1.0, dtype),
        jnp.int32(1),
        jnp.bool_(False),
    )
    x, y, s, kkt_error, eps, outer, failed = lax.while_loop(
        outer_cond, outer_body, init
    )
    failed = failed | (outer == options.max_outer_iters)

    if options.polish:
        x, y, s, kkt_error, failed = _terminal_polish(
            mcp, options, theta, x, y, s, failed,
            lin=lin,
            newton_step=None if use_banded_fused else newton_step,
            tridiag_algorithm=tridiag_algorithm if tridiag_family else None,
            use_banded_fused=use_banded_fused,
            gate=gate,
        )

    status = jnp.where(failed, jnp.int32(FAILED), jnp.int32(SOLVED))
    if gate is not None:
        # A gated-off lane never ran: report it FAILED so callers cannot
        # mistake its untouched cold-start iterate for a solution.
        status = jnp.where(gate, status, jnp.int32(FAILED))
    return SolveResult(
        x=x, y=y, s=s, kkt_error=kkt_error, epsilon=eps, outer_iters=outer, status=status
    )


def _terminal_polish(
    mcp, options, theta, x, y, s, failed, *,
    lin, newton_step, tridiag_algorithm, use_banded_fused, gate=None,
):
    """Terminal polish at fixed ϵ = tol/2 against the TRUE residual
    ‖(g, h−s, s∘y)‖∞ (see SolverOptions.polish). Shared by the annealed-IP,
    Mehrotra, and hybrid solvers; reuses the caller's Newton machinery and
    evaluates the true residual at each NEW iterate (one extra cheap gh()
    per polish step). Returns (x, y, s, true_kkt, failed)."""
    tol = options.tol
    # Exit BELOW tol, not at it: a lane polished to exactly 9.99e-6 at
    # tol 1e-5 re-measures at 1.01e-5 under the harness's independently-
    # rounded true-KKT recompute (round-5 QP driver capture: frac 0.9961
    # from exactly one boundary-riding lane). The ~15% margin costs at most
    # one extra polish step on borderline lanes and makes the external
    # certification robust to metric-side rounding.
    exit_tol = options.polish_margin * tol
    reg = options.regularization if options.regularization is not None else tol
    dtype = x.dtype
    eps_p = jnp.asarray(0.5 * tol, dtype)

    def true_kkt_at(x, y, s):
        g, h = mcp.gh(x, y, theta)
        return jnp.maximum(
            jnp.max(jnp.abs(g.astype(dtype)), initial=0.0),
            jnp.maximum(
                jnp.max(jnp.abs((h - s).astype(dtype)), initial=0.0),
                jnp.max(jnp.abs(s * y), initial=0.0),
            ),
        )

    def polish_body(carry):
        x, y, s, _, iters, failed = carry
        if use_banded_fused:
            from .kernels.block_tridiag import (
                banded_newton_step_compressed,
                gh_banded_fast,
            )

            g, h, diag_b, lower_b, upper_b, Gy_b, Hx_b = gh_banded_fast(
                mcp, mcp.time_structure, x, y, theta
            )
            rG = g.astype(dtype)
            rH = (h - s).astype(dtype)
            rC = (s * y - eps_p).astype(dtype)
            dx, dy, ds = banded_newton_step_compressed(
                diag_b.astype(dtype),
                lower_b.astype(dtype),
                upper_b.astype(dtype),
                Gy_b.astype(dtype),
                Hx_b.astype(dtype),
                y, s, rG, rH, rC, reg,
                mcp.time_structure,
                algorithm=tridiag_algorithm,
            )
        else:
            g, h, Gx, Gy, Hx, Hy = lin(x, y)
            rG = g.astype(dtype)
            rH = (h - s).astype(dtype)
            rC = (s * y - eps_p).astype(dtype)
            Gx, Gy, Hx, Hy = (J.astype(dtype) for J in (Gx, Gy, Hx, Hy))
            dx, dy, ds = newton_step(Gx, Gy, Hx, Hy, y, s, rG, rH, rC, reg)

        lin_failed = ~(
            jnp.all(jnp.isfinite(dx))
            & jnp.all(jnp.isfinite(dy))
            & jnp.all(jnp.isfinite(ds))
        )
        safe = lambda d: jnp.where(lin_failed, jnp.zeros_like(d), d)
        alphas = fraction_to_the_boundary_linesearch_pair(
            jnp.stack([s, y]),
            jnp.stack([safe(ds), safe(dy)]),
            tau=options.tau,
            decay=options.decay,
            min_stepsize=options.min_stepsize,
        )
        step_failed = (
            lin_failed | jnp.isnan(alphas[0]) | jnp.isnan(alphas[1])
        )
        a_s = jnp.where(step_failed, 0.0, alphas[0]).astype(dtype)
        a_y = jnp.where(step_failed, 0.0, alphas[1]).astype(dtype)
        x = x + a_s * safe(dx)
        s = s + a_s * safe(ds)
        y = y + a_y * safe(dy)
        return x, y, s, true_kkt_at(x, y, s), iters + 1, failed | step_failed

    def polish_cond(carry):
        _, _, _, tk, iters, p_failed = carry
        live = (tk > exit_tol) & (iters < options.max_inner_iters) & ~p_failed
        # Gated-off lanes (SolverOptions.retry) skip the polish loop too —
        # their cold-start residual would otherwise drag the vmapped batch
        # through max_inner_iters useless polish steps.
        return live if gate is None else live & gate

    tk0 = true_kkt_at(x, y, s)
    x, y, s, tk, _, p_failed = lax.while_loop(
        polish_cond,
        polish_body,
        (x, y, s, tk0, jnp.int32(0), jnp.bool_(False)),
    )
    return x, y, s, tk, failed | (tk > tol)


def _max_step_to_boundary(v: Array, dv: Array, frac) -> Array:
    """Closed-form largest α ≤ 1 with v + α·frac⁻¹·... — specifically
    α = min(1, frac · min over δᵢ<0 of -vᵢ/δᵢ): the exact
    fraction-to-the-boundary limit (no backtracking grid)."""
    ratios = jnp.where(dv < 0, -v / jnp.minimum(dv, -jnp.finfo(v.dtype).tiny), jnp.inf)
    return jnp.minimum(1.0, frac * jnp.min(ratios, initial=jnp.inf))


def _mehrotra_solve_body(
    mcp: PrimalDualMCP,
    options: SolverOptions,
    theta: Array,
    x0: Array,
    y0: Array,
    s0: Array,
    tridiag_solver=None,
) -> SolveResult:
    """Mehrotra predictor-corrector interior-point solve (opt-in,
    ``SolverOptions(algorithm="mehrotra")``).

    Per iteration: one Jacobian evaluation, one KKT factorization, a handful
    of back-solves — the affine predictor (rC = s∘y, i.e. pure Newton toward
    complementarity 0) sets the centering weight σ = (μ_aff/μ)³, and the
    corrector re-solves with rC = s∘y + δs_aff∘δy_aff − target, where
    target = max(σμ, centering_floor·‖(rG, rH)‖∞) (see SolverOptions).
    Each solve is polished by `refinement_steps` iterative-refinement passes
    against the true Jacobian. Converges in ~1/2-1/3 the Jacobian
    evaluations of the annealed loop on monotone problems (QP benchmark:
    7-10 iterations at tol 1e-6 vs 12 outer × several inner) and on
    warm-started re-solves; on strongly nonmonotone cold starts (trajectory
    games from scratch) the reference's ϵ-annealing homotopy is the robust
    choice and remains the default. No reference counterpart; result
    semantics (status/kkt_error/outer_iters) match `SolveResult`, with
    `epsilon` reporting the final mean complementarity μ.
    """
    n, m = mcp.unconstrained_dimension, mcp.constrained_dimension
    if m == 0:
        # Pure root-find: predictor == corrector; the reference-semantics
        # Newton loop is identical and already handles this shape.
        return _ip_solve_body(mcp, options, theta, x0, y0, s0)

    tridiag_family = options.linear_solver in _TRIDIAG_TIERS
    if tridiag_family and mcp.time_structure is None:
        raise ValueError(
            "linear_solver='tridiag' requires an MCP with time_structure "
            "(built by build_parametric_game for trajectory games)."
        )
    tridiag_algorithm = _tridiag_algorithm(options, tridiag_solver)
    use_banded_fused = (
        tridiag_family and mcp.time_structure.row_permutation is not None
    )
    if not tridiag_family:
        from .linalg import factored_newton_solver

        make_solver = factored_newton_solver(options.linear_solver)
    tol = options.tol
    reg = options.regularization if options.regularization is not None else tol
    dtype = x0.dtype
    lin = None if use_banded_fused else _make_linearizer(mcp, theta, dtype)

    refine_steps = int(options.refinement_steps)

    def body(carry):
        x, y, s, kkt_error, iters, failed, mu = carry

        # One Jacobian evaluation per iteration, shared by all solves.
        if use_banded_fused:
            from .kernels.block_tridiag import (
                banded_jac_mv,
                banded_newton_step_compressed,
                gh_banded_fast,
            )

            g, h, diag_b, lower_b, upper_b, Gy_b, Hx_b = gh_banded_fast(
                mcp, mcp.time_structure, x, y, theta
            )
            rG = g.astype(dtype)
            rH = (h - s).astype(dtype)
            bands = tuple(
                J.astype(dtype) for J in (diag_b, lower_b, upper_b, Gy_b, Hx_b)
            )
            solve_f = lambda bG, bH, bC: banded_newton_step_compressed(
                *bands, y, s, bG, bH, bC, reg, mcp.time_structure,
                algorithm=tridiag_algorithm,
            )

            def jac_mv(dx, dy, ds):
                # Band-form true-Jacobian product: the tol·I-biased banded
                # factorization is exactly where refinement matters most.
                return banded_jac_mv(
                    *bands, y, s, dx, dy, ds, mcp.time_structure
                )
        else:
            g, h, Gx, Gy, Hx, Hy = lin(x, y)
            rG = g.astype(dtype)
            rH = (h - s).astype(dtype)
            Gx, Gy, Hx, Hy = (J.astype(dtype) for J in (Gx, Gy, Hx, Hy))
            if tridiag_family:
                from .linalg import newton_step_tridiag

                solve_f = lambda bG, bH, bC: newton_step_tridiag(
                    Gx, Gy, Hx, Hy, y, s, bG, bH, bC, reg,
                    structure=mcp.time_structure, algorithm=tridiag_algorithm,
                )
            else:
                gm = (
                    dict(
                        tol=options.gmres_tol,
                        restart=options.gmres_restart,
                        maxiter=options.gmres_maxiter,
                        preconditioner=options.gmres_preconditioner,
                    )
                    if options.linear_solver == "gmres"
                    else None
                )
                solve_f = (
                    make_solver(Gx, Gy, Hx, Hy, y, s, reg, gmres_options=gm)
                    if gm is not None
                    else make_solver(Gx, Gy, Hx, Hy, y, s, reg)
                )

            def jac_mv(dx, dy, ds):
                # True (unregularized) ∇F_z · δ, for iterative refinement.
                return (
                    Gx @ dx + Gy @ dy,
                    Hx @ dx + Hy @ dy - ds,
                    s * dy + y * ds,
                )

        def solve_refined(bG, bH, bC):
            dx, dy, ds = solve_f(bG, bH, bC)
            for _ in range(refine_steps if jac_mv is not None else 0):
                eG, eH, eC = jac_mv(dx, dy, ds)
                cx, cy, cs = solve_f(bG + eG, bH + eH, bC + eC)
                dx, dy, ds = dx + cx, dy + cy, ds + cs
            return dx, dy, ds

        comp = s * y
        feas = jnp.maximum(
            jnp.max(jnp.abs(rG), initial=0.0), jnp.max(jnp.abs(rH), initial=0.0)
        )
        # Affine predictor: full Newton step toward complementarity 0.
        dx_a, dy_a, ds_a = solve_refined(rG, rH, comp)
        a_s_aff = _max_step_to_boundary(s, ds_a, 1.0)
        a_y_aff = _max_step_to_boundary(y, dy_a, 1.0)
        mu = jnp.sum(comp) / m
        mu_aff = jnp.sum((s + a_s_aff * ds_a) * (y + a_y_aff * dy_a)) / m
        sigma = jnp.where(
            mu > 0.0, jnp.clip((mu_aff / jnp.maximum(mu, 1e-300)) ** 3, 0.0, 1.0), 0.0
        ).astype(dtype)
        # Corrector: same factorization, centered + second-order rC; the
        # centering target is floored by the feasibility residual so
        # complementarity cannot outrun feasibility (see SolverOptions).
        target = jnp.maximum(sigma * mu, options.centering_floor * feas)
        rC = comp + ds_a * dy_a - target
        dx, dy, ds = solve_refined(rG, rH, rC)

        lin_failed = ~(
            jnp.all(jnp.isfinite(dx))
            & jnp.all(jnp.isfinite(dy))
            & jnp.all(jnp.isfinite(ds))
            & jnp.all(jnp.isfinite(ds_a))
            & jnp.all(jnp.isfinite(dy_a))
        )
        safe = lambda d: jnp.where(lin_failed, jnp.zeros_like(d), d)
        a_s = _max_step_to_boundary(s, safe(ds), options.tau).astype(dtype)
        a_y = _max_step_to_boundary(y, safe(dy), options.tau).astype(dtype)
        step_failed = lin_failed
        if options.verbose:
            lax.cond(
                step_failed,
                lambda: jax.debug.print(
                    "mehrotra step failed (non-finite direction) at mu={mu}",
                    mu=mu,
                    ordered=False,
                ),
                lambda: None,
            )
        a_s = jnp.where(step_failed, 0.0, a_s)
        a_y = jnp.where(step_failed, 0.0, a_y)
        # safe(): 0·NaN = NaN; keep the last good iterate on a failed step.
        x = x + a_s * safe(dx)
        s = s + a_s * safe(ds)
        y = y + a_y * safe(dy)

        F_norm = jnp.maximum(feas, jnp.max(jnp.abs(comp), initial=0.0))
        kkt_error = jnp.where(step_failed, kkt_error, F_norm)
        return x, y, s, kkt_error, iters + 1, step_failed, mu

    def cond(carry):
        _, _, _, kkt_error, iters, failed, _ = carry
        return (kkt_error > tol) & (iters < options.max_outer_iters) & ~failed

    init = (
        x0,
        y0,
        s0,
        jnp.asarray(jnp.inf, dtype),
        jnp.int32(1),
        jnp.bool_(False),
        jnp.asarray(1.0, dtype),
    )
    x, y, s, kkt_error, iters, failed, mu = lax.while_loop(cond, body, init)
    failed = failed | (iters == options.max_outer_iters) & (kkt_error > tol)

    if options.polish:
        # Same terminal certification as the annealed loop: Mehrotra's own
        # exit tests the PRE-step residual; polish drives the residual at
        # the RETURNED iterate to ≤ tol (shared _terminal_polish).
        if use_banded_fused:
            p_newton = None
        elif tridiag_family:
            from .linalg import newton_step_tridiag

            p_newton = functools.partial(
                newton_step_tridiag,
                structure=mcp.time_structure,
                algorithm=tridiag_algorithm,
            )
        else:
            p_newton = NEWTON_STEPS[options.linear_solver]
            if options.linear_solver == "gmres":
                p_newton = functools.partial(
                    p_newton,
                    tol=options.gmres_tol,
                    restart=options.gmres_restart,
                    maxiter=options.gmres_maxiter,
                    preconditioner=options.gmres_preconditioner,
                )
        x, y, s, kkt_error, failed = _terminal_polish(
            mcp, options, theta, x, y, s, failed,
            lin=lin,
            newton_step=p_newton,
            tridiag_algorithm=tridiag_algorithm if tridiag_family else None,
            use_banded_fused=use_banded_fused,
        )

    status = jnp.where(failed, jnp.int32(FAILED), jnp.int32(SOLVED))
    return SolveResult(
        x=x, y=y, s=s, kkt_error=kkt_error, epsilon=mu, outer_iters=iters,
        status=status,
    )


def default_initialization(
    mcp: PrimalDualMCP,
    theta: Array,
    x0: Optional[Array] = None,
    y0: Optional[Array] = None,
    s0: Optional[Array] = None,
    dtype=None,
):
    """Reference defaults: x₀ = 0, y₀ = s₀ = 1 (src/solver.jl:38-41)."""
    dtype = dtype or jnp.asarray(theta).dtype
    n, m = mcp.unconstrained_dimension, mcp.constrained_dimension
    x0 = jnp.zeros(n, dtype) if x0 is None else jnp.asarray(x0, dtype)
    y0 = jnp.ones(m, dtype) if y0 is None else jnp.asarray(y0, dtype)
    s0 = jnp.ones(m, dtype) if s0 is None else jnp.asarray(s0, dtype)
    return x0, y0, s0
