"""Differentiation through the interior-point solve via the implicit function
theorem (IFT).

At a solution, F(z*; θ, ϵ) = 0, so ∂z*/∂θ = -(∇F_z)⁻¹ ∇F_θ
(reference src/AutoDiff.jl:1-8). The reference wires this up twice — a
ChainRulesCore rrule for Zygote reverse mode (src/AutoDiff.jl:42-82) and a
ForwardDiff Dual overload (src/AutoDiff.jl:84-117). Here a single
``jax.custom_jvp`` rule serves both: forward mode uses it directly, and
reverse mode falls out of JAX's linearize-then-transpose machinery because
the tangent computation is built from transposable pieces
(``lax.custom_linear_solve`` + a JVP of F in θ). This collapses the
reference's dual-AD glue (SURVEY.md §3.4) into plain ``jax.grad``.

Efficiency note: the reference materializes the full ∂z/∂θ matrix with a
column-pivoted QR solve against all p columns of ∇F_θ (src/AutoDiff.jl:39).
Here ∇F_θ is never materialized: forward mode needs one linear solve against
∇F_θ·θ̇ (a JVP of F), reverse mode one transposed solve whose result is
contracted via a VJP of F — O(1) linear solves regardless of p. This matters:
the QP benchmark has p ≈ 20k.

Known reference bug NOT replicated: the ForwardDiff path builds the slack
duals from ``solution.y`` instead of ``solution.s`` (src/AutoDiff.jl:108-113);
here s receives its correct tangent rows.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from .linalg import assemble_dense_jacobian
from .mcp import PrimalDualMCP
from .solver import SolverOptions, default_initialization, ip_solve
from .types import SolveResult, zeros_tangent

Array = jax.Array


@functools.partial(jax.custom_jvp, nondiff_argnums=(0, 1, 2, 3))
def _solve_ts(
    mcp: PrimalDualMCP,
    options: SolverOptions,
    tridiag_solver,
    newton_solver,
    theta,
    x0,
    y0,
    s0,
):
    """Differentiable solve with optional backend overrides, used for BOTH
    the Newton factorizations and the IFT sensitivity solves:
    ``tridiag_solver`` — block-tridiagonal callable (e.g. the
    horizon-sharded SPIKE solve, parallel/horizon.py); ``newton_solver`` —
    whole-Newton-step callable (e.g. the tensor-parallel backend,
    parallel/tensor.py; if it exposes ``ift_solve``/``ift_solve_t``, the
    condensed IFT core solves are distributed too)."""
    return ip_solve(
        mcp,
        options,
        theta,
        x0,
        y0,
        s0,
        tridiag_solver=tridiag_solver,
        newton_solver=newton_solver,
    )


def _solve(mcp: PrimalDualMCP, options: SolverOptions, theta, x0, y0, s0):
    return _solve_ts(mcp, options, None, None, theta, x0, y0, s0)


@_solve_ts.defjvp
def _solve_jvp(
    mcp: PrimalDualMCP,
    options: SolverOptions,
    tridiag_solver,
    newton_solver,
    primals,
    tangents,
):
    if not mcp.compute_sensitivities:
        # API-parity error path (reference src/AutoDiff.jl:19-23).
        raise ValueError(
            "Missing sensitivities. Set `compute_sensitivities=True` when "
            "constructing the PrimalDualMCP."
        )
    theta, x0, y0, s0 = primals
    theta_dot = tangents[0]
    # Warm starts get no tangent, matching the reference rrule's NoTangent
    # treatment of non-θ arguments (src/AutoDiff.jl:53-57).

    sol = ip_solve(
        mcp,
        options,
        theta,
        x0,
        y0,
        s0,
        tridiag_solver=tridiag_solver,
        newton_solver=newton_solver,
    )
    n, m = mcp.unconstrained_dimension, mcp.constrained_dimension

    sens = options.sensitivity_solver
    ts = mcp.time_structure
    if (
        sens == "tridiag"
        and mcp.assume_hy_zero
        and ts is not None
        and getattr(ts, "row_permutation", None) is not None
    ):
        # Fully-banded IFT solves: colored-seed Jacobian extraction + the
        # same block elimination as the Newton fast path — no (n+m)² seed
        # sweep and no dense matrix anywhere in the backward pass
        # (kernels/block_tridiag.py).
        return sol, _banded_ift_tangent(
            mcp, options, sol, theta, theta_dot, tridiag_solver=tridiag_solver
        )

    # ∇F_z at the solution, evaluated at the final ϵ and WITHOUT the tol·I
    # regularization — exactly as the reference sensitivity computation does
    # (src/AutoDiff.jl:27-33 re-evaluates mcp.∇F_z!, not the regularized A).
    Gx, Gy, Hx, Hy = mcp.gh_jacobians(sol.x, sol.y, theta)

    if sens in ("condensed", "tridiag") and mcp.assume_hy_zero:
        # Same exact block elimination as the Newton tiers (linalg.py),
        # applied to the unregularized IFT system: with Hy ≡ 0 and strictly
        # interior s, y, the slack/dual rows eliminate through diagonals,
        # leaving the n×n matrix A = Gx - Gy·diag(y/s)·Hx (block-tridiagonal
        # in time for trajectory games). The backward pass then costs one
        # n-sized solve instead of an (n+2m)² dense LU — the difference
        # between feasible and infeasible training at the N=4/horizon-30
        # flagship scale.
        y_, s_ = sol.y, sol.s
        A = Gx - (Gy * (y_ / s_)[None, :]) @ Hx

        if sens == "tridiag":
            if mcp.time_structure is None:
                raise ValueError(
                    "sensitivity_solver='tridiag' requires an MCP with "
                    "time_structure (trajectory games)."
                )
            from .kernels.block_tridiag import tridiag_solve_permuted

            A_solve = lambda rhs: tridiag_solve_permuted(A, rhs, mcp.time_structure)
            AT_solve = lambda rhs: tridiag_solve_permuted(
                A.T, rhs, mcp.time_structure
            )
        elif hasattr(newton_solver, "ift_solve"):
            # Distributed IFT core solves (e.g. the tensor-parallel sharded
            # LU) — the backward pass rides the same mesh as the forward.
            A_solve = lambda rhs: newton_solver.ift_solve(A, rhs)
            AT_solve = lambda rhs: newton_solver.ift_solve_t(A, rhs)
        else:
            A_solve = lambda rhs: jnp.linalg.solve(A, rhs)
            AT_solve = lambda rhs: jnp.linalg.solve(A.T, rhs)

        def matvec(v):
            vx, vy, vs = v[:n], v[n : n + m], v[n + m :]
            return -jnp.concatenate(
                [Gx @ vx + Gy @ vy, Hx @ vx - vs, s_ * vy + y_ * vs]
            )

        def solve_fn(_, b):
            b1, b2, b3 = b[:n], b[n : n + m], b[n + m :]
            zx = A_solve(b1 - Gy @ ((b3 + y_ * b2) / s_))
            zs = Hx @ zx - b2
            zy = (b3 - y_ * zs) / s_
            return -jnp.concatenate([zx, zy, zs])

        def transpose_solve_fn(_, c):
            c1, c2, c3 = c[:n], c[n : n + m], c[n + m :]
            w1 = AT_solve(c1 - Hx.T @ (y_ * c2 / s_) + Hx.T @ c3)
            w3 = (c2 - Gy.T @ w1) / s_
            w2 = y_ * w3 - c3
            return -jnp.concatenate([w1, w2, w3])

    else:
        Jz = assemble_dense_jacobian(Gx, Gy, Hx, Hy, sol.y, sol.s)
        neg_Jz = -Jz
        lu_and_piv = jax.scipy.linalg.lu_factor(neg_Jz)

        def matvec(v):
            return neg_Jz @ v

        def solve_fn(_, b):
            return jax.scipy.linalg.lu_solve(lu_and_piv, b)

        def transpose_solve_fn(_, b):
            return jax.scipy.linalg.lu_solve(lu_and_piv, b, trans=1)

    # ∇F_θ·θ̇ as a JVP of F in θ — linear in θ̇, hence transposable into the
    # VJP needed for reverse mode.
    def F_of_theta(t):
        return mcp.F(sol.x, sol.y, sol.s, t, sol.epsilon)

    _, F_dot = jax.jvp(F_of_theta, (theta,), (theta_dot,))

    # ż = ∂z/∂θ·θ̇ = (-∇F_z)⁻¹ ∇F_θ·θ̇.
    z_dot = lax.custom_linear_solve(
        matvec, F_dot, solve_fn, transpose_solve=transpose_solve_fn
    )

    tangent = SolveResult(
        x=z_dot[:n],
        y=z_dot[n : n + m],
        s=z_dot[n + m :],
        kkt_error=zeros_tangent(sol.kkt_error),
        epsilon=zeros_tangent(sol.epsilon),
        outer_iters=zeros_tangent(sol.outer_iters),
        status=zeros_tangent(sol.status),
    )
    return sol, tangent


def _banded_ift_tangent(
    mcp, options, sol, theta, theta_dot, tridiag_solver=None
) -> SolveResult:
    """IFT tangent with colored-seed banded Jacobians and block-tridiagonal
    solves — no dense (n+m)-seed sweep, no (n,·) matrix materialization.
    Forward/transpose elimination identical to the condensed path; the n×n
    core solve and its transpose run on the (diag, lower, upper) bands."""
    from .kernels.block_tridiag import (
        _inverse_permutation,
        block_cyclic_reduction_solve,
        block_thomas_solve,
        gh_banded_fast,
    )

    n, m = mcp.unconstrained_dimension, mcp.constrained_dimension
    ts = mcp.time_structure
    T, b, mt = ts.num_blocks, ts.block_size, ts.rows_per_block
    perm = jnp.asarray(ts.permutation)
    rperm = jnp.asarray(ts.row_permutation)
    inv = _inverse_permutation(ts.permutation)
    rinv = _inverse_permutation(ts.row_permutation)
    x_, y_, s_ = sol.x, sol.y, sol.s

    _, _, diag_b, lower_b, upper_b, Gy_b, Hx_b = gh_banded_fast(
        mcp, ts, x_, y_, theta
    )
    r_blocks = (y_ / s_)[rperm].reshape(T, mt)
    # A = Gx - Gy·diag(y/s)·Hx: the reduction is block-diagonal in time.
    A_diag = diag_b - jnp.einsum("tbm,tm,tmc->tbc", Gy_b, r_blocks, Hx_b)
    AT_diag = A_diag.transpose(0, 2, 1)
    AT_lower = upper_b.transpose(0, 2, 1)
    AT_upper = lower_b.transpose(0, 2, 1)

    if tridiag_solver is not None:
        solver = tridiag_solver  # e.g. the horizon-sharded SPIKE solve
    elif options.linear_solver == "tridiag_pallas":
        from .kernels.thomas_pallas import thomas_solve

        solver = thomas_solve
    elif options.linear_solver == "tridiag_auto":
        from .kernels.thomas_pallas import auto_thomas_solve

        solver = auto_thomas_solve
    elif options.linear_solver == "tridiag_cr":
        solver = block_cyclic_reduction_solve
    else:
        solver = block_thomas_solve

    def A_solve(rhs):  # (n,) -> (n,)
        out = solver(A_diag, lower_b, upper_b, rhs[perm].reshape(T, b))
        return out.reshape(-1)[inv]

    def AT_solve(rhs):
        out = solver(AT_diag, AT_lower, AT_upper, rhs[perm].reshape(T, b))
        return out.reshape(-1)[inv]

    def Gy_mv(v):  # (m,) -> (n,)
        out = jnp.einsum("tbm,tm->tb", Gy_b, v[rperm].reshape(T, mt))
        return out.reshape(-1)[inv]

    def GyT_mv(w):  # (n,) -> (m,)
        out = jnp.einsum("tbm,tb->tm", Gy_b, w[perm].reshape(T, b))
        return out.reshape(-1)[rinv]

    def Hx_mv(v):  # (n,) -> (m,)
        out = jnp.einsum("tmc,tc->tm", Hx_b, v[perm].reshape(T, b))
        return out.reshape(-1)[rinv]

    def HxT_mv(w):  # (m,) -> (n,)
        out = jnp.einsum("tmc,tm->tc", Hx_b, w[rperm].reshape(T, mt))
        return out.reshape(-1)[inv]

    z0 = jnp.concatenate([x_, y_, s_])

    def F_full(z):
        return mcp.F(z[:n], z[n : n + m], z[n + m :], theta, sol.epsilon)

    def matvec(v):
        return -jax.jvp(F_full, (z0,), (v,))[1]

    def solve_fn(_, bvec):
        b1, b2, b3 = bvec[:n], bvec[n : n + m], bvec[n + m :]
        zx = A_solve(b1 - Gy_mv((b3 + y_ * b2) / s_))
        zs = Hx_mv(zx) - b2
        zy = (b3 - y_ * zs) / s_
        return -jnp.concatenate([zx, zy, zs])

    def transpose_solve_fn(_, c):
        c1, c2, c3 = c[:n], c[n : n + m], c[n + m :]
        w1 = AT_solve(c1 - HxT_mv(y_ * c2 / s_) + HxT_mv(c3))
        w3 = (c2 - GyT_mv(w1)) / s_
        w2 = y_ * w3 - c3
        return -jnp.concatenate([w1, w2, w3])

    def F_of_theta(t):
        return mcp.F(x_, y_, s_, t, sol.epsilon)

    _, F_dot = jax.jvp(F_of_theta, (theta,), (theta_dot,))
    z_dot = lax.custom_linear_solve(
        matvec, F_dot, solve_fn, transpose_solve=transpose_solve_fn
    )
    return SolveResult(
        x=z_dot[:n],
        y=z_dot[n : n + m],
        s=z_dot[n + m :],
        kkt_error=zeros_tangent(sol.kkt_error),
        epsilon=zeros_tangent(sol.epsilon),
        outer_iters=zeros_tangent(sol.outer_iters),
        status=zeros_tangent(sol.status),
    )


_jitted_solve = jax.jit(_solve, static_argnums=(0, 1))


def solve(
    mcp: PrimalDualMCP,
    theta: Array,
    *,
    x0: Optional[Array] = None,
    y0: Optional[Array] = None,
    s0: Optional[Array] = None,
    options: Optional[SolverOptions] = None,
    **option_overrides,
) -> SolveResult:
    """Solve an MCP; jit-compiled, differentiable w.r.t. ``theta``.

    Mirrors the reference entry point ``solve(InteriorPoint(), mcp, θ;
    x₀, y₀, s₀, kwargs...)`` (src/solver.jl:35-51). Option kwargs accept the
    reference names (tol, max_inner_iters, max_outer_iters, tightening_rate,
    loosening_rate, min_stepsize) plus the linear_solver tier.
    """
    if options is None:
        options = SolverOptions(**option_overrides)
    elif option_overrides:
        options = dataclasses_replace(options, **option_overrides)
    theta = jnp.asarray(theta)
    x0, y0, s0 = default_initialization(mcp, theta, x0, y0, s0)
    return _jitted_solve(mcp, options, theta, x0, y0, s0)


def dataclasses_replace(options, **kw):
    import dataclasses

    return dataclasses.replace(options, **kw)


def solve_jacobian_theta(
    mcp: PrimalDualMCP, sol: SolveResult, theta: Array, *, method: str = "lu"
) -> Array:
    """Materialize the full ∂z*/∂θ ∈ R^{(n+2m)×p} — the direct counterpart of
    the reference's ``_solve_jacobian_θ`` (src/AutoDiff.jl:18-40). ``method``
    "lstsq" is the rank-revealing analog of the reference's pivoted QR."""
    if not mcp.compute_sensitivities:
        raise ValueError(
            "Missing sensitivities. Set `compute_sensitivities=True` when "
            "constructing the PrimalDualMCP."
        )
    Gx, Gy, Hx, Hy = mcp.gh_jacobians(sol.x, sol.y, theta)
    Jz = assemble_dense_jacobian(Gx, Gy, Hx, Hy, sol.y, sol.s)

    def F_of_theta(t):
        return mcp.F(sol.x, sol.y, sol.s, t, sol.epsilon)

    J_theta = jax.jacfwd(F_of_theta)(theta)
    if method == "lstsq":
        return jnp.linalg.lstsq(-Jz, J_theta)[0]
    return jnp.linalg.solve(-Jz, J_theta)
