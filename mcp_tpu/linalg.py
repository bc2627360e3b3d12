"""Newton-step linear solvers for the interior-point iteration.

The reference solves the full (n+2m)×(n+2m) sparse system
``(∇F + tol·I) δz = -F`` with UMFPACK LU each inner iteration
(reference src/solver.jl:79-90). On TPU there is no sparse LU; instead we
exploit the *fixed block structure* of ∇F_z:

        ┌ Gx   Gy    0 ┐
  ∇F_z =│ Hx   Hy   -I │        rows: [G; H - s; s∘y - ϵ]
        └  0    S    Y ┘        cols: [x; y; s]

Tiers (SURVEY.md §7.1.5):
  * "dense": materialize the full regularized matrix, one batched LU. The
    conformance tier — bit-equivalent to the reference's linear system.
  * "condensed" (default): eliminate δs analytically through the diagonal
    third block row — exact, no approximation — leaving an (n+m) system:
        [ Gx+tI      Gy                 ] [δx]   [ -rG              ]
        [ Hx         Hy+tI+diag(s/(y+t))] [δy] = [ -rH - rC/(y+t)   ]
        δs = -(rC + s∘δy) / (y + t)
    This is algebraically identical to the dense tier (the elimination is a
    block-row substitution of the *same* regularized system), at
    (n+m)³ instead of (n+2m)³ cost.
  * Pallas blocked-LU tier: see kernels/ (later build stage).

All functions are shape-static and vmap-able.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def assemble_dense_jacobian(Gx, Gy, Hx, Hy, y, s) -> Array:
    """Materialize ∇F_z (unregularized), shape (n+2m, n+2m)."""
    n = Gx.shape[0]
    m = Hy.shape[0]
    dtype = Gx.dtype
    zero_nm = jnp.zeros((n, m), dtype)
    zero_mn = jnp.zeros((m, n), dtype)
    eye_m = jnp.eye(m, dtype=dtype)
    return jnp.block(
        [
            [Gx, Gy, zero_nm],
            [Hx, Hy, -eye_m],
            [zero_mn, jnp.diag(s), jnp.diag(y)],
        ]
    )


def newton_step_dense(Gx, Gy, Hx, Hy, y, s, rG, rH, rC, reg):
    """Full-system Newton step, matching the reference's ``∇F + tol·I``
    regularization (src/solver.jl:81) with a dense batched LU."""
    n, m = rG.shape[0], rH.shape[0]
    A = assemble_dense_jacobian(Gx, Gy, Hx, Hy, y, s)
    A = A + reg * jnp.eye(n + 2 * m, dtype=A.dtype)
    b = -jnp.concatenate([rG, rH, rC])
    dz = jnp.linalg.solve(A, b)
    return dz[:n], dz[n : n + m], dz[n + m :]


def newton_step_condensed(Gx, Gy, Hx, Hy, y, s, rG, rH, rC, reg):
    """Schur-eliminated Newton step on the (n+m) system; exact w.r.t. the
    dense tier (block-diagonal elimination of δs)."""
    n, m = rG.shape[0], rH.shape[0]
    dtype = Gx.dtype
    d = 1.0 / (y + reg)  # (Y + tI)⁻¹ diagonal
    A = jnp.block(
        [
            [Gx + reg * jnp.eye(n, dtype=dtype), Gy],
            [Hx, Hy + reg * jnp.eye(m, dtype=dtype) + jnp.diag(d * s)],
        ]
    )
    b = jnp.concatenate([-rG, -rH - d * rC])
    dxy = jnp.linalg.solve(A, b)
    dx, dy = dxy[:n], dxy[n:]
    ds = -(rC + s * dy) * d
    return dx, dy, ds


def _schur_system(Gx, Gy, Hx, y, s, rG, rH, rC, reg):
    """Shared assembly for the doubly-condensed n×n system (see
    newton_step_schur)."""
    n = rG.shape[0]
    dtype = Gx.dtype
    d = 1.0 / (y + reg)
    w = reg + d * s
    b2 = -rH - d * rC
    A = Gx + reg * jnp.eye(n, dtype=dtype) - (Gy / w[None, :]) @ Hx
    b = -rG - Gy @ (b2 / w)
    return A, b, b2, w, d


def _schur_recover(dx, Hx, b2, w, d, s, rC):
    dy = (b2 - Hx @ dx) / w
    ds = -(rC + s * dy) * d
    return dx, dy, ds


def newton_step_schur(Gx, Gy, Hx, Hy, y, s, rG, rH, rC, reg):
    """Doubly-condensed Newton step on an n×n system.

    Valid when ``Hy ≡ 0`` (H does not depend on the dual y) — true for every
    KKT-derived MCP in this framework (games stack h(x) rows; the QP bench
    has H = Ax - b) and checkable via `schur_assumption_violation`. Then the
    condensed system's lower-right block is the *diagonal* w = t + s/(y+t),
    and a second exact block elimination gives

        (Gx + tI - Gy·diag(1/w)·Hx) δx = -rG + Gy·((rH + d·rC)/w)
        δy = (-rH - d·rC - Hx δx)/w
        δs = -(rC + s∘δy)·d,          d = 1/(y+t).

    For the lane-change game this shrinks the factorization from 450³ to
    200³ while the Gy·diag·Hx reduction runs as MXU matmuls — the flops move
    from a serial LU onto the systolic array.
    """
    A, b, b2, w, d = _schur_system(Gx, Gy, Hx, y, s, rG, rH, rC, reg)
    dx = jnp.linalg.solve(A, b)
    return _schur_recover(dx, Hx, b2, w, d, s, rC)


def newton_step_schur_pallas(Gx, Gy, Hx, Hy, y, s, rG, rH, rC, reg):
    """Schur-condensed step with the n×n solve done by the Pallas in-VMEM
    Gauss-Jordan kernel (kernels/linear_solve.py) instead of XLA's LU —
    ~an order of magnitude faster per Newton iteration at solver batch
    sizes (the kernel's custom vmap rule batches the whole lane tile)."""
    from .kernels.linear_solve import gauss_solve

    A, b, b2, w, d = _schur_system(Gx, Gy, Hx, y, s, rG, rH, rC, reg)
    dx = gauss_solve(A, b)
    return _schur_recover(dx, Hx, b2, w, d, s, rC)


def newton_step_schur_pallas_gj(Gx, Gy, Hx, Hy, y, s, rG, rH, rC, reg):
    """Schur-condensed step solved by the lane-major Gauss-Jordan kernel —
    NO pivoting, so valid only when the schur matrix is SPD (symmetric Gx
    with Gy = -Hxᵀ, e.g. every convex-QP KKT system: A = M + tI + AᵀDA).
    ~1 big reduction + 1 FMA per elimination step vs QR's reflector
    machinery + back-substitution. Opt-in via linear_solver="schur_pallas_gj";
    game (nonsymmetric) systems must keep the QR tiers."""
    from .kernels.linear_solve import gj_solve

    A, b, b2, w, d = _schur_system(Gx, Gy, Hx, y, s, rG, rH, rC, reg)
    dx = gj_solve(A, b)
    return _schur_recover(dx, Hx, b2, w, d, s, rC)


def newton_step_schur_pallas_gjr(Gx, Gy, Hx, Hy, y, s, rG, rH, rC, reg):
    """EXPERIMENTAL: schur-condensed step via the lane-major Gauss-Jordan
    solve+INVERSE kernel plus one refinement matvec pair against the true
    schur matrix (kernels/linear_solve.py `_gji_lanes_kernel`).

    Measured negative result (round 5): an explicit-inverse matvec is NOT
    backward-stable — its Newton-system residual floors at ~cond(A)·ε·‖b‖
    (Higham ch. 14), so near IP convergence (w → reg, cond ≈ 1/reg) the
    feasibility residual stalls above tol and Mehrotra's factored path
    fails lanes that plain per-call GJ elimination solves. This direct
    (annealed-IP) path starts from the kernel's ELIMINATION solve and only
    refines with A⁻¹, so it certifies; the factored variant is kept for
    completeness but the SHIPPED QP tier is `schur_pallas_gj` + the
    QR-tier in-graph retry (see bench.py). SPD schur systems only."""
    from .kernels.linear_solve import gji_solve

    A, b, b2, w, d = _schur_system(Gx, Gy, Hx, y, s, rG, rH, rC, reg)
    dx0, Ainv = gji_solve(A, b)
    dx = dx0 + Ainv @ (b - A @ dx0)
    return _schur_recover(dx, Hx, b2, w, d, s, rC)


def _gmres_inner(A, b, *, tol, restart, maxiter, preconditioner):
    """Configurable GMRES on the condensed system, with an optional Jacobi
    (diagonal) right preconditioner — the IP Schur matrix's diagonal grows
    like s/(y·w) near the boundary, so diagonal scaling buys real
    iterations."""
    n = b.shape[0]
    M = None
    if preconditioner == "jacobi":
        dinv = 1.0 / jnp.where(jnp.abs(jnp.diag(A)) > 1e-30, jnp.diag(A), 1.0)
        M = lambda v: dinv * v
    elif preconditioner != "none":
        raise ValueError(f"unknown gmres preconditioner {preconditioner!r}")
    dx, _ = jax.scipy.sparse.linalg.gmres(
        lambda v: A @ v,
        b,
        tol=tol,
        restart=min(n, restart),
        maxiter=maxiter,
        M=M,
        solve_method="batched",
    )
    return dx


def newton_step_gmres(
    Gx, Gy, Hx, Hy, y, s, rG, rH, rC, reg,
    *, tol: float = 1e-8, restart: int = 50, maxiter: int = 5,
    preconditioner: str = "none",
):
    """Iterative (GMRES) Newton step on the schur-condensed system — the
    counterpart of the reference's selectable KrylovJL_GMRES linear solver
    (src/MixedComplementarityProblems.jl:8, src/solver.jl:33), with the
    reference's pluggable-algorithm depth: tolerance, restart length,
    iteration cap, and preconditioner are SolverOptions knobs
    (gmres_* fields) instead of hardcoded constants."""
    A, b, b2, w, d = _schur_system(Gx, Gy, Hx, y, s, rG, rH, rC, reg)
    dx = _gmres_inner(
        A, b, tol=tol, restart=restart, maxiter=maxiter,
        preconditioner=preconditioner,
    )
    return _schur_recover(dx, Hx, b2, w, d, s, rC)


def newton_step_tridiag(Gx, Gy, Hx, Hy, y, s, rG, rH, rC, reg, *, structure, algorithm="thomas"):
    """Schur-condensed step solved by the time-major block-tridiagonal
    factorization (kernels/block_tridiag.py). Requires the MCP's
    time_structure (trajectory games; builder-validated bandwidth). At the
    reference's N=10/horizon=30 flagship scale this replaces a 1200³ dense
    LU with 30 batched ~100³ block solves."""
    from .kernels.block_tridiag import banded_newton_step, tridiag_solve_permuted

    if structure.row_permutation is not None:
        # Band-only assembly: the Gy·diag·Hx reduction is block-diagonal in
        # time (per-time inequality rows), so skip the dense (n,m)x(m,n)
        # product entirely — at N=10/horizon-30 that's 99.9% of the
        # assembly flops.
        return banded_newton_step(
            Gx, Gy, Hx, y, s, rG, rH, rC, reg, structure, algorithm=algorithm
        )
    A, b, b2, w, d = _schur_system(Gx, Gy, Hx, y, s, rG, rH, rC, reg)
    dx = tridiag_solve_permuted(A, b, structure, algorithm=algorithm)
    return _schur_recover(dx, Hx, b2, w, d, s, rC)


def factored_newton_solver(tier: str):
    """Factor-once / solve-many variant of the Newton tiers, for algorithms
    that resolve the same KKT matrix against several right-hand sides at one
    iterate (Mehrotra predictor/corrector, iterative refinement).

    Returns ``make(Gx, Gy, Hx, Hy, y, s, reg) -> solve_f`` where
    ``solve_f(bG, bH, bC) -> (dx, dy, ds)`` solves the regularized system
    ``(∇F_z + reg·I) δ = -(bG, bH, bC)``. LU-backed tiers factor once and
    back-substitute per call; kernel/iterative tiers re-solve per call
    (their per-solve cost is already small next to the Jacobian
    evaluation)."""
    import jax.scipy.linalg as jsl

    if tier == "dense":

        def make(Gx, Gy, Hx, Hy, y, s, reg):
            n, m = Gx.shape[0], Hy.shape[0]
            A = assemble_dense_jacobian(Gx, Gy, Hx, Hy, y, s)
            lu = jsl.lu_factor(A + reg * jnp.eye(n + 2 * m, dtype=A.dtype))

            def solve_f(bG, bH, bC):
                dz = jsl.lu_solve(lu, -jnp.concatenate([bG, bH, bC]))
                return dz[:n], dz[n : n + m], dz[n + m :]

            return solve_f

    elif tier == "condensed":

        def make(Gx, Gy, Hx, Hy, y, s, reg):
            n, m = Gx.shape[0], Hy.shape[0]
            dtype = Gx.dtype
            d = 1.0 / (y + reg)
            A = jnp.block(
                [
                    [Gx + reg * jnp.eye(n, dtype=dtype), Gy],
                    [Hx, Hy + reg * jnp.eye(m, dtype=dtype) + jnp.diag(d * s)],
                ]
            )
            lu = jsl.lu_factor(A)

            def solve_f(bG, bH, bC):
                dxy = jsl.lu_solve(lu, jnp.concatenate([-bG, -bH - d * bC]))
                dx, dy = dxy[:n], dxy[n:]
                return dx, dy, -(bC + s * dy) * d

            return solve_f

    elif tier in (
        "schur", "schur_pallas", "schur_pallas_gj", "schur_pallas_gjr",
        "gmres",
    ):

        def make(Gx, Gy, Hx, Hy, y, s, reg, gmres_options=None):
            n = Gx.shape[0]
            dtype = Gx.dtype
            d = 1.0 / (y + reg)
            w = reg + d * s
            A = Gx + reg * jnp.eye(n, dtype=dtype) - (Gy / w[None, :]) @ Hx
            if tier == "schur":
                lu = jsl.lu_factor(A)
                inner = lambda b: jsl.lu_solve(lu, b)
            elif tier == "schur_pallas":
                from .kernels.linear_solve import gauss_solve

                inner = lambda b: gauss_solve(A, b)
            elif tier == "schur_pallas_gj":
                from .kernels.linear_solve import gj_solve

                inner = lambda b: gj_solve(A, b)
            elif tier == "schur_pallas_gjr":
                # Factor-once/solve-many is where the explicit inverse
                # shines: Mehrotra's predictor + corrector (+ refinement)
                # solves all reuse ONE GJ elimination; each solve is a
                # batched matvec + one refinement matvec pair.
                from .kernels.linear_solve import gji_solve

                _, Ainv = gji_solve(A, jnp.zeros_like(A[..., 0]))

                def inner(b):
                    x0 = Ainv @ b
                    return x0 + Ainv @ (b - A @ x0)

            else:
                kw = gmres_options or dict(
                    tol=1e-8, restart=50, maxiter=5, preconditioner="none"
                )
                inner = lambda b: _gmres_inner(A, b, **kw)

            def solve_f(bG, bH, bC):
                b2 = -bH - d * bC
                dx = inner(-bG - Gy @ (b2 / w))
                return _schur_recover(dx, Hx, b2, w, d, s, bC)

            return solve_f

    else:
        raise ValueError(f"no factored solver for tier {tier!r}")

    return make


def schur_assumption_violation(mcp, x, y, theta) -> float:
    """Max |∂H/∂y| — must be 0 for the "schur" tier to be exact."""
    import jax

    Hy = jax.jacfwd(lambda yy: mcp.H(x, yy, theta))(y)
    return float(jnp.max(jnp.abs(Hy))) if Hy.size else 0.0


NEWTON_STEPS = {
    "dense": newton_step_dense,
    "condensed": newton_step_condensed,
    "schur": newton_step_schur,
    "schur_pallas": newton_step_schur_pallas,
    "schur_pallas_gj": newton_step_schur_pallas_gj,
    "schur_pallas_gjr": newton_step_schur_pallas_gjr,
    "gmres": newton_step_gmres,
}


def solve_unregularized(Jz: Array, B: Array) -> Array:
    """Solve ∇F_z X = B (no regularization) — used by the IFT sensitivity
    rules (reference src/AutoDiff.jl:27-39 uses pivoted QR; LU suffices for
    the nonsingular case and a lstsq fallback is provided by callers)."""
    return jnp.linalg.solve(Jz, B)
