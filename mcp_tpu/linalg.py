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


NEWTON_STEPS = {
    "dense": newton_step_dense,
    "condensed": newton_step_condensed,
}


def solve_unregularized(Jz: Array, B: Array) -> Array:
    """Solve ∇F_z X = B (no regularization) — used by the IFT sensitivity
    rules (reference src/AutoDiff.jl:27-39 uses pivoted QR; LU suffices for
    the nonsingular case and a lstsq fallback is provided by callers)."""
    return jnp.linalg.solve(Jz, B)
