"""Batched block-tridiagonal solve (Thomas algorithm) for trajectory-game
KKT systems.

The schur-condensed n×n Newton matrix of a trajectory game is block
tridiagonal when its variables are reordered time-major (SURVEY.md §5, the
"long-context analog"): stage costs and per-time inequality rows couple only
within a time step, and dynamics-defect duals couple adjacent steps. With
T time blocks of size b (= joint state + control + defect-dual dims),
factorization cost drops from O((Tb)³) to O(T·b³) and the serial dependency
chain from Tb scalar-pivot steps to T block steps — at the reference's
flagship N=10, horizon=30 scale that is the difference between a 1200³ dense
LU and 30 batched 100³ block solves.

Sequential (Thomas) recursion, batched over instances via vmap; a cyclic-
reduction variant (log T chain, horizon-shardable over ICI with ppermute
neighbor exchanges) is the planned multi-chip extension.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


class TimeStructure(NamedTuple):
    """Static time-major reordering metadata for a trajectory-game MCP.

    permutation: tuple of ints, length n — time-major index i holds
      original-unconstrained index permutation[i].
    num_blocks: T (time steps).
    block_size: b = state_total + control_total + defect-dual rows per step.
    """

    permutation: tuple[int, ...]
    num_blocks: int
    block_size: int


def extract_blocks(A_perm: Array, T: int, b: int):
    """(Tb, Tb) → (diag (T,b,b), lower (T-1,b,b), upper (T-1,b,b))."""
    A4 = A_perm.reshape(T, b, T, b)
    idx = jnp.arange(T)
    diag = A4[idx, :, idx, :]
    lower = A4[idx[1:], :, idx[:-1], :]
    upper = A4[idx[:-1], :, idx[1:], :]
    return diag, lower, upper


def block_thomas_solve(diag: Array, lower: Array, upper: Array, rhs: Array) -> Array:
    """Solve the block-tridiagonal system for one instance.

    diag: (T, b, b); lower/upper: (T-1, b, b); rhs: (T, b) → x: (T, b).
    Standard block-Thomas: forward eliminate with per-block dense solves
    (XLA LU on b×b), backward substitute. vmap for batches.
    """
    T, b_dim, _ = diag.shape

    def fwd(carry, inp):
        C_prev, d_prev = carry
        D_t, L_t, U_t, r_t = inp
        denom = D_t - L_t @ C_prev
        rhs_blk = jnp.concatenate([U_t, (r_t - L_t @ d_prev)[:, None]], axis=1)
        sol = jnp.linalg.solve(denom, rhs_blk)
        C_t, d_t = sol[:, :b_dim], sol[:, b_dim]
        return (C_t, d_t), (C_t, d_t)

    zero_blk = jnp.zeros((b_dim, b_dim), diag.dtype)
    # Pad lower/upper so every scan step has uniform operands; step 0 uses
    # L=0, the last step uses U=0.
    L = jnp.concatenate([zero_blk[None], lower], axis=0)  # (T, b, b)
    U = jnp.concatenate([upper, zero_blk[None]], axis=0)  # (T, b, b)

    (_, _), (Cs, ds) = lax.scan(
        fwd, (zero_blk, jnp.zeros((b_dim,), diag.dtype)), (diag, L, U, rhs)
    )

    def bwd(x_next, inp):
        C_t, d_t = inp
        x_t = d_t - C_t @ x_next
        return x_t, x_t

    _, xs_rev = lax.scan(
        bwd, jnp.zeros((b_dim,), diag.dtype), (Cs, ds), reverse=True
    )
    return xs_rev


def tridiag_solve_permuted(A: Array, rhs: Array, structure: TimeStructure) -> Array:
    """Solve A x = rhs for one instance by permuting to time-major block
    tridiagonal form. Entries of A outside the tridiagonal band are ignored
    (they are structurally zero for trajectory-game schur systems; the
    builder validates this once at compile time)."""
    perm = jnp.asarray(structure.permutation)
    T, b = structure.num_blocks, structure.block_size
    A_perm = A[perm][:, perm]
    r_perm = rhs[perm]
    diag, lower, upper = extract_blocks(A_perm, T, b)
    x_perm = block_thomas_solve(diag, lower, upper, r_perm.reshape(T, b)).reshape(-1)
    inv = jnp.zeros_like(perm).at[perm].set(jnp.arange(perm.shape[0]))
    return x_perm[inv]
