"""Pallas batched dense linear solve for the Newton step.

Motivation (measured on v5e, batch 64, n=200): XLA's `jnp.linalg.solve`
costs 9.1 ms per call while an equivalently-sized batched matmul costs
1.3 ms — the stock LU's serial panel steps each round-trip HBM. This kernel
keeps a whole batch tile of systems resident in VMEM and solves them with
**Householder QR + back-substitution**: n reflector steps, each a fully
vectorized (TB, n, n) masked rank-1 update on-chip, followed by n cheap
back-substitution steps. It is the "UMFPACK replacement" tier of SURVEY.md
§2.3 — the per-iteration Newton solve `∇F δz = -F` done TPU-natively
(reference src/solver.jl:79-90).

QR (not LU): interior-point Newton matrices are saddle-point systems whose
equality-dual rows carry ~tol diagonals — pivot-free elimination explodes,
and per-batch-element row pivoting needs dynamic cross-sublane gathers the
TPU dislikes. Householder QR is unconditionally stable with no pivoting at
~2x the flops, and every step is expressible as one-hot reductions +
broadcasted FMAs over the whole batch tile.

Layout notes (TPU): the last dim (lanes) holds matrix columns; dynamic
*sublane* indexing (row k) is cheap, dynamic *lane* indexing (column k) is
not — column extraction uses a one-hot lane reduction instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _qr_solve_kernel(a_ref, b_ref, out_ref, *, n: int):
    """In-VMEM Householder-QR solve of A x = b for one batch tile."""
    A = a_ref[...]  # (TB, n, n)
    b = b_ref[...]  # (TB, n)
    dtype = A.dtype
    rows = lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
    lane = lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
    eps = jnp.asarray(1e-30, dtype)

    def reflect(k, carry):
        A, b = carry
        onehot_l = (lane == k).astype(dtype)  # (1, 1, n)
        # column k, zero above the diagonal: v = A[:, k:, k]
        col = jnp.sum(A * onehot_l, axis=2)  # (TB, n)
        below = (rows[:, :, 0] >= k).astype(dtype)  # (1, n)
        v = col * below
        vk = jnp.sum(v * (rows[:, :, 0] == k).astype(dtype), axis=1, keepdims=True)
        norm = jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True) + eps)
        sign = jnp.where(vk >= 0, 1.0, -1.0).astype(dtype)
        alpha = -sign * norm  # R[k, k] after reflection
        # u = v - alpha e_k ; beta = 2 / (u·u)
        u = v - alpha * (rows[:, :, 0] == k).astype(dtype)
        uu = jnp.sum(u * u, axis=1, keepdims=True)
        beta = jnp.where(uu > eps, 2.0 / (uu + eps), 0.0)
        # A <- A - beta u (uᵀ A);  b <- b - beta u (uᵀ b)
        # uᵀA as a batched MXU matvec: a VPU sublane-axis reduction over n
        # rows is ~25 shifted adds per vreg, while the MXU does the (1, n) @
        # (n, n) contraction directly (M-padding waste included, it measures
        # several times faster in-kernel).
        w = jax.lax.dot_general(
            u[:, None, :],
            A,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=dtype,
        )[:, 0, :]  # (TB, n)
        A = A - (beta[:, :, None] * u[:, :, None]) * w[:, None, :]
        ub = jnp.sum(u * b, axis=1, keepdims=True)
        b = b - (beta * ub) * u
        return A, b

    A, b = lax.fori_loop(0, n, reflect, (A, b))

    # Back substitution on the upper-triangular R: x_k = (b_k - R[k,k+1:]·x)/R[k,k].
    # Mosaic has no dynamic_slice on loop-carried values, so R is parked back
    # in the input ref (its VMEM working copy — never written to HBM) and
    # rows are read with pl.ds (cheap sublane index). Reusing a_ref instead
    # of a scratch buffer halves the kernel's VMEM footprint, allowing
    # batch_tile=32 within the 16 MB budget.
    a_ref[...] = A
    x0 = jnp.zeros_like(b)

    def backsub(i, x):
        k = n - 1 - i
        onehot_l = (lane[0] == k).astype(dtype)  # (1, n)
        row_k = a_ref[:, pl.ds(k, 1), :][:, 0, :]  # (TB, n)
        rkk = jnp.sum(row_k * onehot_l, axis=1, keepdims=True)
        bk = jnp.sum(b * onehot_l, axis=1, keepdims=True)
        dot = jnp.sum(row_k * x, axis=1, keepdims=True)  # x is 0 at j <= k
        xk = (bk - dot) / rkk
        return x + xk * onehot_l

    x = lax.fori_loop(0, n, backsub, x0)
    out_ref[...] = x


@jax.custom_batching.custom_vmap
def gauss_solve(A: Array, b: Array) -> Array:
    """Single-system entry point for the Pallas solver, with a custom vmap
    rule so `vmap(gauss_solve)` lowers to ONE whole-batch kernel call — the
    interior-point loop is vmapped per instance, but the Newton solves must
    reach the kernel as a full batch tile to amortize the serial
    factorization steps across lanes."""
    return pallas_gauss_solve(A[None], b[None], batch_tile=1)[0]


@gauss_solve.def_vmap
def _gauss_solve_vmap(axis_size, in_batched, A, b):
    A_batched, b_batched = in_batched
    if not A_batched:
        A = jnp.broadcast_to(A[None], (axis_size,) + A.shape)
    if not b_batched:
        b = jnp.broadcast_to(b[None], (axis_size,) + b.shape)
    # Flatten any extra leading dims (nested vmap) into one batch axis.
    lead = A.shape[:-2]
    n = A.shape[-1]
    out = pallas_gauss_solve(A.reshape(-1, n, n), b.reshape(-1, n))
    return out.reshape(*lead, n), True


def pallas_gauss_solve(
    A: Array,
    b: Array,
    *,
    batch_tile: int = 16,
    interpret: bool | None = None,
) -> Array:
    """Solve A @ x = b for a batch of dense systems via in-VMEM Householder
    QR. A: (B, n, n); b: (B, n). Batches not divisible by batch_tile are
    padded with identity systems. On non-TPU backends the kernel runs in
    interpreter mode (tests/dev)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    B, n, _ = A.shape
    if B % batch_tile != 0:
        pad = batch_tile - B % batch_tile
        A = jnp.concatenate([A, jnp.tile(jnp.eye(n, dtype=A.dtype)[None], (pad, 1, 1))])
        b = jnp.concatenate([b, jnp.zeros((pad, n), b.dtype)])
        return pallas_gauss_solve(
            A, b, batch_tile=batch_tile, interpret=interpret
        )[:B]

    grid = (B // batch_tile,)
    kernel = functools.partial(_qr_solve_kernel, n=n)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((batch_tile, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (batch_tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, n), A.dtype),
        cost_estimate=pl.CostEstimate(
            flops=6 * B * n * n * n,  # QR ≈ 2x LU + back-substitution
            bytes_accessed=B * n * n * 4 + 2 * B * n * 4,
            transcendentals=B * n,  # one sqrt per reflector
        ),
        interpret=interpret,
    )(A, b)
