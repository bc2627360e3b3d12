"""Fused whole-batch Pallas block-Thomas solve.

Measured on the lane-change headline bench (v5e, B=64, T=10, b=20): the
XLA-scan block-Thomas (kernels/block_tridiag.block_thomas_solve) costs
4.7 ms per Newton iteration — 60% of the whole interior-point iteration —
in 10 sequential tiny batched LU dispatches. This kernel runs the entire
forward-eliminate/back-substitute recursion in ONE pallas_call with every
band tile resident in VMEM (~4 MB at headline shapes): per time step, the
Schur denominator ``D_t − L_t·C_{t−1}`` is formed with batched MXU matmuls
and solved against the ``[U_t | r_t − L_t·d_{t−1}]`` multi-RHS block by an
in-VMEM Householder QR (pivot-free, stable for the IP saddle blocks — same
rationale as kernels/linear_solve.py), with no per-step XLA dispatch or
HBM round-trips.

The `thomas_solve` entry point carries a custom vmap rule so the solver's
per-instance vmap lowers to one whole-batch kernel call (same pattern as
`gauss_solve`). Selected via ``SolverOptions(linear_solver="tridiag_pallas")``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _thomas_kernel(d_ref, l_ref, u_ref, r_ref, x_ref, cd_ref, *, T: int, b: int):
    """One grid step solves the whole batch tile.

    d_ref (TB,T,b,b) diagonal blocks; l_ref (TB,T,b,b) lower blocks padded
    with zeros at t=0 (l_ref[:,t] couples row t to t−1); u_ref (TB,T,b,b)
    upper blocks padded at t=T−1; r_ref (TB,T,b) RHS; x_ref (TB,T,b) out;
    cd_ref (TB,T,b,b+1) scratch holding [C_t | d_t].
    """
    dtype = x_ref.dtype
    TB = x_ref.shape[0]
    nc = 2 * b + 1  # solve columns: [C (b) | d (1)] against denom (b)
    rows = lax.broadcasted_iota(jnp.int32, (1, b), 1)  # (1, b)
    lane = lax.broadcasted_iota(jnp.int32, (1, 1, nc), 2)
    eps = jnp.asarray(1e-30, dtype)
    dnb = (((2,), (1,)), ((0,), (0,)))  # (TB,1,b) @ (TB,b,·)

    def qr_solve_aug(M):
        """Solve M[:, :, :b] X = M[:, :, b:] in place; M (TB, b, 2b+1).
        Returns X (TB, b, b+1). Same fused augmented scheme as
        linear_solve._qr_solve_aug_kernel, multi-RHS."""

        def reflect(k, M):
            onehot_l = (lane == k).astype(dtype)
            col = jnp.sum(M * onehot_l, axis=2)  # (TB, b)
            below = (rows >= k).astype(dtype)
            pivot = (rows == k).astype(dtype)
            v = col * below
            vk = jnp.sum(v * pivot, axis=1, keepdims=True)
            norm = jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True) + eps)
            sign = jnp.where(vk >= 0, 1.0, -1.0).astype(dtype)
            u = v + (sign * norm) * pivot
            beta = 1.0 / (norm * (norm + jnp.abs(vk)) + eps)
            w = lax.dot_general(u[:, None, :], M, dnb, preferred_element_type=dtype)[:, 0, :]
            return M - (beta * u)[:, :, None] * w[:, None, :]

        M = lax.fori_loop(0, b, reflect, M)

        def backsub(i, X):
            k = b - 1 - i
            row_k = jnp.sum(
                M * (rows[:, :, None] == k).astype(dtype), axis=1
            )  # (TB, nc)
            # Pure slices only: mixing None with a partial slice in one
            # __getitem__ lowers via lax.gather, which Mosaic rejects.
            row_head = row_k[:, :b]
            rkk = jnp.sum(row_head * (rows == k).astype(dtype), axis=1, keepdims=True)
            dot = lax.dot_general(
                row_head[:, None, :], X, dnb, preferred_element_type=dtype
            )[:, 0, :]  # (TB, b+1); X rows ≤ k are still zero
            xk = (row_k[:, b:] - dot) / rkk
            return X + xk[:, None, :] * (rows[:, :, None] == k).astype(dtype)

        X0 = jnp.zeros((TB, b, b + 1), dtype)
        return lax.fori_loop(0, b, backsub, X0)

    def fwd(t, _):
        D = d_ref[:, pl.ds(t, 1)][:, 0]  # (TB, b, b)
        L = l_ref[:, pl.ds(t, 1)][:, 0]
        U = u_ref[:, pl.ds(t, 1)][:, 0]
        r = r_ref[:, pl.ds(t, 1)][:, 0]  # (TB, b)
        tp = jnp.maximum(t - 1, 0)
        # Select, not multiply: the scratch is uninitialized at t=0 and
        # 0·garbage can be NaN.
        Cd_prev = jnp.where(
            t > 0, cd_ref[:, pl.ds(tp, 1)][:, 0], jnp.zeros((), dtype)
        )
        # Static lane *slices* only: integer lane indexing (e.g. [:, :, b])
        # lowers to an unsupported Mosaic gather.
        C_prev, d_prev = Cd_prev[:, :, :b], Cd_prev[:, :, b:]
        denom = D - lax.dot_general(
            L, C_prev, (((2,), (1,)), ((0,), (0,))), preferred_element_type=dtype
        )
        Ld = lax.dot_general(L, d_prev, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=dtype)
        M = jnp.concatenate([denom, U, (r[:, :, None] - Ld)], axis=2)
        cd_ref[:, pl.ds(t, 1)] = qr_solve_aug(M)[:, None]
        return 0

    lax.fori_loop(0, T, fwd, 0, unroll=False)

    def bwd(i, x_next):
        t = T - 1 - i
        Cd = cd_ref[:, pl.ds(t, 1)][:, 0]
        x_t = (
            Cd[:, :, b:]
            - lax.dot_general(
                Cd[:, :, :b], x_next[:, :, None], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=dtype,
            )
        )[:, :, 0]
        x_ref[:, pl.ds(t, 1)] = x_t[:, None]
        return x_t

    lax.fori_loop(0, T, bwd, jnp.zeros((TB, b), dtype), unroll=False)


def pallas_block_thomas(
    diag: Array,
    lower: Array,
    upper: Array,
    rhs: Array,
    *,
    batch_tile: int | None = None,
    vmem_budget_bytes: int = 10 * 2**20,
    interpret: bool | None = None,
) -> Array:
    """Batched fused block-Thomas: diag (B,T,b,b), lower/upper (B,T−1,b,b),
    rhs (B,T,b) → x (B,T,b). Batch tile defaults to the whole batch capped
    by the VMEM budget (bands + scratch)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    B, T, b, _ = diag.shape
    zero = jnp.zeros((B, 1, b, b), diag.dtype)
    lower_pad = jnp.concatenate([zero, lower], axis=1)  # [t] couples t→t−1
    upper_pad = jnp.concatenate([upper, zero], axis=1)  # [t] couples t→t+1
    if batch_tile is None:
        # Mosaic pads the last two dims to (8, 128) tiles — a (20, 20)
        # block occupies (24, 128) in VMEM. Empirically the kernel's scoped
        # VMEM is ~2 padded band-arrays per system (measured 16.2 MB at
        # B=64, T=10, b=20); budget for that and floor to a power of two.
        pad8 = -(-b // 8) * 8
        per_sys = T * pad8 * 128 * diag.dtype.itemsize * 2
        cap = max(1, min(B, vmem_budget_bytes // max(per_sys, 1)))
        batch_tile = 1 << (cap.bit_length() - 1)  # largest pow2 ≤ cap
    if B % batch_tile != 0:
        pad = batch_tile - B % batch_tile
        eyeb = jnp.broadcast_to(
            jnp.eye(b, dtype=diag.dtype), (pad, T, b, b)
        )
        diag = jnp.concatenate([diag, eyeb])
        lower_pad = jnp.concatenate(
            [lower_pad, jnp.zeros((pad, T, b, b), diag.dtype)]
        )
        upper_pad = jnp.concatenate(
            [upper_pad, jnp.zeros((pad, T, b, b), diag.dtype)]
        )
        rhs = jnp.concatenate([rhs, jnp.zeros((pad, T, b), rhs.dtype)])
        return _pallas_block_thomas_padded(
            diag, lower_pad, upper_pad, rhs, batch_tile, interpret
        )[:B]
    return _pallas_block_thomas_padded(
        diag, lower_pad, upper_pad, rhs, batch_tile, interpret
    )


def _pallas_block_thomas_padded(diag, lower_pad, upper_pad, rhs, batch_tile, interpret):
    B, T, b, _ = diag.shape
    grid = (B // batch_tile,)
    kernel = functools.partial(_thomas_kernel, T=T, b=b)
    blk4 = pl.BlockSpec(
        (batch_tile, T, b, b), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[blk4, blk4, blk4,
                  pl.BlockSpec((batch_tile, T, b), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (batch_tile, T, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, b), diag.dtype),
        scratch_shapes=[pltpu.VMEM((batch_tile, T, b, b + 1), diag.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=B * T * (2 * b**3 + 6 * b**3),
            bytes_accessed=B * T * b * b * 4 * 3,
            transcendentals=B * T * b,
        ),
        interpret=interpret,
    )(diag, lower_pad, upper_pad, rhs)


# Measured crossover (v5e, lane-change/masked-game shapes): the fused kernel
# wins while blocks are small — b=20: 724 vs 288 solves/s; b=40 (N=4 h=30):
# 60.2 vs 18.6 — because the XLA scan's cost there is 10-30 sequential tiny
# batched-LU dispatches. At b=100 (N=10 h=30) the in-kernel O(b³) pivot-free
# QR dominates and f32 accuracy degrades (0.79 vs 3.19 solves/s, success
# 0.75): the XLA batched LU is the right tool. `auto_thomas_solve`
# dispatches on the static block size at trace time.
PALLAS_THOMAS_MAX_BLOCK = 64


def auto_thomas_solve(diag: Array, lower: Array, upper: Array, rhs: Array) -> Array:
    """Block-size-aware Thomas solve: fused Pallas kernel for small blocks,
    XLA-scan block-Thomas for large ones (see crossover note above)."""
    if diag.shape[-1] <= PALLAS_THOMAS_MAX_BLOCK:
        return thomas_solve(diag, lower, upper, rhs)
    from .block_tridiag import block_thomas_solve

    return block_thomas_solve(diag, lower, upper, rhs)


@jax.custom_batching.custom_vmap
def thomas_solve(diag: Array, lower: Array, upper: Array, rhs: Array) -> Array:
    """Single-instance entry with a custom vmap rule so the solver's
    per-instance vmap reaches the kernel as one whole-batch call."""
    return pallas_block_thomas(
        diag[None], lower[None], upper[None], rhs[None]
    )[0]


@thomas_solve.def_vmap
def _thomas_solve_vmap(axis_size, in_batched, diag, lower, upper, rhs):
    ops = [diag, lower, upper, rhs]
    for i, (batched, op) in enumerate(zip(in_batched, ops)):
        if not batched:
            ops[i] = jnp.broadcast_to(op[None], (axis_size,) + op.shape)
    diag, lower, upper, rhs = ops
    lead = diag.shape[:-3]
    T, b = diag.shape[-3], diag.shape[-1]
    out = pallas_block_thomas(
        diag.reshape(-1, T, b, b),
        lower.reshape(-1, T - 1, b, b),
        upper.reshape(-1, T - 1, b, b),
        rhs.reshape(-1, T, b),
    )
    return out.reshape(*lead, T, b), True
