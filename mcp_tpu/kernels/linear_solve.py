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
            preferred_element_type=dtype, precision=lax.Precision.HIGHEST,
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


def _wy_qr_solve_kernel(a_ref, b_ref, out_ref, *, n: int, nb: int):
    """Blocked-panel (compact-WY) Householder-QR solve of A x = b.

    The unblocked kernel above performs n serial reflector steps, each a
    rank-1 update of the whole (TB, n, n) tile — the serial chain is the
    measured bound. Here each panel of ``nb`` columns is factored with
    reflectors confined to a (TB, n, nb) slab (nb serial steps, each ~n/nb
    cheaper), while the accumulated block reflector ``Q = I − U T Uᵀ``
    (LAPACK larft forward/columnwise convention) hits the trailing matrix
    once per panel as three batched MXU matmuls: ``A ← A − U·(Tᵀ·(UᵀA))``.
    Requires n % nb == 0 (caller pads with identity rows/columns).

    The panel loop is unrolled statically so each panel is a *static* lane
    slice (free) rather than a one-hot extraction matmul (n³ extra MACs),
    and the factored panel is NOT re-embedded: the full-width WY update
    applied to the original panel columns produces exactly the factored
    panel (same Householder product), so the total MXU work is the minimal
    2n³ of blocked QR.
    """
    A = a_ref[...]  # (TB, n, n)
    b = b_ref[...]  # (TB, n)
    dtype = A.dtype
    rows = lax.broadcasted_iota(jnp.int32, (1, n), 1)  # (1, n)
    lane = lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
    lane_nb = lax.broadcasted_iota(jnp.int32, (1, 1, nb), 2)
    rows_nb = lax.broadcasted_iota(jnp.int32, (1, nb, 1), 1)
    eps = jnp.asarray(1e-30, dtype)
    dn = (((2,), (1,)), ((0,), (0,)))  # (TB,1,n) @ (TB,n,·) row-vector matmul

    def reflect_panel(k, carry):
        """One Householder step on panel column k; updates only the panel."""
        P, U, T, j0 = carry
        grow = j0 + k  # global pivot row
        onehot_nb = (lane_nb == k).astype(dtype)  # (1, 1, nb)
        col = jnp.sum(P * onehot_nb, axis=2)  # (TB, n)
        v = col * (rows >= grow).astype(dtype)
        pivot = (rows == grow).astype(dtype)
        vk = jnp.sum(v * pivot, axis=1, keepdims=True)
        norm = jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True) + eps)
        sign = jnp.where(vk >= 0, 1.0, -1.0).astype(dtype)
        alpha = -sign * norm
        u = v - alpha * pivot
        uu = jnp.sum(u * u, axis=1, keepdims=True)
        beta = jnp.where(uu > eps, 2.0 / (uu + eps), 0.0)
        w = lax.dot_general(u[:, None, :], P, dn, preferred_element_type=dtype, precision=lax.Precision.HIGHEST)[:, 0, :]
        P = P - (beta[:, :, None] * u[:, :, None]) * w[:, None, :]
        # larft column append: T[:, :k, k] = −β·T·(Uᵀu); T[k, k] = β.
        # U columns ≥ k are still zero, so Uᵀu vanishes there on its own.
        utu = lax.dot_general(u[:, None, :], U, dn, preferred_element_type=dtype, precision=lax.Precision.HIGHEST)[:, 0, :]
        z = -beta * lax.dot_general(
            T, utu[:, :, None], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=dtype, precision=lax.Precision.HIGHEST,
        )[:, :, 0]  # (TB, nb)
        col_k = (lane_nb == k).astype(dtype)  # (1, 1, nb)
        row_k = (rows_nb == k).astype(dtype)  # (1, nb, 1)
        T = T + z[:, :, None] * col_k + beta[:, :, None] * (row_k * col_k)
        U = U + u[:, :, None] * col_k
        return P, U, T, j0

    for p in range(n // nb):  # static unroll: panel slices are static
        j0 = p * nb
        P = A[:, :, j0 : j0 + nb]
        U0 = jnp.zeros((A.shape[0], n, nb), dtype)
        T0 = jnp.zeros((A.shape[0], nb, nb), dtype)
        _, U, T, _ = lax.fori_loop(0, nb, reflect_panel, (P, U0, T0, j0))
        # Trailing update Qᵀ·A = A − U·(Tᵀ·(UᵀA)). Columns left of the panel
        # are already upper-triangular and U has no support on their nonzero
        # rows, so updating the full tile is a (numerical) no-op there; the
        # panel columns themselves come out as the factored panel.
        Z = lax.dot_general(U, A, (((1,), (1,)), ((0,), (0,))), preferred_element_type=dtype, precision=lax.Precision.HIGHEST)
        W = lax.dot_general(T, Z, (((1,), (1,)), ((0,), (0,))), preferred_element_type=dtype, precision=lax.Precision.HIGHEST)
        A = A - lax.dot_general(U, W, (((2,), (1,)), ((0,), (0,))), preferred_element_type=dtype, precision=lax.Precision.HIGHEST)
        zb = lax.dot_general(b[:, None, :], U, dn, preferred_element_type=dtype, precision=lax.Precision.HIGHEST)[:, 0, :]
        wb = lax.dot_general(T, zb[:, :, None], (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=dtype, precision=lax.Precision.HIGHEST)[:, :, 0]
        b = b - lax.dot_general(U, wb[:, :, None], (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=dtype, precision=lax.Precision.HIGHEST)[:, :, 0]

    # Back substitution (same scheme as the unblocked kernel: R parked in the
    # input ref's VMEM working copy, rows read via cheap sublane ds).
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


def _qr_solve_aug_kernel(a_ref, out_ref, *, n: int):
    """Fused single-tile Householder-QR solve on the augmented [A | b].

    Measured bound of the unblocked/WY kernels at lane-change sizes is the
    *serial op chain* (~9 small ops × n columns × B/TB grid steps), not
    flops. This kernel attacks the chain three ways:
      * the RHS rides as column n of the tile, so its reflector application
        is fused into the matrix matvec/rank-1 ops (2 fewer ops/column);
      * β = 1/(‖v‖(‖v‖+|v_k|)) algebraically (one fewer n-length reduction);
      * all updates go through a_ref in place (no loop-carried value copy),
        halving VMEM so the whole solver batch fits one grid step — B/TB
        times fewer serial chains than the tiled variants.
    """
    dtype = out_ref.dtype
    rows = lax.broadcasted_iota(jnp.int32, (1, n), 1)  # (1, n)
    lane = lax.broadcasted_iota(jnp.int32, (1, 1, n + 1), 2)
    eps = jnp.asarray(1e-30, dtype)
    dn = (((2,), (1,)), ((0,), (0,)))

    def reflect(k, _):
        A = a_ref[...]  # (TB, n, n+1) — VMEM working copy, read per op
        onehot_l = (lane == k).astype(dtype)
        col = jnp.sum(A * onehot_l, axis=2)  # (TB, n)
        below = (rows >= k).astype(dtype)
        pivot = (rows == k).astype(dtype)
        v = col * below
        vk = jnp.sum(v * pivot, axis=1, keepdims=True)
        norm2 = jnp.sum(v * v, axis=1, keepdims=True)
        norm = jnp.sqrt(norm2 + eps)
        sign = jnp.where(vk >= 0, 1.0, -1.0).astype(dtype)
        u = v + (sign * norm) * pivot
        # u·u = 2‖v‖(‖v‖+|v_k|) exactly, so no third reduction is needed.
        beta = 1.0 / (norm * (norm + jnp.abs(vk)) + eps)
        w = lax.dot_general(u[:, None, :], A, dn, preferred_element_type=dtype, precision=lax.Precision.HIGHEST)[:, 0, :]
        a_ref[...] = A - (beta * u)[:, :, None] * w[:, None, :]
        return 0

    lax.fori_loop(0, n, reflect, 0)

    # Back substitution; b is lane column n of the (upper-triangular) tile.
    bcol = (lane[0] == n).astype(dtype)  # (1, n+1)
    x0 = jnp.zeros((out_ref.shape[0], n + 1), dtype)

    def backsub(i, x):
        k = n - 1 - i
        onehot_l = (lane[0] == k).astype(dtype)
        row_k = a_ref[:, pl.ds(k, 1), :][:, 0, :]  # (TB, n+1)
        rkk = jnp.sum(row_k * onehot_l, axis=1, keepdims=True)
        bk = jnp.sum(row_k * bcol, axis=1, keepdims=True)
        dot = jnp.sum(row_k * x, axis=1, keepdims=True)  # x is 0 at j <= k and at lane n
        xk = (bk - dot) / rkk
        return x + xk * onehot_l

    x = lax.fori_loop(0, n, backsub, x0)
    out_ref[...] = x[:, :n]


def pallas_qr_solve_fused(
    A: Array,
    b: Array,
    *,
    batch_tile: int | None = None,
    vmem_budget_bytes: int = 12 * 2**20,
    interpret: bool | None = None,
) -> Array:
    """Augmented in-place QR solve (see `_qr_solve_aug_kernel`). By default
    the batch tile is the whole batch, capped so the tile fits the scoped
    VMEM budget — one grid step means one serial reflector chain total."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    B, n, _ = A.shape
    if batch_tile is None:
        # Budget against MOSAIC-PADDED tiles ((8, 128) granularity) times a
        # 3x factor for in/out copies + kernel temporaries — the raw
        # n·(n+1) accounting under-counted ~4x and OOM'd scoped VMEM at
        # B=256, n=100 (38.98 MiB actual vs 16 MiB default limit, QP suite
        # schur_pallas tier, round 3).
        sub8 = -(-n // 8) * 8
        lane128 = -(-(n + 1) // 128) * 128
        per_sys = 3 * sub8 * lane128 * A.dtype.itemsize
        batch_tile = max(1, min(B, vmem_budget_bytes // max(per_sys, 1)))
        if batch_tile < B:
            # A partial tile must be (8, 128)-divisible in its trailing
            # dims (Mosaic block rule); the batch axis is second-to-last
            # in the (tile, n) output block.
            batch_tile = min(B, max(8, batch_tile // 8 * 8))
            if batch_tile * per_sys > vmem_budget_bytes:
                # The forced floor of 8 exceeds the stated budget (large n):
                # don't silently rely on the raised hard limit — warn so the
                # budget parameter stays meaningful (ADVICE r3).
                import warnings

                warnings.warn(
                    f"pallas_qr_solve_fused: minimum batch tile 8 needs "
                    f"{8 * per_sys / 2**20:.1f} MiB VMEM, over the "
                    f"{vmem_budget_bytes / 2**20:.1f} MiB budget; relying on "
                    "the kernel's raised vmem_limit_bytes.",
                    stacklevel=2,
                )
    if B % batch_tile != 0:
        pad = batch_tile - B % batch_tile
        A = jnp.concatenate([A, jnp.tile(jnp.eye(n, dtype=A.dtype)[None], (pad, 1, 1))])
        b = jnp.concatenate([b, jnp.zeros((pad, n), b.dtype)])
        return pallas_qr_solve_fused(
            A, b, batch_tile=batch_tile, interpret=interpret
        )[:B]

    Aaug = jnp.concatenate([A, b[:, :, None]], axis=2)
    grid = (B // batch_tile,)
    kernel = functools.partial(_qr_solve_aug_kernel, n=n)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (batch_tile, n, n + 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (batch_tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, n), A.dtype),
        cost_estimate=pl.CostEstimate(
            flops=6 * B * n * n * n,
            bytes_accessed=B * n * (n + 1) * 4 + B * n * 4,
            transcendentals=B * n,
        ),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(Aaug)


def pallas_wy_solve(
    A: Array,
    b: Array,
    *,
    batch_tile: int = 16,
    panel: int = 8,
    interpret: bool | None = None,
) -> Array:
    """Blocked-panel WY variant of :func:`pallas_gauss_solve`. A: (B, n, n),
    b: (B, n). n is padded up to a multiple of ``panel`` with identity
    rows/columns (trailing pad: real-panel reflectors never touch it)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    B, n, _ = A.shape
    if n % panel != 0:
        npad = (panel - n % panel) % panel
        A = jnp.concatenate(
            [A, jnp.zeros((B, n, npad), A.dtype)], axis=2
        )
        tail = jnp.concatenate(
            [jnp.zeros((npad, n), A.dtype), jnp.eye(npad, dtype=A.dtype)], axis=1
        )
        A = jnp.concatenate([A, jnp.tile(tail[None], (B, 1, 1))], axis=1)
        b = jnp.concatenate([b, jnp.zeros((B, npad), b.dtype)], axis=1)
        return pallas_wy_solve(
            A, b, batch_tile=batch_tile, panel=panel, interpret=interpret
        )[:, :n]
    if B % batch_tile != 0:
        pad = batch_tile - B % batch_tile
        A = jnp.concatenate([A, jnp.tile(jnp.eye(n, dtype=A.dtype)[None], (pad, 1, 1))])
        b = jnp.concatenate([b, jnp.zeros((pad, n), b.dtype)])
        return pallas_wy_solve(
            A, b, batch_tile=batch_tile, panel=panel, interpret=interpret
        )[:B]

    grid = (B // batch_tile,)
    kernel = functools.partial(_wy_qr_solve_kernel, n=n, nb=panel)
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
            flops=8 * B * n * n * n,  # panel factor + 3 WY matmuls + backsub
            bytes_accessed=B * n * n * 4 + 2 * B * n * 4,
            transcendentals=B * n,
        ),
        interpret=interpret,
    )(A, b)


def _lanes_route_ok(
    n: int, dtype, *, lane_width: int = 128,
    vmem_budget_bytes: int = 96 * 2**20,
) -> bool:
    """Route guard for the lane-major kernels (ADVICE r4): the whole
    (n8+1, n8, lane_width) group block must fit the scoped-VMEM budget
    (×3 for the input copy + working values, matching the fused kernel's
    accounting) and Mosaic is f32-only — beyond that the batch-tiled fused
    kernel (which adapts its tile to a budget) is the safe path."""
    if jnp.dtype(dtype).itemsize != 4:
        return False
    n8 = -(-n // 8) * 8
    return 3 * (n8 + 1) * n8 * lane_width * 4 <= vmem_budget_bytes


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
    Bflat = 1
    for d in lead:
        Bflat *= d
    if Bflat >= 128 and _lanes_route_ok(n, A.dtype):
        # Lane-major kernel: batch on the 128-lane axis, every reflector
        # pass 100% dense (measured r4, QP n=100 B=256: 8.9 → see
        # benchmarks_round4.json; the batch-major kernels run the serial
        # chain over Mosaic-padded row tiles at ~0.06 Tflop/s). Guarded
        # (ADVICE r4): the whole (n8+1, n8, 128) group block must fit the
        # kernel's VMEM budget, and Mosaic kernels are f32-only — large-n
        # or non-f32 batches fall back to the fused kernel, which adapts
        # its batch tile against a budget.
        out = pallas_qr_lanes_solve(A.reshape(-1, n, n), b.reshape(-1, n))
        return out.reshape(*lead, n), True
    # Fused augmented kernel: one whole-batch grid step (measured 18-20%
    # faster than the tiled rank-1 kernel at lane-change sizes; both beat
    # the WY blocked variant, which cannot shorten the serial chain).
    out = pallas_qr_solve_fused(A.reshape(-1, n, n), b.reshape(-1, n))
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


# -- Lane-major ("batch-on-lanes") variant --------------------------------


def _qr_lanes_kernel(m_ref, x_ref, *, n8: int):
    """Lane-major Householder-QR solve: one 128-lane group of systems.

    m_ref: (1, n8+1, n8, 128) COLUMN storage — m[0, j] is matrix column j
    (rows on sublanes) for j < n8, m[0, n8] is the RHS column; 128 systems
    ride the lane axis, so every tile is 100% dense and every reflector is
    two full vector passes over the block with no cross-lane ops. Same
    layout insight as the lane-major Thomas kernel (thomas_pallas.py
    `_thomas_kernel_lanes`): the batch-major QR kernel puts rows on
    sublanes and columns on lanes, which at n=100 runs at ~0.06 Tflop/s —
    the serial reflector chain does Mosaic-padded row work; here the same
    chain does dense (n8+1, n8, 128) FMAs.
    """
    M = m_ref[0]  # (n8+1, n8, LB)
    dtype = M.dtype
    LB = M.shape[-1]
    eps = jnp.asarray(1e-30, dtype)
    srow = lax.broadcasted_iota(jnp.int32, (n8, LB), 0)

    for k in range(n8):  # static unroll: every slice is compile-time
        col = M[k]  # (n8, LB)
        below = (srow >= k).astype(dtype)
        pivm = (srow == k).astype(dtype)
        v = col * below
        # Static sublane slice (round 5): the pivot element needs no masked
        # reduction — below[k] = 1 so v[k] = col[k]. Leaves 2 reductions
        # per reflector (norm + the uᵀM contraction) instead of 3.
        vk = col[k : k + 1]  # (1, LB)
        norm = jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True) + eps)
        sign = jnp.where(vk >= 0, 1.0, -1.0).astype(dtype)
        u = v + (sign * norm) * pivm
        beta = 1.0 / (norm * (norm + jnp.abs(vk)) + eps)  # (1, LB)
        w = jnp.sum(M * u[None], axis=1, keepdims=True)  # (n8+1, 1, LB)
        M = M - (beta[None] * w) * u[None]

    # Back substitution: R columns are M[:n8], Q'b is M[n8:] (1, n8, LB).
    # Pivot extractions are static slices (no masked reductions).
    Q = M[n8:]
    for k in range(n8 - 1, -1, -1):
        rk = M[k]
        pivm = (srow == k).astype(dtype)
        strict = (srow < k).astype(dtype)
        rkk = rk[k : k + 1]  # (1, LB)
        qk = Q[:, k : k + 1]  # (1, 1, LB)
        xk = qk / rkk[None]
        Q = jnp.where(pivm[None] > 0, xk, Q - xk * (rk * strict)[None])
    x_ref[0] = Q[0]


def pallas_qr_lanes_solve(
    A: Array,
    b: Array,
    *,
    lane_width: int | None = None,
    interpret: bool | None = None,
) -> Array:
    """Batch-on-lanes QR solve of A x = b. A: (B, n, n), b: (B, n).

    B pads to a multiple of `lane_width` with identity systems; n pads to a
    multiple of 8 with decoupled identity rows. Measured motivation
    (benchmarks_round4.json, QP n=100 B=256): the batch-major fused QR
    kernel runs at 8.9 ms/solve-batch (~0.06 Tflop/s) because each
    reflector's row work lives on Mosaic-padded sublanes; the lane-major
    layout makes every pass dense. `lane_width` defaults to 128 (LB=256
    measured within 3% at QP scale while doubling the VMEM footprint —
    benchmarks_round4.json qp_kernel_variant_ab; pass 256 to override).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    B, n, _ = A.shape
    if lane_width is None:
        # Measured on-chip (QP n=100 B=256): LB=256 is within 3% of LB=128
        # — the serial chain is no longer the bound at this scale — so the
        # default stays 128 (half the VMEM footprint).
        lane_width = 128
    M, n8, Bp, G = _lanes_pack(A, b, lane_width)
    out = _lanes_call(
        _qr_lanes_kernel, M, n8, Bp, G, lane_width, A.dtype,
        4 * Bp * n8 * n8 * n8, interpret,
    )
    return out[:B, :n]


def _gj_lanes_kernel(m_ref, x_ref, *, n8: int):
    """Lane-major Gauss-Jordan solve (no pivoting): one lane group.

    Same column storage as `_qr_lanes_kernel`. One elimination step costs
    ZERO cross-sublane reductions: the step loop is Python-unrolled, so the
    pivot element and pivot row are STATIC sublane slices (round 5 — the
    round-4 masked version paid one full masked slab-reduction per step,
    and the QP roofline showed per-step Mosaic op overhead at ~28 µs where
    the dense FMA work is ~1.5 µs, logs/tpu_queue_r4k). What remains per
    step is one broadcasted FMA over the slab + the pivot-row normalize.
    Valid when no-pivot elimination is stable: the QP suite's schur matrix
    M + tI + AᵀDA is SPD, where GJ is backward-stable in practice; do NOT
    use on saddle/nonsymmetric game systems (that is what the QR kernels
    are for — see the module docstring's pivoting discussion).
    """
    M = m_ref[0]  # (n8+1, n8, LB)
    dtype = M.dtype
    LB = M.shape[-1]
    eps = jnp.asarray(1e-30, dtype)
    srow = lax.broadcasted_iota(jnp.int32, (n8, LB), 0)

    for k in range(n8):  # static unroll: every slice is compile-time
        colk = M[k]  # (n8, LB)
        p = colk[k : k + 1]  # (1, LB) — static sublane slice, no reduction
        inv = 1.0 / jnp.where(jnp.abs(p) > eps, p, eps)
        pivm = (srow == k).astype(dtype)
        f = colk * inv  # multipliers (f[k] = 1)
        rowk = M[:, k : k + 1, :]  # (n8+1, 1, LB) — static slice
        fm = jnp.where(pivm > 0, jnp.zeros((), dtype), f)
        M = M - fm[None] * rowk
        M = jnp.where(pivm[None] > 0, rowk * inv, M)
    x_ref[0] = M[n8]


def _lanes_pack(A, b, LB):
    """Shared host-side packing for the lane-major kernels: pad n to a
    multiple of 8 (decoupled identity rows) and B to a multiple of LB
    (identity systems); return column-storage M (G, n8+1, n8, LB)."""
    B, n, _ = A.shape
    dtype = A.dtype
    n8 = -(-n // 8) * 8
    if n8 > n:
        p = n8 - n
        A = jnp.concatenate([A, jnp.zeros((B, n, p), dtype)], axis=2)
        tail = jnp.concatenate(
            [jnp.zeros((p, n), dtype), jnp.eye(p, dtype=dtype)], axis=1
        )
        A = jnp.concatenate([A, jnp.tile(tail[None], (B, 1, 1))], axis=1)
        b = jnp.concatenate([b, jnp.zeros((B, p), dtype)], axis=1)
    if B % LB != 0:
        pad = LB - B % LB
        A = jnp.concatenate(
            [A, jnp.tile(jnp.eye(n8, dtype=dtype)[None], (pad, 1, 1))]
        )
        b = jnp.concatenate([b, jnp.zeros((pad, n8), dtype)])
    Bp = A.shape[0]
    G = Bp // LB
    Acol = jnp.transpose(A.reshape(G, LB, n8, n8), (0, 3, 2, 1))
    rhs = jnp.transpose(b.reshape(G, LB, n8), (0, 2, 1))[:, None]
    return jnp.concatenate([Acol, rhs], axis=1), n8, Bp, G


def _lanes_call(kernel_fn, M, n8, Bp, G, LB, dtype, flops, interpret,
                transcendentals=None):
    kernel = functools.partial(kernel_fn, n8=n8)
    # Cost hints only (scheduling): element size follows the dtype (f64
    # interpret runs exist) and transcendentals default to one sqrt per
    # reflector — the GJ kernel passes 0 (ADVICE r4).
    esz = jnp.dtype(dtype).itemsize
    x = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(
                (1, n8 + 1, n8, LB), lambda g: (g, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, n8, LB), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((G, n8, LB), dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=Bp * n8 * n8 * esz + 2 * Bp * n8 * esz,
            transcendentals=(
                Bp * n8 if transcendentals is None else transcendentals
            ),
        ),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
        interpret=interpret,
    )(M)
    return jnp.transpose(x, (0, 2, 1)).reshape(Bp, n8)


def _gji_lanes_kernel(m_ref, x_ref, inv_ref, *, n8: int):
    """Lane-major Gauss-Jordan solve + explicit inverse (no pivoting).

    m_ref: (1, 2·n8+1, n8, LB) column storage — pages 0..n8-1 hold A's
    columns, page n8 the RHS, pages n8+1..2·n8 the identity. Full GJ
    elimination leaves x on page n8 and A⁻¹'s columns on the identity
    pages.

    Two design points vs `_gj_lanes_kernel` (both measured motivations from
    the round-4 QP roofline: ~28 µs of per-step Mosaic op overhead against
    ~1.5 µs of dense FMA work, logs/tpu_queue_r4k):
      * pivot-row/pivot-element extraction is a STATIC sublane slice — the
        step loop is Python-unrolled, so no masked cross-sublane reduction
        is needed at all (the QR kernels pay 3 reductions per step, the
        masked GJ kernel 1);
      * eliminating the identity block alongside costs only wider
        elementwise passes (the latency-bound regime's cheap axis), and the
        resulting A⁻¹ makes iterative refinement and Mehrotra's
        several-solves-per-iterate pattern a handful of batched MXU
        matvecs instead of new factorizations — which is what lets the
        no-pivot kernel CERTIFY (VERDICT r4 item 3: plain GJ dropped
        certification on ~1/256 lanes; one refinement against the true
        matrix recovers it).

    SPD systems only (convex-QP schur matrices), like `_gj_lanes_kernel`.
    """
    M = m_ref[0]  # (2·n8+1, n8, LB)
    dtype = M.dtype
    eps = jnp.asarray(1e-30, dtype)
    srow = lax.broadcasted_iota(jnp.int32, (n8, M.shape[-1]), 0)

    for k in range(n8):  # static unroll: every slice below is compile-time
        colk = M[k]  # (n8, LB)
        p = colk[k : k + 1]  # (1, LB) — static sublane slice, no reduction
        inv = 1.0 / jnp.where(jnp.abs(p) > eps, p, eps)
        pivm = (srow == k).astype(dtype)
        f = colk * inv  # multipliers (f[k] = 1)
        fm = jnp.where(pivm > 0, jnp.zeros((), dtype), f)
        rowk = M[:, k : k + 1, :]  # (2·n8+1, 1, LB) — static slice
        M = M - fm[None] * rowk
        M = jnp.where(pivm[None] > 0, rowk * inv, M)
    x_ref[0] = M[n8]
    inv_ref[0] = M[n8 + 1 :]


def pallas_gji_lanes_solve(
    A: Array,
    b: Array,
    *,
    lane_width: int | None = None,
    interpret: bool | None = None,
) -> tuple[Array, Array]:
    """Batch-on-lanes Gauss-Jordan solve + inverse: returns (x, Ainv) with
    x (B, n) solving A x = b and Ainv (B, n, n) = A⁻¹ (no pivoting — SPD
    systems only; see `_gji_lanes_kernel`)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    B, n, _ = A.shape
    if lane_width is None:
        lane_width = 128
    M, n8, Bp, G = _lanes_pack(A, b, lane_width)
    # Identity pages: page j holds column j of I (δ_ij on sublane i).
    eye = jnp.broadcast_to(
        jnp.eye(n8, dtype=A.dtype)[None, :, :, None], (G, n8, n8, lane_width)
    )
    M = jnp.concatenate([M, eye], axis=1)  # (G, 2·n8+1, n8, LB)
    kernel = functools.partial(_gji_lanes_kernel, n8=n8)
    x, inv = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(
                (1, 2 * n8 + 1, n8, lane_width), lambda g: (g, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, n8, lane_width), lambda g: (g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n8, n8, lane_width), lambda g: (g, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, n8, lane_width), A.dtype),
            jax.ShapeDtypeStruct((G, n8, n8, lane_width), A.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * Bp * n8 * n8 * n8,
            bytes_accessed=(2 * n8 + 1) * Bp * n8 * A.dtype.itemsize * 2,
            transcendentals=0,
        ),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
        interpret=interpret,
    )(M)
    xs = jnp.transpose(x, (0, 2, 1)).reshape(Bp, n8)[:B, :n]
    # inv[g, j, i, lane] = (A⁻¹)[i, j] of system `lane` → (B, i, j).
    Ainv = jnp.transpose(inv, (0, 3, 2, 1)).reshape(Bp, n8, n8)[:B, :n, :n]
    return xs, Ainv


@jax.custom_batching.custom_vmap
def gji_solve(A: Array, b: Array) -> tuple[Array, Array]:
    """Single-system entry for the lane-major GJ solve+inverse kernel (SPD
    systems only), with a custom vmap rule so the vmapped interior-point
    loop reaches the kernel as one whole batch."""
    x, Ainv = pallas_gji_lanes_solve(A[None], b[None])
    return x[0], Ainv[0]


@gji_solve.def_vmap
def _gji_solve_vmap(axis_size, in_batched, A, b):
    A_batched, b_batched = in_batched
    if not A_batched:
        A = jnp.broadcast_to(A[None], (axis_size,) + A.shape)
    if not b_batched:
        b = jnp.broadcast_to(b[None], (axis_size,) + b.shape)
    lead = A.shape[:-2]
    n = A.shape[-1]
    x, Ainv = pallas_gji_lanes_solve(A.reshape(-1, n, n), b.reshape(-1, n))
    return (x.reshape(*lead, n), Ainv.reshape(*lead, n, n)), (True, True)


def pallas_gj_lanes_solve(
    A: Array,
    b: Array,
    *,
    lane_width: int | None = None,
    interpret: bool | None = None,
) -> Array:
    """Batch-on-lanes Gauss-Jordan solve (no pivoting — SPD systems only;
    see `_gj_lanes_kernel`). `lane_width` defaults to 128 (256 measured
    within 3% — benchmarks_round4.json qp_kernel_variant_ab)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    B, n, _ = A.shape
    if lane_width is None:
        lane_width = 128
    M, n8, Bp, G = _lanes_pack(A, b, lane_width)
    out = _lanes_call(
        _gj_lanes_kernel, M, n8, Bp, G, lane_width, A.dtype,
        2 * Bp * n8 * n8 * n8, interpret, transcendentals=0,
    )
    return out[:B, :n]


@jax.custom_batching.custom_vmap
def gj_solve(A: Array, b: Array) -> Array:
    """Single-system entry for the lane-major Gauss-Jordan kernel (SPD
    systems only — see `_gj_lanes_kernel`), with a custom vmap rule so the
    vmapped interior-point loop reaches the kernel as one whole batch."""
    return pallas_gj_lanes_solve(A[None], b[None], lane_width=128)[0]


@gj_solve.def_vmap
def _gj_solve_vmap(axis_size, in_batched, A, b):
    A_batched, b_batched = in_batched
    if not A_batched:
        A = jnp.broadcast_to(A[None], (axis_size,) + A.shape)
    if not b_batched:
        b = jnp.broadcast_to(b[None], (axis_size,) + b.shape)
    lead = A.shape[:-2]
    n = A.shape[-1]
    out = pallas_gj_lanes_solve(A.reshape(-1, n, n), b.reshape(-1, n))
    return out.reshape(*lead, n), True
