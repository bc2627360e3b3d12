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
    row_permutation: optional tuple of ints, length m — inequality rows
      grouped time-major (rows_per_block per step). When present, the
      schur reduction term Gy·diag·Hx is block-diagonal in time and is
      assembled band-only (O(T·b·m_t·b) instead of O(n·m·n)).
    rows_per_block: m_t, uniform inequality-row count per time step.
    """

    permutation: tuple[int, ...]
    num_blocks: int
    block_size: int
    row_permutation: tuple[int, ...] | None = None
    rows_per_block: int = 0


def _inverse_permutation(p) -> Array:
    """Host-side inverse of a static permutation. Computing this in-graph as
    `zeros.at[perm].set(arange)` hands XLA an all-constant scatter, whose
    compile-time constant folding is pathologically slow on TPU (the
    colored-path 35-min compile blowup); argsort on host numpy embeds the
    result as a plain constant instead."""
    import numpy as np

    return jnp.asarray(np.argsort(np.asarray(p)))


def extract_blocks(A_perm: Array, T: int, b: int):
    """(Tb, Tb) → (diag (T,b,b), lower (T-1,b,b), upper (T-1,b,b))."""
    A4 = A_perm.reshape(T, b, T, b)
    idx = jnp.arange(T)
    diag = A4[idx, :, idx, :]
    lower = A4[idx[1:], :, idx[:-1], :]
    upper = A4[idx[:-1], :, idx[1:], :]
    return diag, lower, upper


def block_thomas_solve_multi(
    diag: Array, lower: Array, upper: Array, rhs: Array
) -> Array:
    """Multi-RHS block-Thomas: diag (T, b, b); lower/upper (T-1, b, b);
    rhs (T, b, k) → x (T, b, k). One factorization sweep amortized over all
    k right-hand-side columns (used by the horizon-sharded SPIKE solve,
    whose local solves carry [r | e₀⊗L_bound | e_last⊗U_bound])."""
    T, b_dim, _ = diag.shape
    k = rhs.shape[-1]

    def fwd(carry, inp):
        C_prev, d_prev = carry
        D_t, L_t, U_t, r_t = inp
        denom = D_t - L_t @ C_prev
        rhs_blk = jnp.concatenate([U_t, r_t - L_t @ d_prev], axis=1)
        sol = jnp.linalg.solve(denom, rhs_blk)
        C_t, d_t = sol[:, :b_dim], sol[:, b_dim:]
        return (C_t, d_t), (C_t, d_t)

    zero_blk = jnp.zeros((b_dim, b_dim), diag.dtype)
    # Pad lower/upper so every scan step has uniform operands; step 0 uses
    # L=0, the last step uses U=0.
    L = jnp.concatenate([zero_blk[None], lower], axis=0)  # (T, b, b)
    U = jnp.concatenate([upper, zero_blk[None]], axis=0)  # (T, b, b)

    (_, _), (Cs, ds) = lax.scan(
        fwd,
        (zero_blk, jnp.zeros((b_dim, k), diag.dtype)),
        (diag, L, U, rhs),
    )

    def bwd(x_next, inp):
        C_t, d_t = inp
        x_t = d_t - C_t @ x_next
        return x_t, x_t

    _, xs_rev = lax.scan(
        bwd, jnp.zeros((b_dim, k), diag.dtype), (Cs, ds), reverse=True
    )
    return xs_rev


def block_thomas_solve(diag: Array, lower: Array, upper: Array, rhs: Array) -> Array:
    """Solve the block-tridiagonal system for one instance.

    diag: (T, b, b); lower/upper: (T-1, b, b); rhs: (T, b) → x: (T, b).
    Standard block-Thomas: forward eliminate with per-block dense solves
    (XLA LU on b×b), backward substitute. vmap for batches.
    """
    return block_thomas_solve_multi(diag, lower, upper, rhs[..., None])[..., 0]


def block_cyclic_reduction_solve(
    diag: Array, lower: Array, upper: Array, rhs: Array
) -> Array:
    """Solve the block-tridiagonal system by cyclic reduction.

    Each level eliminates the odd-indexed blocks: for odd i,
        x_i = D_i⁻¹ (r_i - L_i x_{i-1} - U_i x_{i+1}),
    substituting into the even rows yields a half-size block-tridiagonal
    system. ~log₂T levels of *batched* block ops (every level's inversions
    and matmuls are data-parallel over blocks) versus Thomas' T-step serial
    recursion — and the level structure maps onto a horizon-sharded mesh
    with ppermute neighbor exchanges (SURVEY.md §5's ring-attention analog).

    Implemented recursively at trace time (T is static); T may be any size
    (odd tails handled by the recursion's base case).
    """
    T, b, _ = diag.shape
    if T == 1:
        return jnp.linalg.solve(diag[0], rhs[0])[None]
    if T == 2:
        A = jnp.block(
            [[diag[0], upper[0]], [lower[0], diag[1]]]
        )
        x = jnp.linalg.solve(A, rhs.reshape(-1))
        return x.reshape(2, b)

    # Pad so the odd-block count covers the tail uniformly.
    odd_idx = jnp.arange(1, T, 2)
    even_idx = jnp.arange(0, T, 2)
    To = int(odd_idx.shape[0])
    Te = int(even_idx.shape[0])

    zero = jnp.zeros((b, b), diag.dtype)
    # For odd i: L_i couples to i-1 (always exists), U_i couples to i+1
    # (missing when i == T-1).
    D_odd = diag[odd_idx]  # (To, b, b)
    L_odd = lower[odd_idx - 1]  # lower[i-1] is block (i, i-1)
    U_odd = jnp.where(
        (odd_idx + 1 < T)[:, None, None], upper[jnp.minimum(odd_idx, T - 2)], zero
    )
    r_odd = rhs[odd_idx]

    # Solve D_i [L_i | U_i | r_i] in one batched call.
    rhs_cat = jnp.concatenate([L_odd, U_odd, r_odd[:, :, None]], axis=2)
    sol = jnp.linalg.solve(D_odd, rhs_cat)
    DL, DU, Dr = sol[:, :, :b], sol[:, :, b : 2 * b], sol[:, :, 2 * b]

    # Substitute into even rows j = 0, 2, ...:
    #   D'_j = D_j - U_j·D_{j+1}⁻¹L_{j+1} - L_j·D_{j-1}⁻¹U_{j-1}
    #   r'_j = r_j - U_j·D_{j+1}⁻¹r_{j+1} - L_j·D_{j-1}⁻¹r_{j-1}
    #   L'_(j) couples to the previous even block: -L_j·D_{j-1}⁻¹L_{j-1}
    #   U'_(j) couples to the next even block:    -U_j·D_{j+1}⁻¹U_{j+1}
    def even_terms(j_pos):
        j = even_idx[j_pos]
        has_next = j + 1 < T
        has_prev = j - 1 >= 0
        U_j = jnp.where(has_next, upper[jnp.minimum(j, T - 2)], zero)
        L_j = jnp.where(has_prev, lower[jnp.maximum(j - 1, 0)], zero)
        # odd neighbor positions in the odd arrays
        nxt = jnp.minimum(j // 2, To - 1)  # odd block j+1 is odd_idx[j//2]
        prv = jnp.maximum(j // 2 - 1, 0)  # odd block j-1 is odd_idx[j//2 - 1]
        DLn = jnp.where(has_next, DL[nxt], zero)
        DUn = jnp.where(has_next, DU[nxt], zero)
        Drn = jnp.where(has_next, Dr[nxt], jnp.zeros((b,), diag.dtype))
        DLp = jnp.where(has_prev, DL[prv], zero)
        DUp = jnp.where(has_prev, DU[prv], zero)
        Drp = jnp.where(has_prev, Dr[prv], jnp.zeros((b,), diag.dtype))
        D_new = diag[j] - U_j @ DLn - L_j @ DUp
        r_new = rhs[j] - U_j @ Drn - L_j @ Drp
        L_new = -(L_j @ DLp)
        U_new = -(U_j @ DUn)
        return D_new, L_new, U_new, r_new

    D_e, L_e, U_e, r_e = jax.vmap(even_terms)(jnp.arange(Te))

    x_even = block_cyclic_reduction_solve(D_e, L_e[1:], U_e[:-1], r_e)

    # Back-substitute the odd blocks.
    def odd_x(k):
        j = odd_idx[k]
        x_prev = x_even[j // 2]  # even block j-1
        has_next = j + 1 < T
        x_next = jnp.where(
            has_next, x_even[jnp.minimum(j // 2 + 1, Te - 1)], jnp.zeros((b,), diag.dtype)
        )
        return Dr[k] - DL[k] @ x_prev - DU[k] @ x_next

    x_odd = jax.vmap(odd_x)(jnp.arange(To))

    x = jnp.zeros((T, b), diag.dtype)
    x = x.at[even_idx].set(x_even).at[odd_idx].set(x_odd)
    return x


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _colored_seeds(structure: TimeStructure, n: int, m: int):
    """Compressed Jacobian seed matrix by 3-phase time coloring.

    The Newton step needs only the tridiagonal bands of Gx plus the
    block-diagonal Gy/Hx blocks. Columns of time blocks ≥3 apart have
    disjoint row supports, so one forward seed can carry every third block's
    column: 3·b x-seeds + 3·m_t y-seeds recover all needed entries instead
    of n+m seeds — the TPU counterpart of the reference's sparse-Jacobian
    tracing (SymbolicTracingUtils.sparse_jacobian, src/mcp.jl:97-120).
    Measured at N=10/horizon-30: the full 6630-seed linearize costs 2.06 s
    per Newton iteration; 663 colored seeds cut that ~10x.
    """
    import numpy as np

    T, b, mt = structure.num_blocks, structure.block_size, structure.rows_per_block
    perm = np.asarray(structure.permutation)
    rperm = np.asarray(structure.row_permutation)
    n_seeds = 3 * b + 3 * mt
    S = np.zeros((n_seeds, n + m), dtype=np.float32)
    for t in range(T):
        p = t % 3
        for o in range(b):
            S[p * b + o, perm[t * b + o]] = 1.0
        for q in range(mt):
            S[3 * b + p * mt + q, n + rperm[t * mt + q]] = 1.0
    # Return host numpy: converting to a jax array here would capture a
    # tracer when the first call happens under jit and leak it to later
    # traces through the cache.
    return S


def gh_banded(mcp, structure: TimeStructure, x: Array, y: Array, theta: Array):
    """Fused residual + banded-Jacobian evaluation via colored seeds.

    Returns (g, h, diag, lower, upper, Gy_blocks, Hx_blocks) where diag/
    lower/upper are the unregularized Gx bands (T,b,b)/(T-1,b,b) and
    Gy_blocks (T,b,mt) / Hx_blocks (T,mt,b) are the per-time coupling
    blocks. No n² object is ever materialized.
    """
    n = mcp.unconstrained_dimension
    m = mcp.constrained_dimension
    T, b, mt = structure.num_blocks, structure.block_size, structure.rows_per_block
    perm = jnp.asarray(structure.permutation)
    rperm = jnp.asarray(structure.row_permutation)
    seeds = jnp.asarray(_colored_seeds(structure, n, m), dtype=x.dtype)

    def stacked(w):
        g, h = mcp.gh(w[:n], w[n:], theta)
        return jnp.concatenate([g, h])

    val, jvp = jax.linearize(stacked, jnp.concatenate([x, y]))
    outs = jax.vmap(jvp)(seeds)  # (3b+3mt, n+m)
    g, h = val[:n], val[n:]

    G_rows = outs[:, :n][:, perm].reshape(-1, T, b)  # (seeds, row_block, ro)
    H_rows = outs[:, n:][:, rperm].reshape(-1, T, mt)

    GX = G_rows[: 3 * b].reshape(3, b, T, b)  # (phase, col o, row block, ro)
    GY = G_rows[3 * b :].reshape(3, mt, T, b)  # (phase, q, row block, ro)
    HX = H_rows[: 3 * b].reshape(3, b, T, mt)  # (phase, col o, row block, q)

    t_idx = jnp.arange(T)
    phases = t_idx % 3
    # diag(t) rows t, cols t (phase t%3); -> (T, ro, co)
    diag = GX[phases, :, t_idx, :].transpose(0, 2, 1)
    # upper(t) = rows t, cols t+1 (phase (t+1)%3), t = 0..T-2
    tu = jnp.arange(T - 1)
    upper = GX[(tu + 1) % 3, :, tu, :].transpose(0, 2, 1)
    # lower(t) = rows t+1, cols t (phase t%3)
    lower = GX[tu % 3, :, tu + 1, :].transpose(0, 2, 1)
    # Gy block t: rows t, y-cols of block t -> (T, ro, q)
    Gy_blocks = GY[phases, :, t_idx, :].transpose(0, 2, 1)
    # Hx block t: H rows of block t, x-cols of block t -> (T, q, co)
    Hx_blocks = HX[phases, :, t_idx, :].transpose(0, 2, 1)
    return g, h, diag, lower, upper, Gy_blocks, Hx_blocks


class AffineBands(NamedTuple):
    """Exact affine decomposition of the banded Jacobian for quadratic games.

    For quadratic trajectory games (quadratic costs + quadratic/affine
    constraints, affine dynamics — e.g. the lane-change benchmark,
    reference examples/lane_change.jl:15-55), every entry of the banded
    Jacobian (diag, lower, upper, Gy, Hx) is an *affine* function of the
    iterate z = (x, y) and independent of θ:

        bands(z) = bands0 + T_x · x_blocks + T_y · y_blocks,

    with per-time-block locality (the source variables of band block t live
    in block t). The constant parts and linear-map tensors are computed once
    at game-build time (build_affine_bands) and validated numerically; the
    per-Newton-iteration linearize then collapses from 3b+3m_t forward-mode
    seeds (gh_banded) to one residual evaluation plus a handful of tiny
    einsums — the counterpart of the reference's one-time symbolic-Jacobian
    sparsity analysis (src/mcp.jl:97-120), exploited one level deeper.

    Tensor layouts ([t, source, out-row, out-col]); None = identically zero:
      diag_x (T, b, b, b), diag_y (T, mt, b, b)
      Gy_x (T, b, b, mt),  Gy_y (T, mt, b, mt)
      Hx_x (T, b, mt, b),  Hx_y (T, mt, mt, b)
    lower/upper must be constant (validated) — true whenever dynamics are
    affine, which is what makes the system block-tridiagonal to begin with.
    """

    diag0: Array
    lower0: Array
    upper0: Array
    Gy0: Array
    Hx0: Array
    diag_x: Array | None
    diag_y: Array | None
    Gy_x: Array | None
    Gy_y: Array | None
    Hx_x: Array | None
    Hx_y: Array | None


def reconstruct_bands(ab: AffineBands, structure: TimeStructure, x: Array, y: Array):
    """bands(z) = bands0 + T_x·x_blocks + T_y·y_blocks (see AffineBands)."""
    T, b, mt = structure.num_blocks, structure.block_size, structure.rows_per_block
    perm = jnp.asarray(structure.permutation)
    rperm = jnp.asarray(structure.row_permutation)
    dt = x.dtype
    P = lax.Precision.HIGHEST
    xb = x[perm].reshape(T, b)
    yb = y[rperm].reshape(T, mt)

    def lin(base, tx, ty, spec):
        out = base.astype(dt)
        if tx is not None:
            out = out + jnp.einsum("to," + spec, xb, tx.astype(dt), precision=P)
        if ty is not None:
            out = out + jnp.einsum("tq," + spec.replace("to", "tq", 1), yb,
                                   ty.astype(dt), precision=P)
        return out

    diag = lin(ab.diag0, ab.diag_x, ab.diag_y, "tobc->tbc")
    Gy = lin(ab.Gy0, ab.Gy_x, ab.Gy_y, "tobm->tbm")
    Hx = lin(ab.Hx0, ab.Hx_x, ab.Hx_y, "tomc->tmc")
    return diag, ab.lower0.astype(dt), ab.upper0.astype(dt), Gy, Hx


def gh_banded_fast(mcp, structure: TimeStructure, x: Array, y: Array, theta: Array):
    """gh_banded, routed through the precomputed affine decomposition when
    the MCP carries one (mcp.affine_bands, attached by the game builder):
    one residual evaluation + tiny einsums instead of the 3b+3m_t-seed
    colored linearize. Exact for quadratic games (validated at build time);
    identical call/return signature to gh_banded."""
    ab = getattr(mcp, "affine_bands", None)
    if ab is None:
        return gh_banded(mcp, structure, x, y, theta)
    g, h = mcp.gh(x, y, theta)
    return (g, h) + reconstruct_bands(ab, structure, x, y)


def build_affine_bands(
    mcp,
    structure: TimeStructure,
    theta_dim: int,
    *,
    dtype=None,
    rtol: float | None = None,
    max_bytes: int = 32 * 2**20,
):
    """Probe whether the banded Jacobian is affine in z and θ-independent;
    if so, materialize the AffineBands decomposition (eagerly, once per game
    build). Returns None when any probe fails — non-quadratic games (e.g.
    the masked-selection 1/d² costs) silently keep the per-iteration
    colored-seed path.

    Probes (all numeric, no symbolic analysis):
      1. curvature:      bands(2z) - 2·bands(z) + bands(0) ≈ 0
      2. θ-independence: bands(z; θ₁) ≈ bands(z; θ₂)
      3. reconstruction: bands0 + tensors·z ≈ bands(z) at a fresh point
         (catches any time-locality/coloring aliasing as well)
      4. lower/upper linear parts ≈ 0 (affine dynamics)
    Any non-finite probe value fails (a NaN band would otherwise pass every
    `diff > tol` comparison and bake a NaN Jacobian into every solve).

    rtol defaults to near-probe-noise for an exact decomposition: 1e-8 under
    x64, 1e-5 under f32 (quadratic games satisfy the probes to machine
    precision; a loose tolerance would let a weakly non-affine game attach a
    slightly wrong Jacobian that costs iterations without failing residuals).

    max_bytes caps the ATTACHED tensor size (the decomposition is baked into
    every jit trace as constants, and the build's colored-linearize transient
    is ~9x larger): games past the cap keep the colored-seed path.
    """
    import numpy as np

    if structure.row_permutation is None:
        return None
    if dtype is None:
        # Canonical float dtype (f64 under x64 so double-precision solves
        # don't see truncated Jacobian constants; f32 otherwise).
        dtype = jnp.asarray(0.0).dtype
    if rtol is None:
        rtol = 1e-8 if jnp.dtype(dtype) == jnp.float64 else 1e-5
    n = mcp.unconstrained_dimension
    m = mcp.constrained_dimension
    T, b, mt = structure.num_blocks, structure.block_size, structure.rows_per_block

    def bands_of(z, th):
        return gh_banded(mcp, structure, z[:n], z[n:], th)[2:]

    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    th0 = jax.random.normal(ks[0], (theta_dim,), dtype)
    th1 = 1.0 + jax.random.normal(ks[1], (theta_dim,), dtype)
    z1 = jax.random.normal(ks[2], (n + m,), dtype)
    z2 = 0.5 + jax.random.normal(ks[3], (n + m,), dtype)
    zeros = jnp.zeros((n + m,), dtype)

    f = jax.jit(bands_of)
    B0 = jax.tree.map(np.asarray, f(zeros, th0))
    B1 = jax.tree.map(np.asarray, f(z1, th0))
    B2 = jax.tree.map(np.asarray, f(2.0 * z1, th0))
    B1b = jax.tree.map(np.asarray, f(z1, th1))

    def allfinite(*trees):
        return all(
            np.all(np.isfinite(a)) for t in trees for a in jax.tree.leaves(t)
        )

    if not allfinite(B0, B1, B2, B1b):
        return None

    scale = max(1.0, max(np.max(np.abs(a)) for a in jax.tree.leaves(B1)))
    tol = rtol * scale

    def maxdiff(A, B):
        return max(
            np.max(np.abs(a - b))
            for a, b in zip(jax.tree.leaves(A), jax.tree.leaves(B))
        )

    curvature = maxdiff(B2, jax.tree.map(lambda a, c: 2.0 * a - c, B1, B0))
    if curvature > tol or maxdiff(B1, B1b) > tol:
        return None

    # Size gate before the colored linearize: worst-case attached bytes =
    # one (b + mt)-source derivative tensor per band leaf (the transient
    # colored-seed columns below are ~3 phases × 3 sources bigger still).
    itemsize = jnp.dtype(dtype).itemsize
    est_attached = (
        sum((b + mt) * int(a.size) for a in jax.tree.leaves(B0)) * itemsize
    )
    if est_attached > max_bytes:
        import warnings

        warnings.warn(
            f"affine-bands decomposition skipped: estimated attached size "
            f"{est_attached / 2**20:.0f} MiB exceeds max_bytes="
            f"{max_bytes / 2**20:.0f} MiB (T={T}, b={b}, m_t={mt}); "
            "keeping the per-iteration colored-seed linearize.",
            stacklevel=2,
        )
        return None

    seeds = jnp.asarray(_colored_seeds(structure, n, m), dtype)

    def lin_cols(z0, th):
        _, lin = jax.linearize(lambda z: bands_of(z, th), z0)
        return jax.vmap(lin)(seeds)

    cols = jax.tree.map(np.asarray, jax.jit(lin_cols)(zeros, th0))
    if not allfinite(cols):
        return None
    c_diag, c_lower, c_upper, c_Gy, c_Hx = cols
    if max(np.max(np.abs(c_lower)), np.max(np.abs(c_upper)), 0.0) > tol:
        return None  # cross-time quadratic coupling: not supported

    t_idx = np.arange(T)
    ph = t_idx % 3

    def same_block(c):
        # c: (3b+3mt, T, r, s) — keep only the same-block (phase-matched)
        # derivatives; returns x-part (T, b, r, s) and y-part (T, mt, r, s).
        cx = c[: 3 * b].reshape(3, b, T, *c.shape[2:])
        cy = c[3 * b :].reshape(3, mt, T, *c.shape[2:])
        X = cx[ph, :, t_idx]
        Y = cy[ph, :, t_idx]
        return (
            jnp.asarray(X, dtype) if np.any(X) else None,
            jnp.asarray(Y, dtype) if np.any(Y) else None,
        )

    diag_x, diag_y = same_block(c_diag)
    Gy_x, Gy_y = same_block(c_Gy)
    Hx_x, Hx_y = same_block(c_Hx)

    ab = AffineBands(
        diag0=jnp.asarray(B0[0], dtype),
        lower0=jnp.asarray(B0[1], dtype),
        upper0=jnp.asarray(B0[2], dtype),
        Gy0=jnp.asarray(B0[3], dtype),
        Hx0=jnp.asarray(B0[4], dtype),
        diag_x=diag_x, diag_y=diag_y,
        Gy_x=Gy_x, Gy_y=Gy_y,
        Hx_x=Hx_x, Hx_y=Hx_y,
    )

    # Final end-to-end check at a fresh point (catches aliasing too).
    rec = jax.tree.map(
        np.asarray,
        jax.jit(lambda z: reconstruct_bands(ab, structure, z[:n], z[n:]))(z2),
    )
    ref = jax.tree.map(np.asarray, f(z2, th1))
    # `not (… <= tol)` so a NaN in either reconstruction or reference fails.
    if not allfinite(rec, ref) or not (maxdiff(rec, ref) <= tol):
        return None
    return ab


def banded_newton_step_compressed(
    diag, lower, upper, Gy_blocks, Hx_blocks,
    y, s, rG, rH, rC, reg, structure: TimeStructure, *, algorithm: str = "thomas",
):
    """Newton step entirely in banded form (pairs with gh_banded)."""
    T, b = structure.num_blocks, structure.block_size
    mt = structure.rows_per_block
    perm = jnp.asarray(structure.permutation)
    rperm = jnp.asarray(structure.row_permutation)
    dtype = diag.dtype

    d = 1.0 / (y + reg)
    w = reg + d * s
    b2 = -rH - d * rC

    w_blocks = w[rperm].reshape(T, mt)
    b2_blocks = b2[rperm].reshape(T, mt)
    rC_blocks = rC[rperm].reshape(T, mt)
    s_blocks = s[rperm].reshape(T, mt)
    d_blocks = d[rperm].reshape(T, mt)

    A_diag = (
        diag
        + reg * jnp.eye(b, dtype=dtype)[None]
        - jnp.einsum("tbm,tm,tmc->tbc", Gy_blocks, 1.0 / w_blocks, Hx_blocks)
    )
    rhs = -rG[perm].reshape(T, b) - jnp.einsum(
        "tbm,tm->tb", Gy_blocks, b2_blocks / w_blocks
    )

    solver = (
        algorithm
        if callable(algorithm)
        else (
            block_cyclic_reduction_solve
            if algorithm == "cr"
            else block_thomas_solve
        )
    )
    dx_blocks = solver(A_diag, lower, upper, rhs)  # (T, b)

    dy_blocks = (
        b2_blocks - jnp.einsum("tmc,tc->tm", Hx_blocks, dx_blocks)
    ) / w_blocks
    ds_blocks = -(rC_blocks + s_blocks * dy_blocks) * d_blocks

    inv = _inverse_permutation(structure.permutation)
    rinv = _inverse_permutation(structure.row_permutation)
    dx = dx_blocks.reshape(-1)[inv]
    dy = dy_blocks.reshape(-1)[rinv]
    ds = ds_blocks.reshape(-1)[rinv]
    return dx, dy, ds


def banded_jac_mv(
    diag, lower, upper, Gy_blocks, Hx_blocks,
    y, s, dx, dy, ds, structure: TimeStructure,
):
    """True (unregularized) Jacobian–vector product in banded form:
    (Gx·dx + Gy·dy, Hx·dx − ds, s∘dy + y∘ds), for iterative refinement of
    banded Mehrotra solves (pairs with gh_banded's outputs — the same
    bands the factorization consumed, so no dense matrix is formed).
    Inputs/outputs in the ORIGINAL (unpermuted) vector layout."""
    T, b = structure.num_blocks, structure.block_size
    mt = structure.rows_per_block
    perm = jnp.asarray(structure.permutation)
    rperm = jnp.asarray(structure.row_permutation)

    dxb = dx[perm].reshape(T, b)
    dyb = dy[rperm].reshape(T, mt)
    zero_row = jnp.zeros((1, b), dx.dtype)
    Gx_dx = (
        jnp.einsum("tbc,tc->tb", diag, dxb)
        # lower[t] couples row t+1 to column t; upper[t] row t to column t+1.
        + jnp.concatenate(
            [zero_row, jnp.einsum("tbc,tc->tb", lower, dxb[:-1])]
        )
        + jnp.concatenate(
            [jnp.einsum("tbc,tc->tb", upper, dxb[1:]), zero_row]
        )
    )
    eG_b = Gx_dx + jnp.einsum("tbm,tm->tb", Gy_blocks, dyb)
    Hx_dx = jnp.einsum("tmc,tc->tm", Hx_blocks, dxb)

    inv = _inverse_permutation(structure.permutation)
    rinv = _inverse_permutation(structure.row_permutation)
    eG = eG_b.reshape(-1)[inv]
    eH = Hx_dx.reshape(-1)[rinv] - ds
    eC = s * dy + y * ds
    return eG, eH, eC


def banded_newton_step(
    Gx: Array,
    Gy: Array,
    Hx: Array,
    y: Array,
    s: Array,
    rG: Array,
    rH: Array,
    rC: Array,
    reg,
    structure: TimeStructure,
    *,
    algorithm: str = "thomas",
):
    """Schur-condensed Newton step with band-only assembly.

    The schur matrix is A = Gx + tI - Gy·diag(d·s/w…)·Hx; with per-time
    inequality rows (row_permutation), each row's Gy column and Hx row live
    in the same time block, so the reduction term is block-diagonal in time:
    computed as T batched (b, m_t)·(m_t, b) matmuls instead of one dense
    (n, m)·(m, n) product — at N=10/horizon-30 that is ~0.1% of the flops.
    Gx's bands are taken by direct gather. Returns (dx, dy, ds).
    """
    T, b = structure.num_blocks, structure.block_size
    mt = structure.rows_per_block
    perm = jnp.asarray(structure.permutation)
    rperm = jnp.asarray(structure.row_permutation)
    dtype = Gx.dtype

    d = 1.0 / (y + reg)
    w = reg + d * s
    b2 = -rH - d * rC

    # Band extraction of Gx in time-major order.
    Gx_perm = Gx[perm][:, perm]
    diag, lower, upper = extract_blocks(Gx_perm, T, b)
    diag = diag + reg * jnp.eye(b, dtype=dtype)[None]

    # Block-diagonal reduction term: per time block t,
    #   diag_t -= Gy[:, rows_t]·diag(1/w_t)·Hx[rows_t, :]
    cols = perm.reshape(T, b)
    rows = rperm.reshape(T, mt)
    Gy_blocks = Gy[cols[:, :, None], rows[:, None, :]]  # (T, b, mt)
    Hx_blocks = Hx[rows[:, :, None], cols[:, None, :]]  # (T, mt, b)
    w_blocks = w[rows]  # (T, mt)
    diag = diag - jnp.einsum(
        "tbm,tm,tmc->tbc", Gy_blocks, 1.0 / w_blocks, Hx_blocks
    )

    # rhs (cheap matvecs stay dense).
    rhs = (-rG - Gy @ (b2 / w))[perm].reshape(T, b)

    solver = (
        algorithm
        if callable(algorithm)
        else (
            block_cyclic_reduction_solve
            if algorithm == "cr"
            else block_thomas_solve
        )
    )
    x_perm = solver(diag, lower, upper, rhs).reshape(-1)
    inv = _inverse_permutation(structure.permutation)
    dx = x_perm[inv]

    dy = (b2 - Hx @ dx) / w
    ds = -(rC + s * dy) * d
    return dx, dy, ds


def tridiag_solve_permuted(
    A: Array, rhs: Array, structure: TimeStructure, *, algorithm: str = "thomas"
) -> Array:
    """Solve A x = rhs for one instance by permuting to time-major block
    tridiagonal form. Entries of A outside the tridiagonal band are ignored
    (they are structurally zero for trajectory-game schur systems; the
    builder validates this once at compile time). algorithm: "thomas"
    (T-step serial recursion) or "cr" (cyclic reduction, ~log T levels)."""
    perm = jnp.asarray(structure.permutation)
    T, b = structure.num_blocks, structure.block_size
    A_perm = A[perm][:, perm]
    r_perm = rhs[perm]
    diag, lower, upper = extract_blocks(A_perm, T, b)
    solver = (
        algorithm
        if callable(algorithm)
        else (
            block_cyclic_reduction_solve
            if algorithm == "cr"
            else block_thomas_solve
        )
    )
    x_perm = solver(diag, lower, upper, r_perm.reshape(T, b)).reshape(-1)
    inv = _inverse_permutation(structure.permutation)
    return x_perm[inv]
