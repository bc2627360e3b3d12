"""Double-word (compensated-f32) refinement for the tol-1e-6 QP protocol.

The reference QP protocol runs PATH at tol 1e-6 in f64
(/root/reference/benchmark/path.jl:8). libtpu has no f64 linear algebra and
plain f32 floors the measurable TRUE residual at ~6e-6 (ROUND4.md item 8) —
not a solver limitation but an EVALUATION limitation: near the root,
G = Mx − ϕ − Aᵀy is catastrophic cancellation and its f32 evaluation
carries ~u·‖M‖·‖x‖ noise. This module closes the 6x gap the TPU way
(VERDICT r4 item 6):

  * iterates kept as double-words (x_hi + x_lo, utils/twofloat.py);
  * KKT residuals evaluated with compensated matvecs (`mv2` — doubled
    precision, ~u² floor);
  * Newton corrections from the ordinary f32 Mosaic kernels (the
    factorization needs no extra precision — iterative refinement with a
    doubled-precision residual converges to the doubled-precision floor,
    Higham ch. 12);
  * certification (`true_kkt_dw`) measured in the SAME doubled arithmetic,
    cross-checked against CPU f64 in tests/test_twofloat.py.

Batched via vmap like every other bench path; f32 end to end — runs
unchanged on the TPU chip.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import twofloat as tf
from . import qp as qp_mod

Array = jax.Array


class DWState(NamedTuple):
    x_hi: Array
    x_lo: Array
    y_hi: Array
    y_lo: Array
    s_hi: Array
    s_lo: Array


def _unpack(theta: Array, n: int, m: int):
    return qp_mod.unpack_parameters(theta, num_primals=n, num_inequalities=m)


def residuals_dw(theta: Array, st: DWState, *, n: int, m: int):
    """(rG, rH, rC) as double-words at doubled precision:
    rG = Mx − ϕ − Aᵀy, rH = Ax − b − s, rC = s∘y (the true KKT residual
    triple of the QP MCP — bench/qp.py generate_test_problem)."""
    M, A, b, phi = _unpack(theta, n, m)
    x = (st.x_hi, st.x_lo)
    y = (st.y_hi, st.y_lo)
    s = (st.s_hi, st.s_lo)
    rG = tf.dw_sub(tf.dw_mv(M, x), tf.dw_mv(A.T, y))
    rG = tf.dw_sub(rG, tf.dw(phi))
    rH = tf.dw_sub(tf.dw_mv(A, x), tf.dw(b))
    rH = tf.dw_sub(rH, s)
    rC = tf.dw_mul(s, y)
    return rG, rH, rC


def true_kkt_dw(theta: Array, st: DWState, *, n: int, m: int) -> Array:
    """‖F‖∞ with every component evaluated in doubled precision — the
    certification metric for the tol-1e-6 row (an f32 evaluation would
    floor at ~6e-6 regardless of how good the iterate is)."""
    rG, rH, rC = residuals_dw(theta, st, n=n, m=m)
    mx = lambda dw_val: jnp.max(
        jnp.abs(dw_val[0] + dw_val[1]), initial=jnp.float32(0.0)
    )
    return jnp.maximum(mx(rG), jnp.maximum(mx(rH), mx(rC)))


def polish_dw(
    theta: Array,
    x: Array,
    y: Array,
    s: Array,
    *,
    n: int,
    m: int,
    tol: float = 1e-6,
    iters: int = 8,
    reg: float | None = None,
    tau: float = 0.995,
):
    """Refine one solved QP instance to true ‖F‖∞ ≤ tol (doubled-precision
    measured). Fixed `iters` Newton corrections: f32 schur factorization
    (the Pallas QR/GJ kernels via newton_step_schur_pallas), doubled
    residuals, double-word iterate updates with a fraction-to-the-boundary
    guard on (s, y). Complementarity targets ϵ = tol/2 (not 0) exactly like
    the solver's _terminal_polish — driving s∘y → 0 degenerates the schur
    diagonal w = reg + s/(y+reg) on active constraints and the f32
    factorization returns garbage steps (measured: residual diverged 3e-6 →
    1e-1). Returns (state, true_kkt)."""
    from ..linalg import newton_step_schur_pallas
    from ..solver import fraction_to_the_boundary_linesearch_pair

    if reg is None:
        reg = tol
    eps_p = jnp.asarray(0.5 * tol, x.dtype)
    M, A, b, phi = _unpack(theta, n, m)
    Gx = M
    Gy = -A.T
    Hx = A
    Hy = jnp.zeros((m, m), x.dtype)
    st = DWState(
        x, jnp.zeros_like(x), y, jnp.zeros_like(y), s, jnp.zeros_like(s)
    )
    # Keep s, y strictly positive before the first residual evaluation:
    # complementarity target is below tol, so clamp at tol/100.
    floor = jnp.asarray(tol * 1e-2, x.dtype)
    st = st._replace(
        y_hi=jnp.maximum(st.y_hi, floor), s_hi=jnp.maximum(st.s_hi, floor)
    )

    def body(st, _):
        rG, rH, rC = residuals_dw(theta, st, n=n, m=m)
        # Newton right-hand sides: hi+lo collapsed to f32 (the correction
        # solve only needs the residual to f32 RELATIVE accuracy — the
        # doubled part already removed the cancellation noise).
        rGf = rG[0] + rG[1]
        rHf = rH[0] + rH[1]
        rCf = (rC[0] - eps_p) + rC[1]
        dx, dy, ds = newton_step_schur_pallas(
            Gx, Gy, Hx, Hy, st.y_hi, st.s_hi, rGf, rHf, rCf, reg
        )
        finite = (
            jnp.all(jnp.isfinite(dx))
            & jnp.all(jnp.isfinite(dy))
            & jnp.all(jnp.isfinite(ds))
        )
        safe = lambda d: jnp.where(finite, d, jnp.zeros_like(d))
        alphas = fraction_to_the_boundary_linesearch_pair(
            jnp.stack([st.s_hi, st.y_hi]),
            jnp.stack([safe(ds), safe(dy)]),
            tau=tau,
            decay=0.5,
            min_stepsize=1e-7,
        )
        a_s = jnp.where(jnp.isnan(alphas[0]), 0.0, alphas[0])
        a_y = jnp.where(jnp.isnan(alphas[1]), 0.0, alphas[1])
        upd = lambda hi, lo, a, d: tf.dw_add((hi, lo), tf.dw(a * safe(d)))
        x2 = upd(st.x_hi, st.x_lo, a_s, dx)
        s2 = upd(st.s_hi, st.s_lo, a_s, ds)
        y2 = upd(st.y_hi, st.y_lo, a_y, dy)
        return DWState(x2[0], x2[1], y2[0], y2[1], s2[0], s2[1]), None

    st, _ = jax.lax.scan(body, st, None, length=iters)
    return st, true_kkt_dw(theta, st, n=n, m=m)


def polish_batch_dw(
    thetas: Array,
    x: Array,
    y: Array,
    s: Array,
    *,
    n: int,
    m: int,
    tol: float = 1e-6,
    iters: int = 8,
):
    """vmapped polish_dw; returns (states, true_kkt (B,))."""
    with jax.default_matmul_precision("highest"):
        return jax.jit(
            jax.vmap(
                functools.partial(polish_dw, n=n, m=m, tol=tol, iters=iters)
            )
        )(thetas, x, y, s)
