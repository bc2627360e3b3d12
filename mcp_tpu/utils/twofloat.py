"""Error-free transformations and double-word (two-float) arithmetic.

The TPU answer to the reference QP protocol's tol 1e-6
(/root/reference/benchmark/path.jl:8): libtpu has no f64 linear algebra
("Only F32 and C64 types", ROUND4.md item 8) and plain f32 floors the TRUE
KKT residual at ~6e-6 — not because the solver can't find the root, but
because evaluating G = Mx − ϕ − Aᵀy near the root is catastrophic
cancellation: the f32 evaluation itself carries ~u·‖M‖·‖x‖ ≈ 6e-6 noise.

Error-free transformations fix exactly that: TwoSum (Knuth) and Dekker
split/TwoProduct decompose each f32 op into result + EXACT rounding error
using only IEEE f32 adds/multiplies (all VPU-native; XLA does not
reassociate float arithmetic, so the identities survive compilation).
Stacking them gives a compensated matvec (`mv2`) whose result is accurate
to ~u² · n · cond — effectively doubled precision — and a double-word
value type (hi, lo) with unevaluated-sum semantics for iterates.

Used by the tol-1e-6 QP protocol row (bench/qp_dw.py): f32 factorizations
(Mosaic-legal) + double-word residuals + iterative refinement = f64-grade
certification on hardware with no f64 (VERDICT r4 item 6). References:
Dekker 1971; Ogita, Rump & Oishi, "Accurate Sum and Dot Product", 2005;
Higham, Accuracy and Stability, ch. 4.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

#: Dekker split factor for f32 (24-bit mantissa): 2^12 + 1.
_SPLIT = 4097.0


def two_sum(a: Array, b: Array):
    """s, e with s = fl(a+b) and a + b = s + e EXACTLY (Knuth, 6 flops,
    branch-free — valid for any ordering of |a|, |b|)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a: Array, b: Array):
    """s, e with a + b = s + e exactly, REQUIRES |a| >= |b| (or a == 0)."""
    s = a + b
    e = b - (s - a)
    return s, e


def split(a: Array):
    """a = hi + lo exactly with hi, lo having <= 12 mantissa bits each."""
    c = _SPLIT * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a: Array, b: Array):
    """p, e with p = fl(a·b) and a·b = p + e EXACTLY (Dekker — products of
    12-bit halves are exact in f32)."""
    p = a * b
    ah, al = split(a)
    bh, bl = split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _sum2_scan(x: Array):
    """Neumaier compensated sum over the LEADING axis via lax.scan. The
    carry dependence is the point: an unrolled pairwise-TwoSum tree of
    slice-adds gets reassociated by the backend's fusion emitter (measured
    on XLA:CPU: the fused tree lost ALL compensation — s and es both moved
    by ~4 ulps while the piecewise computation was exact to 1e-13;
    optimization_barrier did not stop it), whereas a scan's loop-carried
    two_sum cannot be reordered without changing semantics the compiler
    must preserve."""

    def body(carry, xi):
        s, c = carry
        s2, e = two_sum(s, xi)
        return (s2, c + e), None

    (s, c), _ = lax.scan(
        body, (jnp.zeros_like(x[0]), jnp.zeros_like(x[0])), x
    )
    return s, c


def sum2(x: Array, axis: int = -1, *, chunk: int = 16):
    """Compensated sum along `axis`: (s, e) with s + e ≈ Σx to ~u²·n·|x|
    relative error (verified exact vs f64 on random products in
    tests/test_twofloat.py). Two-level scan: Neumaier within
    `chunk`-element groups, then Neumaier across the group sums — serial
    depth chunk + n/chunk (≈29 at n=200) instead of n, with the group
    errors' own sum carried in plain f32 (their rounding is O(u²))."""
    axis = axis % x.ndim
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    pad = (-n) % chunk
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    xc = x.reshape(*x.shape[:-1], -1, chunk)
    s, c = _sum2_scan(jnp.moveaxis(xc, -1, 0))  # within chunks
    s2, c2 = _sum2_scan(jnp.moveaxis(s, -1, 0))  # across chunk sums
    return s2, c2 + jnp.sum(c, axis=-1)


def mv2(A: Array, v: Array):
    """Compensated matvec A @ v: (hi, lo) with hi + lo ≈ A·v to doubled
    precision (Dot2 of Ogita-Rump-Oishi, vectorized over rows; A (..., n, k),
    v (..., k) → (..., n)). Elementwise Dekker products + pairwise
    compensated summation — all VPU f32, no MXU accumulation rounding."""
    p, e = two_prod(A, v[..., None, :])
    s, es = sum2(p, axis=-1)
    lo = es + jnp.sum(e, axis=-1)
    return fast_two_sum(s, lo)


# ---- double-word values: unevaluated (hi, lo) pairs ----------------------


def dw(hi: Array, lo: Array | None = None):
    return (hi, jnp.zeros_like(hi) if lo is None else lo)


def dw_add(a, b):
    """(ahi+alo) + (bhi+blo) as a normalized double-word (Dekker add —
    ~u² relative error)."""
    s, e = two_sum(a[0], b[0])
    e = e + (a[1] + b[1])
    return fast_two_sum(s, e)


def dw_neg(a):
    return (-a[0], -a[1])


def dw_sub(a, b):
    return dw_add(a, dw_neg(b))


def dw_mul(a, b):
    """Elementwise double-word product (cross lo·lo term dropped: O(u²))."""
    p, e = two_prod(a[0], b[0])
    e = e + (a[0] * b[1] + a[1] * b[0])
    return fast_two_sum(p, e)


def dw_mv(A: Array, x_dw):
    """A @ (x_hi + x_lo) in doubled precision: compensated matvec of the hi
    part + plain matvec of the lo part (its rounding is O(u·|lo|) = O(u²))."""
    hi, lo = mv2(A, x_dw[0])
    lo = lo + A @ x_dw[1]
    return fast_two_sum(hi, lo)
