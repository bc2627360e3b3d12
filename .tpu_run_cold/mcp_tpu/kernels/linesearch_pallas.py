"""Fused linesearch + iterate-update Pallas kernel.

After the fused block-Thomas kernel removed the Newton solve's dispatch
chain, the remaining per-iteration glue of the interior-point inner loop —
the pair fraction-to-the-boundary linesearch, step-failure detection, the
(x, s, y) update, and the ‖F‖∞ KKT norm — still costs ~1 ms/iteration at
headline shapes (B=128 lane-change), almost entirely XLA dispatch latency
over tiny ops. This kernel runs all of it in ONE ``pallas_call`` over the
whole batch.

Semantics are exactly ``solver.fraction_to_the_boundary_linesearch_pair``
plus the update lines of ``solver._ip_solve_body.inner_body`` (reference
behavior src/solver.jl:84-107, 127-138):

  * candidate steps are the static grid {1, decay, decay², …} down past
    ``min_stepsize`` (the reference's halving backtrack, loop-free);
  * feasibility of candidate α: all_i(α·δᵢ ≥ −τ·vᵢ). Because v > 0 and
    feasibility is downward-closed in α, the *first* feasible candidate is
    the *largest* feasible one, so the argmax-free reduction
    ``max_k(α_k · feasible_k)`` selects the same step the reference's loop
    does; no feasible candidate ⇒ NaN ⇒ linesearch failure;
  * a non-finite Newton direction marks linear failure (src/solver.jl:84-88)
    and zeroes the applied step;
  * kkt = max(‖rG‖∞, ‖rH‖∞, ‖rC‖∞) at the pre-step point (src/solver.jl:107).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _candidates(decay: float, min_stepsize: float) -> tuple[float, ...]:
    """The reference's backtracking grid — imported from the solver so the
    fused and unfused linesearch paths share one definition."""
    from ..solver import linesearch_candidates

    return linesearch_candidates(decay, min_stepsize)


def _finite_all(v: Array) -> Array:
    """all-finite reduction over the trailing axis → (TB, 1) in {0, 1}."""
    finite = jnp.isfinite(v).astype(v.dtype)
    return jnp.min(finite, axis=1, keepdims=True)


def _alpha(v: Array, dv: Array, cands, tau, dtype) -> tuple[Array, Array]:
    """Largest feasible candidate (== first feasible, see module docstring)
    and an any-feasible flag; both (TB, 1)."""
    neg_tv = -tau * v
    alpha = jnp.zeros((v.shape[0], 1), dtype)
    anyf = jnp.zeros((v.shape[0], 1), dtype)
    for c in cands:  # static unrolled grid (~14 candidates)
        ok = jnp.min(
            jnp.where(c * dv >= neg_tv, jnp.ones((), dtype), jnp.zeros((), dtype)),
            axis=1,
            keepdims=True,
        )
        alpha = jnp.maximum(alpha, c * ok)
        anyf = jnp.maximum(anyf, ok)
    return alpha, anyf


def _ls_update_kernel(
    x_ref, dx_ref, s_ref, ds_ref, y_ref, dy_ref, rg_ref, rh_ref, rc_ref,
    xo_ref, so_ref, yo_ref, kkt_ref, fail_ref,
    *, tau: float, cands: tuple[float, ...],
):
    dtype = x_ref.dtype
    x, dx = x_ref[:], dx_ref[:]
    s, ds = s_ref[:], ds_ref[:]
    y, dy = y_ref[:], dy_ref[:]

    lin_ok = _finite_all(dx) * _finite_all(ds) * _finite_all(dy)  # (TB,1)
    # Zero a failed direction before the feasibility tests AND the update:
    # 0·NaN = NaN, so gating only the step size would still poison the
    # iterates; the reference keeps the last good iterate on a failed step
    # (src/solver.jl:84-105). `jnp.where`, not multiply, for the same reason.
    zero = jnp.zeros((), dtype)
    dx_s = jnp.where(lin_ok > 0, dx, zero)
    ds_s = jnp.where(lin_ok > 0, ds, zero)
    dy_s = jnp.where(lin_ok > 0, dy, zero)

    a_s, any_s = _alpha(s, ds_s, cands, tau, dtype)
    a_y, any_y = _alpha(y, dy_s, cands, tau, dtype)
    ls_ok = any_s * any_y
    ok = lin_ok * ls_ok  # step applied only if no failure (src/solver.jl:84-105)

    xo_ref[:] = x + (ok * a_s) * dx_s
    so_ref[:] = s + (ok * a_s) * ds_s
    yo_ref[:] = y + (ok * a_y) * dy_s

    kkt = jnp.maximum(
        jnp.max(jnp.abs(rg_ref[:]), axis=1, keepdims=True),
        jnp.maximum(
            jnp.max(jnp.abs(rh_ref[:]), axis=1, keepdims=True),
            jnp.max(jnp.abs(rc_ref[:]), axis=1, keepdims=True),
        ),
    )
    kkt_ref[:] = kkt
    # fail lanes: [step_failed, lin_failed] as {0,1} floats.
    one = jnp.ones((), dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, fail_ref.shape, 1)
    fail_ref[:] = jnp.where(lane == 0, one - ok, one - lin_ok)


def _ls_update_batched(x, dx, s, ds, y, dy, rg, rh, rc, *, tau, decay, min_stepsize,
                       interpret=None):
    """(B, n)/(B, m) arrays → (x', s', y', kkt (B,), step_failed (B,) bool)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    B = x.shape[0]
    dtype = x.dtype
    cands = _candidates(decay, min_stepsize)
    kernel = functools.partial(_ls_update_kernel, tau=tau, cands=cands)
    spec = lambda d: pl.BlockSpec((B, d), lambda: (0, 0), memory_space=pltpu.VMEM)
    n, m = x.shape[1], s.shape[1]
    xo, so, yo, kkt, fail = pl.pallas_call(
        kernel,
        in_specs=[spec(n), spec(n), spec(m), spec(m), spec(m), spec(m),
                  spec(n), spec(m), spec(m)],
        out_specs=[spec(n), spec(m), spec(m), spec(1), spec(2)],
        out_shape=[
            jax.ShapeDtypeStruct((B, n), dtype),
            jax.ShapeDtypeStruct((B, m), dtype),
            jax.ShapeDtypeStruct((B, m), dtype),
            jax.ShapeDtypeStruct((B, 1), dtype),
            jax.ShapeDtypeStruct((B, 2), dtype),
        ],
        # 14 whole-batch (B, n)/(B, m) blocks stay VMEM-resident; the Mosaic
        # scoped default of 16 MB is not enough at B ≥ 512 headline shapes
        # (same headroom as thomas_pallas.py).
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=48 * 2**20
        ),
        interpret=interpret,
    )(x, dx, s, ds, y, dy, rg, rh, rc)
    return xo, so, yo, kkt[:, 0], fail[:, 0] > 0.5


def make_linesearch_update(*, tau: float, decay: float, min_stepsize: float):
    """Build the fused linesearch+update op for given solver options.

    Returns ``f(x, dx, s, ds, y, dy, rG, rH, rC) ->
    (x', s', y', kkt_scalar, step_failed_bool)`` operating on single
    instances, with a custom vmap rule that lowers the solver's batch vmap
    to one whole-batch kernel call (same pattern as thomas_solve)."""

    @jax.custom_batching.custom_vmap
    def ls_update(x, dx, s, ds, y, dy, rg, rh, rc):
        xo, so, yo, kkt, failed = _ls_update_batched(
            x[None], dx[None], s[None], ds[None], y[None], dy[None],
            rg[None], rh[None], rc[None],
            tau=tau, decay=decay, min_stepsize=min_stepsize,
        )
        return xo[0], so[0], yo[0], kkt[0], failed[0]

    @ls_update.def_vmap
    def _ls_update_vmap(axis_size, in_batched, *ops):
        ops = list(ops)
        for i, (batched, op) in enumerate(zip(in_batched, ops)):
            if not batched:
                ops[i] = jnp.broadcast_to(op[None], (axis_size,) + op.shape)
        out = _ls_update_batched(
            *ops, tau=tau, decay=decay, min_stepsize=min_stepsize
        )
        return out, tuple(True for _ in out)

    return ls_update
