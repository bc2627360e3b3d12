"""Fused linesearch+update kernel: op-level parity with the XLA path and
solve-level parity inside the interior-point loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcp_tpu.kernels.linesearch_pallas import make_linesearch_update
from mcp_tpu.solver import (
    SolverOptions,
    fraction_to_the_boundary_linesearch,
)

TAU, DECAY, MINSTEP = 0.995, 0.5, 1e-4


def reference_glue(x, dx, s, ds, y, dy, rg, rh, rc):
    """The unfused inner-body glue, verbatim from solver._ip_solve_body."""
    lin_failed = ~(
        jnp.all(jnp.isfinite(dx)) & jnp.all(jnp.isfinite(dy)) & jnp.all(jnp.isfinite(ds))
    )
    safe = lambda d: jnp.where(lin_failed, jnp.zeros_like(d), d)
    ls = lambda v, dv: fraction_to_the_boundary_linesearch(
        v, dv, tau=TAU, decay=DECAY, min_stepsize=MINSTEP
    )
    alpha_s, alpha_y = ls(s, safe(ds)), ls(y, safe(dy))
    step_failed = lin_failed | jnp.isnan(alpha_s) | jnp.isnan(alpha_y)
    a_s = jnp.where(step_failed, 0.0, alpha_s)
    a_y = jnp.where(step_failed, 0.0, alpha_y)
    kkt = jnp.maximum(
        jnp.max(jnp.abs(rg)), jnp.maximum(jnp.max(jnp.abs(rh)), jnp.max(jnp.abs(rc)))
    )
    return x + a_s * safe(dx), s + a_s * safe(ds), y + a_y * safe(dy), kkt, step_failed


@pytest.fixture(scope="module")
def op():
    return make_linesearch_update(tau=TAU, decay=DECAY, min_stepsize=MINSTEP)


def _random_case(key, n=37, m=23, scale=1.0):
    ks = jax.random.split(key, 6)
    x = jax.random.normal(ks[0], (n,))
    dx = jax.random.normal(ks[1], (n,))
    s = jax.random.uniform(ks[2], (m,), minval=0.01, maxval=2.0)
    ds = scale * jax.random.normal(ks[3], (m,))
    y = jax.random.uniform(ks[4], (m,), minval=0.01, maxval=2.0)
    dy = scale * jax.random.normal(ks[5], (m,))
    rg = jax.random.normal(ks[0], (n,))
    rh = jax.random.normal(ks[1], (m,))
    rc = jax.random.normal(ks[2], (m,))
    return x, dx, s, ds, y, dy, rg, rh, rc


class TestOpParity:
    @pytest.mark.parametrize("scale", [0.1, 1.0, 50.0])
    def test_batched_matches_reference(self, op, scale):
        keys = jax.random.split(jax.random.PRNGKey(0), 16)
        args = jax.vmap(lambda k: _random_case(k, scale=scale))(keys)
        got = jax.jit(jax.vmap(op))(*args)
        want = jax.vmap(reference_glue)(*args)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-6, atol=1e-7)

    def test_nan_direction_fails_without_update(self, op):
        args = list(_random_case(jax.random.PRNGKey(3)))
        args[1] = args[1].at[0].set(jnp.nan)  # dx non-finite → lin failure
        got = op(*args)
        want = reference_glue(*args)
        assert bool(got[4]) and bool(want[4])
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(args[0]))  # x unchanged
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(args[2]))  # s unchanged
        np.testing.assert_allclose(np.asarray(got[3]), np.asarray(want[3]))  # kkt still reported

    def test_infeasible_linesearch_fails(self, op):
        # δ so steep every candidate (incl. the sub-min_stepsize one)
        # violates the fraction-to-the-boundary bound.
        args = list(_random_case(jax.random.PRNGKey(4)))
        args[3] = -args[2] / (MINSTEP * DECAY * 0.5)
        got = op(*args)
        want = reference_glue(*args)
        assert bool(got[4]) and bool(want[4])
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(args[2]))

    def test_backtracked_alpha_matches(self, op):
        # Force a mid-grid candidate: δ = -c·s with c chosen so α ≈ τ/c
        # requires several halvings.
        args = list(_random_case(jax.random.PRNGKey(5)))
        args[3] = -7.3 * args[2]
        args[5] = -2.9 * args[4]
        got = op(*args)
        want = reference_glue(*args)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-6, atol=1e-7)


class TestSolveParity:
    def test_lane_change_fused_vs_unfused(self):
        from mcp_tpu.bench import lane_change as lc
        from mcp_tpu.parallel.batch import solve_batch

        bench = lc.generate_test_problem(horizon=10)
        mcp = bench.parametric_game.mcp
        thetas = lc.generate_parameter_batch(
            jax.random.PRNGKey(1), 4, bench, dtype=jnp.float32
        )
        base = SolverOptions(linear_solver="tridiag_pallas")
        sol_fused = solve_batch(mcp, thetas, options=base)
        sol_plain = solve_batch(
            mcp, thetas, options=SolverOptions(
                linear_solver="tridiag_pallas", fused_linesearch=False
            )
        )
        np.testing.assert_array_equal(
            np.asarray(sol_fused.status), np.asarray(sol_plain.status)
        )
        np.testing.assert_allclose(
            np.asarray(sol_fused.x), np.asarray(sol_plain.x), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(sol_fused.kkt_error),
            np.asarray(sol_plain.kkt_error),
            rtol=1e-3,
            atol=1e-6,
        )
