"""Sensitivity-solver tier parity: condensed/tridiag IFT solves must match
the dense-LU reference path in both AD modes."""

import jax
import jax.numpy as jnp
import numpy as np

from mcp_tpu import OptimizationProblem, ParametricGame
from mcp_tpu.games import solve_game
from mcp_tpu.solver import SolverOptions
from mcp_tpu.bench import lane_change as lc
from mcp_tpu import diff as _diff

LIM = 0.5


def clamp_game():
    problems = [
        OptimizationProblem(
            objective=lambda xs, ti, i=i: jnp.sum((xs[i] - ti) ** 2),
            private_inequality=lambda xs, ti, i=i: jnp.concatenate(
                [-xs[i] + LIM, xs[i] + LIM]
            ),
        )
        for i in range(2)
    ]
    return ParametricGame.create(
        test_point=[jnp.ones(2), jnp.ones(2)],
        test_parameter=[jnp.ones(2), jnp.ones(2)],
        problems=problems,
    )


class TestCondensedSensitivities:
    def test_reverse_mode_matches_dense(self):
        game = clamp_game()
        theta = jnp.array([-1.0, 0.0, 1.0, 1.0])

        def loss(t, sens):
            s = solve_game(
                game,
                t,
                options=SolverOptions(
                    linear_solver="schur", sensitivity_solver=sens
                ),
            )
            return jnp.sum(s.x**2) + jnp.sum(s.y**2)

        g_lu = jax.grad(lambda t: loss(t, "lu"))(theta)
        g_c = jax.grad(lambda t: loss(t, "condensed"))(theta)
        np.testing.assert_allclose(g_c, g_lu, atol=1e-10)

    def test_forward_mode_matches_dense(self):
        game = clamp_game()
        theta = jnp.array([-1.0, 0.0, 1.0, 1.0])

        def sol_x(t, sens):
            return solve_game(
                game,
                t,
                options=SolverOptions(
                    linear_solver="schur", sensitivity_solver=sens
                ),
            ).x

        j_lu = jax.jacfwd(lambda t: sol_x(t, "lu"))(theta)
        j_c = jax.jacfwd(lambda t: sol_x(t, "condensed"))(theta)
        np.testing.assert_allclose(j_c, j_lu, atol=1e-10)

    def test_plain_mcp_falls_back_to_dense(self):
        """from_gh MCPs (assume_hy_zero False) must not take the condensed
        path even when requested — silent, correct fallback."""
        import mcp_tpu

        M = jnp.array([[2.0, 1.0], [1.0, 2.0]])
        mcp = mcp_tpu.PrimalDualMCP.from_gh(
            lambda x, y, t: M @ x - t - y,
            lambda x, y, t: x - 1.0,
            unconstrained_dimension=2,
            constrained_dimension=2,
            parameter_dimension=2,
        )
        g = jax.grad(
            lambda t: jnp.sum(
                _diff.solve(
                    mcp, t, options=SolverOptions(sensitivity_solver="condensed")
                ).x
                ** 2
            )
        )(jnp.array([0.1, 0.2]))
        assert np.all(np.isfinite(np.asarray(g)))


class TestTridiagSensitivities:
    def test_lane_change_gradient_parity(self):
        bench = lc.generate_test_problem(horizon=10)
        mcp = bench.parametric_game.mcp
        theta = lc.generate_parameter_batch(
            jax.random.PRNGKey(1), 1, bench, dtype=jnp.float32
        )[0]

        def loss(t, sens):
            s = _diff.solve(
                mcp,
                t,
                options=SolverOptions(
                    linear_solver="schur", sensitivity_solver=sens
                ),
            )
            return jnp.sum(s.x[:120] ** 2)

        g_lu = jax.grad(lambda t: loss(t, "lu"))(theta)
        g_t = jax.grad(lambda t: loss(t, "tridiag"))(theta)
        scale = float(jnp.max(jnp.abs(g_lu)))
        np.testing.assert_allclose(g_t, g_lu, atol=1e-5 * scale)
