"""Game → MCP tests, mirroring the reference's ParametricGameTests
(test/runtests.jl:88-116): two decoupled players with box-like private
inequalities; the analytic solution is clamp(θᵢ, ±lim) per player."""

import jax.numpy as jnp
import numpy as np

import mcp_tpu
from mcp_tpu import OptimizationProblem, ParametricGame
from mcp_tpu.games import dimensions, solve_game

LIM = 0.5


def make_clamp_game():
    def objective(i):
        return lambda xs, theta_i: jnp.sum((xs[i] - theta_i) ** 2)

    def box(i):
        return lambda xs, theta_i: jnp.concatenate([-xs[i] + LIM, xs[i] + LIM])

    problems = [
        OptimizationProblem(objective=objective(i), private_inequality=box(i))
        for i in range(2)
    ]
    return ParametricGame.create(
        test_point=[jnp.ones(2), jnp.ones(2)],
        test_parameter=[jnp.ones(2), jnp.ones(2)],
        problems=problems,
    )


class TestClampGame:
    def test_solution_is_clamp(self):
        game = make_clamp_game()
        theta_blocks = [jnp.array([-1.0, 0.0]), jnp.array([1.0, 1.0])]
        tol = 1e-4
        sol = solve_game(game, theta_blocks, tol=tol)
        assert int(sol.status) == mcp_tpu.SOLVED
        for i in range(2):
            expected = np.clip(np.asarray(theta_blocks[i]), -LIM, LIM)
            np.testing.assert_allclose(sol.primals[i], expected, atol=10 * tol)

    def test_flat_theta_equivalent(self):
        game = make_clamp_game()
        theta_flat = jnp.array([-1.0, 0.0, 1.0, 1.0])
        sol = solve_game(game, theta_flat, tol=1e-4)
        np.testing.assert_allclose(sol.primals[0], [-LIM, 0.0], atol=1e-3)
        np.testing.assert_allclose(sol.primals[1], [LIM, LIM], atol=1e-3)


class TestDimensions:
    def test_dual_sizing_by_test_point(self):
        """Dual sizes come from evaluating constraints at the test point
        (reference src/game.jl:159-183) — here with eval_shape, no FLOPs."""
        game = make_clamp_game()
        d = game.dims
        assert d.x == (2, 2)
        assert d.theta == (2, 2)
        assert d.lam == (0, 0)
        assert d.mu == (4, 4)
        assert d.shared_lam == 0 and d.shared_mu == 0
        assert game.mcp.unconstrained_dimension == 4
        assert game.mcp.constrained_dimension == 8

    def test_shared_constraint_dims(self):
        problems = [
            OptimizationProblem(objective=lambda xs, ti: jnp.sum(xs[i] ** 2))
            for i in range(2)
        ]
        d = dimensions(
            [jnp.ones(3), jnp.ones(3)],
            [jnp.ones(1), jnp.ones(1)],
            problems,
            lambda xs, ts: xs[0] - xs[1],  # 3 shared equalities
            lambda xs, ts: jnp.array([jnp.sum(xs[0] * xs[1])]),  # 1 shared ineq
        )
        assert d.shared_lam == 3
        assert d.shared_mu == 1


class TestSharedConstraintGame:
    def test_coupled_resource_game(self):
        """Two players each minimize (x_i - θ_i)², coupled by the shared
        inequality 1 - x₁ - x₂ ≥ 0. With θ = (1, 1) the symmetric equilibrium
        of the shared-dual KKT stacking is x₁ = x₂ = 1/2 (each player's
        stationarity: 2(x_i - 1) + μ̃ = 0 with the same shared μ̃ and the
        constraint active)."""
        problems = [
            OptimizationProblem(objective=lambda xs, ti, i=i: jnp.sum((xs[i] - ti) ** 2))
            for i in range(2)
        ]
        game = ParametricGame.create(
            test_point=[jnp.ones(1), jnp.ones(1)],
            test_parameter=[jnp.ones(1), jnp.ones(1)],
            problems=problems,
            shared_inequality=lambda xs, ts: jnp.array([1.0 - xs[0][0] - xs[1][0]]),
        )
        sol = solve_game(game, [jnp.array([1.0]), jnp.array([1.0])], tol=1e-4)
        assert int(sol.status) == mcp_tpu.SOLVED
        # Reference-style 10·tol oracle (test/runtests.jl:108-115): the IP
        # path's relaxed complementarity bounds the primal accuracy by the
        # last ϵ, not by tol itself.
        np.testing.assert_allclose(sol.primals[0], [0.5], atol=1e-3)
        np.testing.assert_allclose(sol.primals[1], [0.5], atol=1e-3)
