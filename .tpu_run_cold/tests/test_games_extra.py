"""Additional game/MCP coverage: private equality constraints and
interleaved box-form bounds (paths the clamp-game oracle doesn't touch)."""

import jax.numpy as jnp
import numpy as np

import mcp_tpu
from mcp_tpu import OptimizationProblem, ParametricGame, PrimalDualMCP
from mcp_tpu.games import solve_game

M = jnp.array([[2.0, 1.0], [1.0, 2.0]])
A = jnp.eye(2)
b = jnp.array([1.0, 1.0])
THETA = jnp.array([-0.5, 0.5])


class TestPrivateEquality:
    def test_projection_onto_hyperplane(self):
        """min ‖x-θ‖² s.t. Σx = 1 has the analytic solution
        x = θ - (Σθ-1)/d · 1 (projection); exercises the λ dual block."""
        problems = [
            OptimizationProblem(
                objective=lambda xs, ti: jnp.sum((xs[0] - ti) ** 2),
                private_equality=lambda xs, ti: jnp.array([jnp.sum(xs[0]) - 1.0]),
            )
        ]
        game = ParametricGame.create(
            test_point=[jnp.ones(2)],
            test_parameter=[jnp.ones(2)],
            problems=problems,
        )
        assert game.dims.lam == (1,)
        theta = jnp.array([0.3, 0.9])
        sol = solve_game(game, [theta], tol=1e-6)
        expected = theta - (jnp.sum(theta) - 1.0) / 2.0
        assert int(sol.status) == mcp_tpu.SOLVED
        np.testing.assert_allclose(sol.primals[0], expected, atol=1e-4)

    def test_mixed_private_constraints(self):
        """Equality + inequality in one problem: min ‖x-θ‖² s.t. Σx = 1,
        x ≥ 0; with θ = (2, -1), solution is (1, 0) — the inequality binds."""
        problems = [
            OptimizationProblem(
                objective=lambda xs, ti: jnp.sum((xs[0] - ti) ** 2),
                private_equality=lambda xs, ti: jnp.array([jnp.sum(xs[0]) - 1.0]),
                private_inequality=lambda xs, ti: xs[0],
            )
        ]
        game = ParametricGame.create(
            test_point=[jnp.ones(2)],
            test_parameter=[jnp.ones(2)],
            problems=problems,
        )
        sol = solve_game(game, [jnp.array([2.0, -1.0])], tol=1e-6)
        assert int(sol.status) == mcp_tpu.SOLVED
        np.testing.assert_allclose(sol.primals[0], [1.0, 0.0], atol=1e-3)


class TestInterleavedBoxForm:
    def test_permuted_bounds_match_contiguous(self):
        """from_k with interleaved free/nonnegative rows must agree with the
        contiguous formulation (the index scatter path in mcp.from_k)."""

        def K_contiguous(z, theta):
            x, y = z[:2], z[2:]
            return jnp.concatenate(
                [M @ x - theta - A.T @ y, A @ x - b]
            )

        # Interleaved layout: z' = [x1, y1, x2, y2]
        def K_interleaved(z, theta):
            x = jnp.array([z[0], z[2]])
            y = jnp.array([z[1], z[3]])
            k = K_contiguous(jnp.concatenate([x, y]), theta)
            return jnp.array([k[0], k[2], k[1], k[3]])

        mcp_c = PrimalDualMCP.from_k(
            K_contiguous,
            [-np.inf, -np.inf, 0.0, 0.0],
            [np.inf] * 4,
            parameter_dimension=2,
        )
        mcp_i = PrimalDualMCP.from_k(
            K_interleaved,
            [-np.inf, 0.0, -np.inf, 0.0],
            [np.inf] * 4,
            parameter_dimension=2,
        )
        sol_c = mcp_tpu.solve(mcp_c, THETA)
        sol_i = mcp_tpu.solve(mcp_i, THETA)
        assert int(sol_i.status) == mcp_tpu.SOLVED
        np.testing.assert_allclose(sol_i.x, sol_c.x, atol=1e-6)
        np.testing.assert_allclose(sol_i.y, sol_c.y, atol=1e-6)
