"""Gradient cross-checks through the solver, mirroring the reference's
AutodifferentationTests (test/runtests.jl:65-85): the gradient of a scalar
loss of the solution must agree across reverse mode, forward mode, and finite
differences within 1e-3."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcp_tpu
from mcp_tpu import PrimalDualMCP

M = jnp.array([[2.0, 1.0], [1.0, 2.0]])
A = jnp.eye(2)
b = jnp.array([1.0, 1.0])
THETA = jnp.array([-0.5, 0.5])


def make_mcp(compute_sensitivities=True):
    return PrimalDualMCP.from_gh(
        lambda x, y, theta: M @ x - theta - A.T @ y,
        lambda x, y, theta: A @ x - b,
        unconstrained_dimension=2,
        constrained_dimension=2,
        parameter_dimension=2,
        compute_sensitivities=compute_sensitivities,
    )


def loss(theta, mcp):
    sol = mcp_tpu.solve(mcp, theta)
    return jnp.sum(sol.x**2) + jnp.sum(sol.y**2)


class TestThreeWayGradientCheck:
    def test_reverse_forward_finite_agree(self):
        mcp = make_mcp()
        f = lambda t: loss(t, mcp)

        grad_reverse = jax.grad(f)(THETA)
        grad_forward = jax.jacfwd(f)(THETA)

        eps = 1e-5
        grad_fd = np.array(
            [
                (f(THETA.at[i].add(eps)) - f(THETA.at[i].add(-eps))) / (2 * eps)
                for i in range(2)
            ]
        )

        np.testing.assert_allclose(grad_reverse, grad_fd, atol=1e-3)
        np.testing.assert_allclose(grad_reverse, grad_forward, atol=1e-3)

    def test_jacobian_full_solution(self):
        """Forward-mode Jacobian of the full (x, y) solution map vs finite
        differences, exercising the per-output tangent rows (and the corrected
        s-tangent — reference bug at src/AutoDiff.jl:108-113 not replicated)."""
        mcp = make_mcp()

        def sol_vec(t):
            sol = mcp_tpu.solve(mcp, t)
            return jnp.concatenate([sol.x, sol.y, sol.s])

        J = jax.jacfwd(sol_vec)(THETA)
        eps = 1e-5
        J_fd = np.stack(
            [
                (sol_vec(THETA.at[i].add(eps)) - sol_vec(THETA.at[i].add(-eps)))
                / (2 * eps)
                for i in range(2)
            ],
            axis=1,
        )
        np.testing.assert_allclose(J, J_fd, atol=1e-3)

    def test_materialized_jacobian_matches_jacfwd(self):
        """solve_jacobian_theta (the reference _solve_jacobian_θ analog,
        src/AutoDiff.jl:18-40) agrees with jacfwd through the custom rule."""
        mcp = make_mcp()
        sol = mcp_tpu.solve(mcp, THETA)
        dz = mcp_tpu.solve_jacobian_theta(mcp, sol, THETA)

        def sol_vec(t):
            s = mcp_tpu.solve(mcp, t)
            return jnp.concatenate([s.x, s.y, s.s])

        np.testing.assert_allclose(dz, jax.jacfwd(sol_vec)(THETA), atol=1e-6)

    def test_grad_under_jit(self):
        mcp = make_mcp()
        g = jax.jit(jax.grad(lambda t: loss(t, mcp)))(THETA)
        assert np.all(np.isfinite(np.asarray(g)))


class TestSensitivityGate:
    def test_disabled_sensitivities_raise(self):
        """Error path parity: differentiating without compute_sensitivities
        raises (reference src/AutoDiff.jl:19-23)."""
        mcp = make_mcp(compute_sensitivities=False)
        with pytest.raises(ValueError, match="compute_sensitivities"):
            jax.grad(lambda t: loss(t, mcp))(THETA)

    def test_plain_solve_still_works(self):
        mcp = make_mcp(compute_sensitivities=False)
        sol = mcp_tpu.solve(mcp, THETA)
        assert int(sol.status) == mcp_tpu.SOLVED
