"""Tensor-parallel (single-factorization sharding) tests on the 8-device
virtual CPU mesh: distributed blocked-LU parity vs the dense solve, and the
TP interior-point solve matching the single-device solver bit-for-iterate.

The reference factorizes on one CPU core (src/solver.jl:50); TP is new
TPU-mandated design surface (SURVEY.md §2.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcp_tpu import PrimalDualMCP
from mcp_tpu.parallel.batch import solve_batch
from mcp_tpu.parallel.tensor import (
    lu_solve_tp,
    make_tp_mesh,
    padded_dimension,
    solve_single_tp,
)
from mcp_tpu.solver import SolverOptions


@pytest.fixture(scope="module")
def mesh():
    return make_tp_mesh()


class TestDistributedLU:
    @pytest.mark.parametrize(
        "n,panel", [(64, 8), (100, 8), (256, 32), (300, 16)]
    )
    def test_matches_dense_solve(self, mesh, n, panel):
        rng = np.random.RandomState(n)
        A = jnp.asarray(rng.randn(n, n) + 0.1 * n * np.eye(n))
        b = jnp.asarray(rng.randn(n))
        x = lu_solve_tp(A, b, mesh=mesh, panel=panel)
        ref = jnp.linalg.solve(A, b)
        np.testing.assert_allclose(np.asarray(x), np.asarray(ref), atol=1e-9)

    def test_requires_pivoting(self, mesh):
        # Zero diagonal everywhere: unpivoted LU breaks down immediately.
        swap = jnp.array([[0.0, 1.0], [1.0, 0.0]])
        A = jax.scipy.linalg.block_diag(*[swap] * 32)
        b = jnp.asarray(np.random.RandomState(0).randn(64))
        x = lu_solve_tp(A, b, mesh=mesh, panel=8)
        np.testing.assert_allclose(np.asarray(A @ x), np.asarray(b), atol=1e-12)

    def test_padding(self):
        assert padded_dimension(100, 8, 8) == 128
        assert padded_dimension(64, 8, 8) == 64
        assert padded_dimension(65, 8, 8) == 128


def _qp_mcp(n=30, m=20):
    rng = np.random.RandomState(7)
    P = rng.randn(n, n)
    M = jnp.asarray(P @ P.T + n * np.eye(n))
    A = jnp.asarray(rng.randn(m, n))
    b = jnp.asarray(rng.randn(m))
    return PrimalDualMCP.from_gh(
        lambda x, y, t: M @ x - t - A.T @ y,
        lambda x, y, t: A @ x - b,
        unconstrained_dimension=n,
        constrained_dimension=m,
        parameter_dimension=n,
    )


class TestSolveSingleTP:
    def test_matches_single_device(self, mesh):
        mcp = _qp_mcp()
        theta = jax.random.normal(jax.random.PRNGKey(1), (30,), jnp.float64)
        opts = SolverOptions(linear_solver="condensed")
        tp = solve_single_tp(mcp, theta, mesh=mesh, panel=8, options=opts)
        ref = solve_batch(mcp, theta[None], options=opts)
        assert int(tp.status) == int(ref.status[0]) == 0
        assert int(tp.outer_iters) == int(ref.outer_iters[0])
        np.testing.assert_allclose(
            np.asarray(tp.x), np.asarray(ref.x[0]), atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(tp.y), np.asarray(ref.y[0]), atol=1e-10
        )

    def test_polish_rides_override(self, mesh):
        # The certifying polish loop must reuse the injected TP Newton step.
        mcp = _qp_mcp()
        theta = jax.random.normal(jax.random.PRNGKey(2), (30,), jnp.float64)
        opts = SolverOptions(linear_solver="condensed", polish=True, tol=1e-8)
        tp = solve_single_tp(mcp, theta, mesh=mesh, panel=8, options=opts)
        assert int(tp.status) == 0
        assert float(tp.kkt_error) <= 1e-8

    def test_gradient_matches_single_device(self, mesh):
        # Differentiable TP: jax.grad through solve_single_tp (IFT custom
        # rule with sharded forward factorizations) equals the grad through
        # the single-device solve. Condensed sensitivities on an
        # assume_hy_zero MCP additionally shard the backward core solves.
        import dataclasses

        mcp = dataclasses.replace(_qp_mcp(), assume_hy_zero=True)
        theta = jax.random.normal(jax.random.PRNGKey(5), (30,), jnp.float64)
        opts = SolverOptions(
            linear_solver="condensed", sensitivity_solver="condensed"
        )

        def loss_tp(t):
            sol = solve_single_tp(mcp, t, mesh=mesh, panel=8, options=opts)
            return jnp.sum(sol.x**2)

        def loss_ref(t):
            from mcp_tpu import solve

            return jnp.sum(solve(mcp, t, options=opts).x ** 2)

        g_tp = jax.grad(loss_tp)(theta)
        g_ref = jax.grad(loss_ref)(theta)
        np.testing.assert_allclose(
            np.asarray(g_tp), np.asarray(g_ref), rtol=1e-8, atol=1e-10
        )

    def test_rejects_structured_tiers(self, mesh):
        mcp = _qp_mcp()
        theta = jnp.zeros(30)
        with pytest.raises(ValueError, match="condensed"):
            solve_single_tp(
                mcp, theta, mesh=mesh,
                options=SolverOptions(linear_solver="schur"),
            )

    def test_mehrotra_not_supported(self):
        from mcp_tpu.solver import ip_solve

        mcp = _qp_mcp()
        theta = jnp.zeros(30)
        with pytest.raises(NotImplementedError):
            ip_solve(
                mcp,
                SolverOptions(algorithm="mehrotra"),
                theta,
                jnp.zeros(30),
                jnp.ones(20),
                jnp.ones(20),
                newton_solver=lambda *a: None,
            )
