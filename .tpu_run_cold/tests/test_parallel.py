"""Batched-vs-single consistency (`vmap` parity) and sharded-mesh execution
on the 8-device virtual CPU mesh (SURVEY.md §4 calls these out as tests the
reference lacks entirely)."""

import jax
import jax.numpy as jnp
import numpy as np

import mcp_tpu
from mcp_tpu import PrimalDualMCP
from mcp_tpu.parallel import (
    batch_statistics,
    make_batch_mesh,
    solve_batch,
    solve_batch_sharded,
    solve_batches_streamed,
)

M = jnp.array([[2.0, 1.0], [1.0, 2.0]])
A = jnp.eye(2)
b = jnp.array([1.0, 1.0])


def make_mcp():
    return PrimalDualMCP.from_gh(
        lambda x, y, t: M @ x - t - A.T @ y,
        lambda x, y, t: A @ x - b,
        unconstrained_dimension=2,
        constrained_dimension=2,
        parameter_dimension=2,
    )


def theta_batch(B):
    key = jax.random.PRNGKey(0)
    return jax.random.normal(key, (B, 2), dtype=jnp.float64)


class TestVmapParity:
    def test_batched_matches_single(self):
        mcp = make_mcp()
        thetas = theta_batch(8)
        batched = solve_batch(mcp, thetas)
        for i in range(8):
            single = mcp_tpu.solve(mcp, thetas[i])
            np.testing.assert_allclose(batched.x[i], single.x, atol=1e-10)
            np.testing.assert_allclose(batched.y[i], single.y, atol=1e-10)
            assert int(batched.status[i]) == int(single.status)
            assert int(batched.outer_iters[i]) == int(single.outer_iters)

    def test_batched_gradients(self):
        mcp = make_mcp()
        thetas = theta_batch(4)

        def loss(ts):
            sol = solve_batch(mcp, ts)
            return jnp.sum(sol.x**2)

        g = jax.grad(loss)(thetas)
        assert g.shape == thetas.shape
        # Per-lane gradient equals the single-instance gradient.
        g0 = jax.grad(lambda t: jnp.sum(mcp_tpu.solve(mcp, t).x ** 2))(thetas[0])
        np.testing.assert_allclose(g[0], g0, atol=1e-8)

    def test_batch_statistics(self):
        mcp = make_mcp()
        stats = batch_statistics(solve_batch(mcp, theta_batch(8)))
        assert stats["num_instances"] == 8
        assert 0.0 <= stats["success_rate"] <= 1.0
        assert stats["median_outer_iters"] >= 1


class TestShardedMesh:
    def test_sharded_matches_unsharded(self):
        mcp = make_mcp()
        mesh = make_batch_mesh()
        assert mesh.devices.size == 8
        thetas = theta_batch(16)
        sharded, num_solved = solve_batch_sharded(mcp, thetas, mesh=mesh)
        local = solve_batch(mcp, thetas)
        np.testing.assert_allclose(sharded.x, local.x, atol=1e-10)
        np.testing.assert_allclose(sharded.kkt_error, local.kkt_error, atol=1e-10)
        assert int(num_solved) == int(jnp.sum(local.status == 0))

    def test_sharded_tridiag_composition(self):
        """The flagship config — banded tridiag Newton tier under shard_map
        over the batch mesh — must match the unsharded result."""
        from mcp_tpu.bench import lane_change as lc
        from mcp_tpu.solver import SolverOptions

        bench = lc.generate_test_problem(horizon=10)
        mcp = bench.parametric_game.mcp
        assert mcp.time_structure is not None
        thetas = lc.generate_parameter_batch(
            jax.random.PRNGKey(1), 8, bench, dtype=jnp.float32
        )
        opts = SolverOptions(linear_solver="tridiag")
        sharded, n_ok = solve_batch_sharded(
            mcp, thetas, mesh=make_batch_mesh(), options=opts
        )
        local = solve_batch(mcp, thetas, options=opts)
        # f32 op-scheduling differences between the sharded and local
        # programs accumulate over ~100 Newton iterations.
        np.testing.assert_allclose(sharded.x, local.x, atol=1e-4)
        assert int(n_ok) == int(jnp.sum(local.status == 0))

    def test_batch_divisibility_error(self):
        mcp = make_mcp()
        mesh = make_batch_mesh()
        try:
            solve_batch_sharded(mcp, theta_batch(10), mesh=mesh)
            raise AssertionError("expected ValueError")
        except ValueError as e:
            assert "divisible" in str(e)


class TestStreamedBatches:
    def test_streamed_matches_per_batch(self):
        mcp = make_mcp()
        K, B = 3, 4
        stack = jnp.stack([theta_batch(B) + 0.1 * k for k in range(K)])
        out = solve_batches_streamed(mcp, stack)
        assert out.x.shape == (K, B, 2)
        for k in range(K):
            ref = solve_batch(mcp, stack[k])
            # The scan-wrapped and standalone solves are different XLA
            # programs; fusion/remat differences can legally shift ULPs,
            # so float fields compare allclose (integer fields stay exact).
            np.testing.assert_allclose(out.x[k], ref.x, rtol=1e-6, atol=1e-6)
            np.testing.assert_allclose(out.y[k], ref.y, rtol=1e-6, atol=1e-6)
            np.testing.assert_array_equal(out.status[k], ref.status)
            np.testing.assert_array_equal(out.outer_iters[k], ref.outer_iters)

    def test_warm_chain_matches_host_loop(self):
        mcp = make_mcp()
        K, B = 4, 4
        base = theta_batch(B)
        stack = jnp.stack([base + 0.005 * k for k in range(K)])
        out = solve_batches_streamed(mcp, stack, warm_chain=True)
        # Host-side reference chain: step k warm-starts from step k-1's
        # (x, y); failed lanes keep the previous warm start.
        x = jnp.zeros((B, 2), base.dtype)
        y = jnp.ones((B, 2), base.dtype)
        for k in range(K):
            ref = solve_batch(mcp, stack[k], x0=x, y0=y)
            np.testing.assert_allclose(out.x[k], ref.x, rtol=1e-6, atol=1e-6)
            np.testing.assert_array_equal(out.outer_iters[k], ref.outer_iters)
            ok = (ref.status == 0)[:, None]
            x = jnp.where(ok, ref.x, x)
            y = jnp.where(ok, ref.y, y)
        # Warm-started re-solves converge in fewer iterations than cold.
        cold = solve_batch(mcp, stack[-1])
        assert float(jnp.median(out.outer_iters[-1])) <= float(
            jnp.median(cold.outer_iters)
        )
