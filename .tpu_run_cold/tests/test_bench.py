"""Benchmark harness tests: sequential/batched timing shapes, the
warm-started θ-sweep protocol, and QP generator conformance."""

import jax
import jax.numpy as jnp
import numpy as np

from mcp_tpu.bench import harness, lane_change as lc, qp
from mcp_tpu.solver import SolverOptions


class TestQPGenerator:
    def test_pack_unpack_roundtrip(self):
        theta = qp.generate_random_parameter(
            jax.random.PRNGKey(0), num_primals=6, num_inequalities=4
        )
        M, A, b, phi = qp.unpack_parameters(theta, num_primals=6, num_inequalities=4)
        assert M.shape == (6, 6) and A.shape == (4, 6)
        assert b.shape == (4,) and phi.shape == (6,)
        # M = PᵀP is PSD
        eig = np.linalg.eigvalsh(np.asarray(M, dtype=np.float64))
        assert eig.min() >= -1e-4

    def test_qp_batch_solves(self):
        problem = qp.generate_test_problem(num_primals=8, num_inequalities=6)
        # sparsity 0: the reference's 0.9 sparsity at 8x8 leaves M nearly
        # rank-zero (degenerate/infeasible by construction); dense small QPs
        # are strictly convex and must all solve.
        thetas = qp.generate_parameter_batch(
            jax.random.PRNGKey(1), 4, num_primals=8, num_inequalities=6,
            sparsity_rate=0.0,
        )
        stats = harness.benchmark_batched(
            problem.mcp, thetas, repeats=1, linear_solver="schur", tol=1e-6
        )
        assert stats["success_rate"] == 1.0
        # KKT conformance on one instance: G ≈ 0, H ≥ 0, y ≥ 0 at solution.
        from mcp_tpu.parallel.batch import solve_batch

        sol = solve_batch(
            problem.mcp, thetas, options=SolverOptions(linear_solver="schur", tol=1e-6)
        )
        g, h = problem.mcp.gh(sol.x[0], sol.y[0], thetas[0])
        assert float(jnp.max(jnp.abs(g))) < 5e-3
        assert float(jnp.min(h)) > -5e-3
        assert float(jnp.min(sol.y[0])) >= 0


class TestWarmSweep:
    def test_warm_sweep_protocol(self):
        bench = lc.generate_test_problem(horizon=10)
        mcp = bench.parametric_game.mcp
        key = jax.random.PRNGKey(3)
        base = lc.generate_parameter_batch(key, 4, bench, dtype=jnp.float32)
        # Small θ drift per sweep step (the receding-horizon pattern).
        sweep = jnp.stack([base + 0.02 * k for k in range(4)])
        out = harness.benchmark_warm_sweep(
            mcp, sweep, linear_solver="schur", tol=1e-4
        )
        assert out["sweep_steps"] == 4 and out["batch_size"] == 4
        assert out["final_success_rate"] == 1.0
        # Warm-started steps converge in no more outer iterations than the
        # cold first step.
        iters = out["median_outer_iters_per_step"]
        assert min(iters[1:]) <= iters[0]


class TestRelativeRuntime:
    def test_comparison_line(self):
        line = harness.relative_runtime(
            {"solves_per_sec": 100.0}, {"solves_per_sec": 10.0}
        )
        assert "10.0%" in line
