"""Mehrotra predictor-corrector opt-in (SolverOptions(algorithm="mehrotra")).

No reference counterpart (the reference's only algorithm is the ϵ-annealed
loop, src/solver.jl:67-119); conformance here means: same solutions as the
"ip" algorithm on the same problems, fewer Jacobian evaluations on monotone
problems and warm-started re-solves, and unchanged API semantics
(status/kkt_error/outer_iters, vmap, jax.grad)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcp_tpu
from mcp_tpu import PrimalDualMCP, SolverOptions, solve
from mcp_tpu.bench import lane_change as lc
from mcp_tpu.bench import qp
from mcp_tpu.parallel.batch import batch_statistics, solve_batch
from mcp_tpu.types import SOLVED


def _readme_qp():
    M = jnp.array([[2.0, 1.0], [1.0, 2.0]])
    A = jnp.eye(2)
    b = jnp.array([1.0, 1.0])
    G = lambda x, y, th: M @ x - A.T @ y + th
    H = lambda x, y, th: A @ x - b
    return PrimalDualMCP.from_gh(
        G,
        H,
        unconstrained_dimension=2,
        constrained_dimension=2,
        parameter_dimension=2,
    )


class TestMehrotraQP:
    @pytest.mark.parametrize(
        "tier", ["dense", "condensed", "schur", "schur_pallas", "gmres"]
    )
    def test_readme_qp_all_tiers(self, tier):
        mcp = _readme_qp()
        theta = jnp.array([-0.5, 0.5])
        sol = solve(
            mcp,
            theta,
            options=SolverOptions(
                linear_solver=tier, algorithm="mehrotra", tol=1e-6
            ),
        )
        assert int(sol.status) == SOLVED
        np.testing.assert_allclose(np.asarray(sol.x), [1.0, 1.0], atol=1e-4)

    def test_batch_random_qps_fewer_iterations(self):
        problem = qp.generate_test_problem(num_primals=40, num_inequalities=40)
        # sparsity 0.5 keeps M full-rank: the reference's 0.9 default admits
        # infeasible instances (quadratic_program_benchmark.jl:5) that both
        # algorithms fail on identically.
        thetas = qp.generate_parameter_batch(
            jax.random.PRNGKey(1), 8, num_primals=40, num_inequalities=40,
            sparsity_rate=0.5,
        ).astype(jnp.float64)
        ip = SolverOptions(linear_solver="schur", tol=1e-6)
        me = dataclasses.replace(ip, algorithm="mehrotra")
        sol_ip = solve_batch(problem.mcp, thetas, options=ip)
        sol_me = solve_batch(problem.mcp, thetas, options=me)
        st_ip, st_me = batch_statistics(sol_ip), batch_statistics(sol_me)
        assert st_me["success_rate"] == 1.0
        # Each Mehrotra iteration is one Jacobian evaluation; each IP outer
        # iteration is ≥1. Mehrotra should not need more than the IP outers.
        assert st_me["median_outer_iters"] <= st_ip["median_outer_iters"]
        # Same solutions (both KKT points of the same convex QP).
        np.testing.assert_allclose(
            np.asarray(sol_me.x), np.asarray(sol_ip.x), atol=1e-3
        )

    def test_unknown_algorithm_raises(self):
        mcp = _readme_qp()
        with pytest.raises(ValueError, match="unknown algorithm"):
            solve(
                mcp,
                jnp.array([-0.5, 0.5]),
                options=SolverOptions(algorithm="newton-ish"),
            )


class TestMehrotraUnconstrained:
    def test_pure_rootfind_falls_back(self):
        # m = 0: predictor == corrector; delegates to the Newton loop.
        M = jnp.array([[3.0, 1.0], [1.0, 2.0]])
        G = lambda x, y, th: M @ x - th
        mcp = PrimalDualMCP.from_gh(
            G,
            lambda x, y, th: jnp.zeros((0,)),
            unconstrained_dimension=2,
            constrained_dimension=0,
            parameter_dimension=2,
        )
        theta = jnp.array([1.0, -2.0])
        sol = solve(
            mcp, theta, options=SolverOptions(algorithm="mehrotra", tol=1e-8)
        )
        assert int(sol.status) == SOLVED
        np.testing.assert_allclose(
            np.asarray(sol.x), np.linalg.solve(np.asarray(M), [1.0, -2.0]), atol=1e-5
        )


class TestMehrotraWarmStartedGames:
    def test_warm_resolve_beats_annealed_loop(self):
        bench = lc.generate_test_problem(horizon=10)
        mcp = bench.parametric_game.mcp
        th = lc.generate_parameter_batch(
            jax.random.PRNGKey(0), 8, bench, dtype=jnp.float64
        )
        ip = SolverOptions(linear_solver="schur", tol=1e-4)
        me = dataclasses.replace(ip, algorithm="mehrotra")
        sol0 = solve_batch(mcp, th, options=ip)
        th2 = th + 0.005
        # Warm (x, y, s): Mehrotra re-solves everything in fewer iterations.
        sol_me = solve_batch(
            mcp, th2, x0=sol0.x, y0=sol0.y, s0=sol0.s, options=me
        )
        sol_ip = solve_batch(
            mcp, th2, x0=sol0.x, y0=sol0.y, s0=sol0.s, options=ip
        )
        st_me, st_ip = batch_statistics(sol_me), batch_statistics(sol_ip)
        assert st_me["success_rate"] == 1.0
        assert st_me["median_outer_iters"] < st_ip["median_outer_iters"]

    def test_warm_sweep_with_mehrotra(self):
        from mcp_tpu.bench import harness

        bench = lc.generate_test_problem(horizon=10)
        mcp = bench.parametric_game.mcp
        base = lc.generate_parameter_batch(
            jax.random.PRNGKey(3), 4, bench, dtype=jnp.float64
        )
        sweep = jnp.stack([base + 0.01 * k for k in range(3)])
        out = harness.benchmark_warm_sweep(
            mcp,
            sweep,
            options=SolverOptions(
                linear_solver="schur", algorithm="mehrotra", tol=1e-4
            ),
            cold_options=SolverOptions(linear_solver="schur", tol=1e-4),
            warm_slacks=True,
        )
        assert out["final_success_rate"] == 1.0

    def test_strategy_warm_start_slacks_kwarg(self):
        from mcp_tpu.trajectories.strategies import solve_trajectory_game

        bench = lc.generate_test_problem(horizon=10)
        theta = lc.generate_random_parameter(
            jax.random.PRNGKey(5), bench, dtype=jnp.float64
        )
        th_blocks = [theta[:5], theta[5:]]  # per-player [state(4); lane(1)]
        ip = SolverOptions(linear_solver="schur", tol=1e-4)
        me = dataclasses.replace(ip, algorithm="mehrotra")
        _, sol0 = solve_trajectory_game(
            bench.game,
            10,
            th_blocks,
            parametric_game=bench.parametric_game,
            options=ip,
        )
        assert int(sol0.status) == SOLVED
        _, sol1 = solve_trajectory_game(
            bench.game,
            10,
            th_blocks,
            parametric_game=bench.parametric_game,
            last_solution=sol0,
            options=me,
            warm_start_slacks=True,
        )
        assert int(sol1.status) == SOLVED
        assert int(sol1.outer_iters) <= int(sol0.outer_iters)


class TestBandedRefinement:
    """Iterative refinement in band form (kernels/block_tridiag.banded_jac_mv):
    the banded Mehrotra path previously disabled refinement; it now refines
    against the true Jacobian assembled from the same bands."""

    def test_banded_jac_mv_matches_dense(self):
        from mcp_tpu.kernels.block_tridiag import banded_jac_mv, gh_banded

        bench = lc.generate_test_problem(horizon=10)
        mcp = bench.parametric_game.mcp
        ts = mcp.time_structure
        n, m = mcp.unconstrained_dimension, mcp.constrained_dimension
        theta = lc.generate_random_parameter(
            jax.random.PRNGKey(0), bench, dtype=jnp.float64
        )
        ks = jax.random.split(jax.random.PRNGKey(1), 6)
        x = jax.random.normal(ks[0], (n,), jnp.float64) * 0.1
        y = jnp.abs(jax.random.normal(ks[1], (m,), jnp.float64)) + 0.5
        s = jnp.abs(jax.random.normal(ks[2], (m,), jnp.float64)) + 0.5
        dx = jax.random.normal(ks[3], (n,), jnp.float64)
        dy = jax.random.normal(ks[4], (m,), jnp.float64)
        ds = jax.random.normal(ks[5], (m,), jnp.float64)

        _, _, diag, lower, upper, Gyb, Hxb = gh_banded(mcp, ts, x, y, theta)
        eG, eH, eC = banded_jac_mv(diag, lower, upper, Gyb, Hxb, y, s, dx, dy, ds, ts)

        _, _, Gx, Gy, Hx, Hy = mcp.gh_linearized(x, y, theta)
        np.testing.assert_allclose(np.asarray(eG), np.asarray(Gx @ dx + Gy @ dy), atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(eH), np.asarray(Hx @ dx + Hy @ dy - ds), atol=1e-12
        )
        np.testing.assert_allclose(np.asarray(eC), np.asarray(s * dy + y * ds), atol=1e-12)

    def test_banded_mehrotra_warm_resolve(self):
        """Mehrotra on the tridiag (banded) tier with refinement enabled:
        warm re-solves succeed and match the schur-tier solution."""
        bench = lc.generate_test_problem(horizon=10)
        mcp = bench.parametric_game.mcp
        th = lc.generate_parameter_batch(
            jax.random.PRNGKey(0), 4, bench, dtype=jnp.float64
        )
        ip = SolverOptions(linear_solver="tridiag", tol=1e-4)
        sol0 = solve_batch(mcp, th, options=ip)
        th2 = th + 0.005
        me_banded = dataclasses.replace(
            ip, algorithm="mehrotra", refinement_steps=1
        )
        me_schur = SolverOptions(
            linear_solver="schur", tol=1e-4, algorithm="mehrotra",
            refinement_steps=1,
        )
        sol_b = solve_batch(mcp, th2, x0=sol0.x, y0=sol0.y, s0=sol0.s, options=me_banded)
        sol_s = solve_batch(mcp, th2, x0=sol0.x, y0=sol0.y, s0=sol0.s, options=me_schur)
        assert batch_statistics(sol_b)["success_rate"] == 1.0
        np.testing.assert_allclose(
            np.asarray(sol_b.x), np.asarray(sol_s.x), atol=1e-3
        )


class TestMehrotraGradients:
    def test_grad_matches_ip_algorithm(self):
        mcp = _readme_qp()
        theta = jnp.array([-0.5, 0.5])

        def loss(th, opts):
            sol = mcp_tpu.solve(mcp, th, options=opts)
            return jnp.sum(sol.x**2)

        ip = SolverOptions(linear_solver="schur", tol=1e-8)
        me = dataclasses.replace(ip, algorithm="mehrotra")
        g_ip = jax.grad(loss)(theta, ip)
        g_me = jax.grad(loss)(theta, me)
        np.testing.assert_allclose(np.asarray(g_me), np.asarray(g_ip), atol=1e-3)
