"""QP-KKT solver oracle tests, mirroring the reference's QPTestProblem testset
(reference test/runtests.jl:8-63):

    min_x 0.5 xᵀMx - θᵀx   s.t.  Ax - b ≥ 0
    KKT:  G(x, y) = Mx - θ - Aᵀy = 0,   0 ≤ y ⟂ H(x, y) = Ax - b ≥ 0.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcp_tpu
from mcp_tpu import PrimalDualMCP, SOLVED

M = jnp.array([[2.0, 1.0], [1.0, 2.0]])
A = jnp.eye(2)
b = jnp.array([1.0, 1.0])
THETA = jnp.array([-0.5, 0.5])


def G(x, y, theta):
    return M @ x - theta - A.T @ y


def H(x, y, theta):
    return A @ x - b


def K(z, theta):
    x, y = z[:2], z[2:]
    return jnp.concatenate([G(x, y, theta), H(x, y, theta)])


def check_solution(sol):
    """The reference's solution oracle (test/runtests.jl:30-38)."""
    np.testing.assert_array_less(np.abs(G(sol.x, sol.y, THETA)), 5e-3)
    assert np.all(np.asarray(H(sol.x, sol.y, THETA)) >= 0)
    assert np.all(np.asarray(sol.y) >= 0)
    assert float(jnp.sum(sol.y * H(sol.x, sol.y, THETA))) <= 5e-3
    assert np.all(np.asarray(sol.s) <= 5e-3)
    assert float(sol.kkt_error) <= 5e-3
    assert int(sol.status) == SOLVED


def make_gh_mcp(**kwargs):
    return PrimalDualMCP.from_gh(
        G,
        H,
        unconstrained_dimension=2,
        constrained_dimension=2,
        parameter_dimension=2,
        **kwargs,
    )


class TestBasicCallableConstructor:
    def test_solve(self):
        sol = mcp_tpu.solve(make_gh_mcp(), THETA)
        check_solution(sol)


class TestAlternativeCallableConstructor:
    def test_solve(self):
        mcp = PrimalDualMCP.from_k(
            K,
            [-np.inf, -np.inf, 0.0, 0.0],
            [np.inf] * 4,
            parameter_dimension=2,
        )
        sol = mcp_tpu.solve(mcp, THETA)
        check_solution(sol)

    def test_bounds_validation(self):
        with pytest.raises(ValueError):
            PrimalDualMCP.from_k(K, [-np.inf] * 4, [np.inf] * 3 + [1.0], parameter_dimension=2)
        with pytest.raises(ValueError):
            PrimalDualMCP.from_k(K, [-np.inf, 1.0, 0.0, 0.0], [np.inf] * 4, parameter_dimension=2)


class TestLinearSolverTiers:
    def test_condensed_matches_dense(self):
        """The condensed Schur elimination is exact (linalg.py): solutions from
        both tiers agree to fp roundoff."""
        mcp = make_gh_mcp()
        sol_c = mcp_tpu.solve(mcp, THETA, linear_solver="condensed")
        sol_d = mcp_tpu.solve(mcp, THETA, linear_solver="dense")
        np.testing.assert_allclose(sol_c.x, sol_d.x, atol=1e-8)
        np.testing.assert_allclose(sol_c.y, sol_d.y, atol=1e-8)
        np.testing.assert_allclose(sol_c.s, sol_d.s, atol=1e-8)
        assert int(sol_c.outer_iters) == int(sol_d.outer_iters)

    def test_gmres_tier_with_knobs(self):
        """GMRES tier with the pluggable knobs (reference src/solver.jl:33,50
        accepts arbitrary LinearSolve algorithms + options): solves the QP
        oracle with and without the Jacobi preconditioner, and a starved
        iteration budget degrades the Newton direction without crashing."""
        mcp = make_gh_mcp()
        for pre in ("none", "jacobi"):
            sol = mcp_tpu.solve(
                mcp,
                THETA,
                options=mcp_tpu.SolverOptions(
                    linear_solver="gmres", gmres_preconditioner=pre
                ),
            )
            check_solution(sol)
        starved = mcp_tpu.solve(
            mcp,
            THETA,
            options=mcp_tpu.SolverOptions(
                linear_solver="gmres", gmres_maxiter=1, gmres_restart=1,
                gmres_tol=1e-1, max_outer_iters=60,
            ),
        )
        # More outer iterations than the exact tier, but no crash.
        exact = mcp_tpu.solve(mcp, THETA, linear_solver="condensed")
        assert int(starved.outer_iters) >= int(exact.outer_iters)


class TestWarmStart:
    def test_warm_start_on_perturbed_theta(self):
        """The receding-horizon pattern: re-solve a slightly shifted problem
        from the previous solution's (x, y) (reference examples/utils.jl:209-216).
        Must still satisfy the oracle for the new θ."""
        mcp = make_gh_mcp()
        sol = mcp_tpu.solve(mcp, THETA)
        theta2 = THETA + 0.01
        sol2 = mcp_tpu.solve(mcp, theta2, x0=sol.x, y0=sol.y)
        assert int(sol2.status) == SOLVED
        np.testing.assert_array_less(np.abs(G(sol2.x, sol2.y, theta2)), 5e-3)
        assert np.all(np.asarray(sol2.y) >= -1e-12)


class TestStatuses:
    def test_infeasible_reports_failure_or_no_false_success(self):
        """An infeasible problem (x ≥ 1 and -x ≥ 1) must not report a solved
        status with a large kkt_error below tolerance semantics."""

        def H_bad(x, y, theta):
            return jnp.concatenate([x - 1.0, -x - 1.0])

        mcp = PrimalDualMCP.from_gh(
            G=lambda x, y, theta: M @ x - theta - jnp.concatenate([jnp.eye(2), -jnp.eye(2)]).T @ y,
            H=H_bad,
            unconstrained_dimension=2,
            constrained_dimension=4,
            parameter_dimension=2,
        )
        sol = mcp_tpu.solve(mcp, THETA)
        solved_and_accurate = int(sol.status) == SOLVED and float(sol.kkt_error) <= 5e-3
        assert not solved_and_accurate


class TestFloat32:
    def test_f32_solve(self):
        """TPU-dtype path: float32 solve reaches the (looser) oracle."""
        mcp = make_gh_mcp()
        sol = mcp_tpu.solve(mcp, THETA.astype(jnp.float32), tol=1e-3)
        assert sol.x.dtype == jnp.float32
        assert int(sol.status) == SOLVED
        np.testing.assert_array_less(np.abs(G(sol.x, sol.y, THETA)), 2e-2)


class TestPolish:
    """SolverOptions(polish=True): the annealed loop's ϵ ≤ tol exit can
    report :solved with the TRUE residual above tol (src/solver.jl:67-119);
    polish runs extra Newton steps until ‖(g, h−s, s∘y)‖∞ ≤ tol and makes
    the status honest."""

    def _true_kkt(self, mcp, sol, theta):
        g, h = mcp.gh(sol.x, sol.y, theta)
        return float(
            jnp.maximum(
                jnp.max(jnp.abs(g)),
                jnp.maximum(jnp.max(jnp.abs(h - sol.s)), jnp.max(jnp.abs(sol.s * sol.y))),
            )
        )

    def test_polish_certifies_tight_tolerance(self):
        mcp = make_gh_mcp()
        tol = 1e-10
        sol = mcp_tpu.solve(
            mcp, THETA, options=mcp_tpu.SolverOptions(tol=tol, polish=True)
        )
        assert int(sol.status) == SOLVED
        assert self._true_kkt(mcp, sol, THETA) <= tol
        # kkt_error now reports the true residual, not the stale metric.
        assert float(sol.kkt_error) <= tol

    def test_unpolished_can_miss_true_tolerance(self):
        """The contrast case documenting WHY polish exists: the reference's
        own benchmark-protocol QPs (100 primals + 100 inequalities,
        path.jl:5-17) at its tol 1e-6, where the plain loop exits :solved
        with the true residual above tol and polish certifies it."""
        from mcp_tpu.bench import qp
        from mcp_tpu.bench.harness import true_kkt_errors
        from mcp_tpu.parallel.batch import solve_batch

        problem = qp.generate_test_problem()
        thetas = qp.generate_parameter_batch(
            jax.random.PRNGKey(1), 4, dtype=jnp.float64
        )
        tol = 1e-6
        plain = solve_batch(
            problem.mcp, thetas, options=mcp_tpu.SolverOptions(tol=tol)
        )
        polished = solve_batch(
            problem.mcp, thetas, options=mcp_tpu.SolverOptions(tol=tol, polish=True)
        )
        tk_plain = np.asarray(true_kkt_errors(problem.mcp, plain, thetas))
        tk_pol = np.asarray(true_kkt_errors(problem.mcp, polished, thetas))
        assert (np.asarray(plain.status) == SOLVED).all()
        assert (np.asarray(polished.status) == SOLVED).all()
        assert (tk_pol <= tol).all()
        # The plain loop genuinely misses it (otherwise this test is vacuous).
        assert tk_plain.max() > tol

    def test_polish_fails_honestly_below_f32_floor(self):
        """f32 floors around 2e-6 true residual on the 100-dim QPs
        (cancellation in O(1)-magnitude g rows); with polish the status
        reports that instead of claiming :solved."""
        from mcp_tpu.bench import qp
        from mcp_tpu.parallel.batch import solve_batch

        problem = qp.generate_test_problem()
        thetas = qp.generate_parameter_batch(
            jax.random.PRNGKey(1), 4, dtype=jnp.float32
        )
        sol = solve_batch(
            problem.mcp, thetas,
            options=mcp_tpu.SolverOptions(tol=1e-8, polish=True),
        )
        assert (np.asarray(sol.status) != SOLVED).all()


class TestLinesearchPair:
    def test_pair_matches_single(self):
        """The fused pair fraction-to-the-boundary search returns bitwise
        the same alphas as two independent searches (reference semantics:
        src/solver.jl:127-138)."""
        from mcp_tpu.solver import (
            fraction_to_the_boundary_linesearch,
            fraction_to_the_boundary_linesearch_pair,
        )

        key = jax.random.PRNGKey(0)
        kw = dict(tau=0.995, decay=0.5, min_stepsize=1e-4)
        for i in range(50):
            key, k1, k2, k3 = jax.random.split(key, 4)
            m = 23
            scale = 10.0 ** jax.random.uniform(k3, (), minval=-4, maxval=1)
            v = jnp.abs(jax.random.normal(k1, (2, m))) * scale
            dv = jax.random.normal(k2, (2, m)) * 10.0 * scale
            a = fraction_to_the_boundary_linesearch_pair(v, dv, **kw)
            expect = jnp.stack(
                [
                    fraction_to_the_boundary_linesearch(v[0], dv[0], **kw),
                    fraction_to_the_boundary_linesearch(v[1], dv[1], **kw),
                ]
            )
            np.testing.assert_array_equal(np.asarray(a), np.asarray(expect))

    def test_pair_infeasible_is_nan(self):
        from mcp_tpu.solver import fraction_to_the_boundary_linesearch_pair

        v = jnp.full((2, 5), 1e-9)
        dv = jnp.full((2, 5), -1.0)
        a = fraction_to_the_boundary_linesearch_pair(
            v, dv, tau=0.995, decay=0.5, min_stepsize=1e-4
        )
        assert bool(jnp.all(jnp.isnan(a)))


class TestAffineFastPath:
    """Constant-Jacobian (affine) fast path: the solver hoists the Jacobian
    extraction out of the Newton loop when mcp.affine is set (the dense
    analog of the trajectory games' affine_bands; VERDICT r3 item 2)."""

    def _qp(self, n=8, m=6):
        from mcp_tpu.bench import qp

        problem = qp.generate_test_problem(num_primals=n, num_inequalities=m)
        # sparsity_rate=0 (dense): at these tiny dims the reference's 0.9
        # Bernoulli masking zeroes whole constraint rows, making every
        # instance infeasible (zero row of A with b_i > 0).
        theta = qp.generate_random_parameter(
            jax.random.PRNGKey(3),
            num_primals=n,
            num_inequalities=m,
            sparsity_rate=0.0,
            dtype=jnp.float64,
        )
        return problem.mcp, theta

    def test_qp_bench_is_affine(self):
        from mcp_tpu.mcp import verify_affine

        mcp, theta = self._qp()
        assert mcp.affine
        assert verify_affine(mcp, theta)

    def test_nonaffine_detected(self):
        from mcp_tpu.mcp import verify_affine

        mcp = PrimalDualMCP.from_gh(
            lambda x, y, t: x**2 - t,
            lambda x, y, t: x + 1.0,
            unconstrained_dimension=2,
            constrained_dimension=2,
            parameter_dimension=2,
        )
        assert not verify_affine(mcp, jnp.ones(2))

    @pytest.mark.parametrize("algorithm", ["ip", "mehrotra"])
    def test_matches_generic_path(self, algorithm):
        import dataclasses

        mcp, theta = self._qp()
        slow = dataclasses.replace(mcp, affine=False)
        opts = dict(
            tol=1e-6, linear_solver="schur", algorithm=algorithm, polish=True
        )
        fast_sol = mcp_tpu.solve(mcp, theta, **opts)
        slow_sol = mcp_tpu.solve(slow, theta, **opts)
        assert int(fast_sol.status) == SOLVED
        assert int(slow_sol.status) == SOLVED
        np.testing.assert_allclose(fast_sol.x, slow_sol.x, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(fast_sol.y, slow_sol.y, rtol=1e-5, atol=1e-6)

    def test_polish_certifies_affine(self):
        mcp, theta = self._qp()
        sol = mcp_tpu.solve(
            mcp, theta, tol=1e-6, linear_solver="condensed", polish=True
        )
        assert int(sol.status) == SOLVED
        assert float(sol.kkt_error) <= 1e-6


class TestHybridAlgorithm:
    """algorithm="hybrid": annealed warm-up to hybrid_switch_tol, then
    Mehrotra PC to tolerance (solver.py; VERDICT r3 item 4 — iteration-count
    lever for the small-batch flagships)."""

    def test_solves_qp_oracle(self):
        sol = mcp_tpu.solve(
            make_gh_mcp(), THETA, algorithm="hybrid", polish=True
        )
        check_solution(sol)

    def test_certifies_at_tol(self):
        sol = mcp_tpu.solve(
            make_gh_mcp(), THETA, algorithm="hybrid", polish=True, tol=1e-6
        )
        assert int(sol.status) == SOLVED
        assert float(sol.kkt_error) <= 1e-6

    def test_lane_change_certifies(self):
        from mcp_tpu.bench import lane_change as lc
        from mcp_tpu.parallel.batch import solve_batch
        from mcp_tpu.solver import SolverOptions

        bench = lc.generate_test_problem(horizon=10)
        mcp = bench.parametric_game.mcp
        thetas = lc.generate_parameter_batch(
            jax.random.PRNGKey(5), 4, bench, dtype=jnp.float32
        )
        r = solve_batch(
            mcp,
            thetas,
            options=SolverOptions(
                linear_solver="tridiag",
                algorithm="hybrid",
                tightening_rate=0.02,
                refinement_steps=0,
                hybrid_switch_tol=3e-2,
                polish=True,
            ),
        )
        assert np.all(np.asarray(r.status) == SOLVED)
        assert float(jnp.max(r.kkt_error)) <= 1e-4


class TestMehrotraPolish:
    def test_polish_certifies_true_residual(self):
        sol = mcp_tpu.solve(
            make_gh_mcp(), THETA, algorithm="mehrotra", polish=True, tol=1e-6
        )
        assert int(sol.status) == SOLVED
        # kkt_error is the recomputed TRUE residual after polish.
        assert float(sol.kkt_error) <= 1e-6


class TestRegularizationOverride:
    def test_override_still_solves(self):
        sol = mcp_tpu.solve(
            make_gh_mcp(), THETA, regularization=1e-7, polish=True
        )
        check_solution(sol)


class TestAutoTighteningRate:
    def test_shape_keyed_rule(self):
        from mcp_tpu.bench import lane_change as lc
        from mcp_tpu.solver import auto_tightening_rate

        assert auto_tightening_rate(make_gh_mcp()) == 0.1  # no time structure
        bench = lc.generate_test_problem(horizon=10)
        # headline block size 20 < 64 -> fast anneal
        assert auto_tightening_rate(bench.parametric_game.mcp) == 0.02


class TestLoosenedRetry:
    """In-graph gated loosened retry for failed lanes (SolverOptions.retry —
    the in-graph analog of the reference's failure loosening,
    src/solver.jl:111-113)."""

    def test_retry_rescues_stalled_annealing(self):
        # tightening_rate=100 makes the per-outer factor 1-exp(-100·inner)
        # ≈ 1: ϵ never anneals below tol, the primary solve runs to
        # max_outer_iters and fails. The retry re-solves under the
        # reference schedule and must rescue the lane.
        from mcp_tpu.parallel.batch import solve_batch

        mcp = make_gh_mcp()
        thetas = jnp.stack([THETA, THETA + 0.1])
        base = dict(tightening_rate=100.0, max_outer_iters=8, polish=True)
        r0 = solve_batch(mcp, thetas, **base)
        assert not np.any(np.asarray(r0.status) == SOLVED)
        r1 = solve_batch(mcp, thetas, retry=1, retry_tightening_rate=0.1, **base)
        assert np.all(np.asarray(r1.status) == SOLVED)
        assert float(jnp.max(r1.kkt_error)) <= 1e-4
        # Honest accounting: retried lanes pay primary + retry iterations.
        assert np.all(np.asarray(r1.outer_iters) > np.asarray(r0.outer_iters))

    def test_retry_max_outer_iters_budget(self):
        # The retry round honors its own iteration budget
        # (SolverOptions.retry_max_outer_iters): with a budget too small
        # for the reference schedule the retry cannot rescue the lane,
        # with a generous one it can — same stalled-primary setup as
        # test_retry_rescues_stalled_annealing.
        from mcp_tpu.parallel.batch import solve_batch

        mcp = make_gh_mcp()
        thetas = jnp.stack([THETA, THETA + 0.1])
        base = dict(tightening_rate=100.0, max_outer_iters=8, polish=True)
        r_small = solve_batch(
            mcp, thetas, retry=1, retry_tightening_rate=0.1,
            retry_max_outer_iters=1, **base
        )
        r_big = solve_batch(
            mcp, thetas, retry=1, retry_tightening_rate=0.1,
            retry_max_outer_iters=50, **base
        )
        assert not np.any(np.asarray(r_small.status) == SOLVED)
        assert np.all(np.asarray(r_big.status) == SOLVED)

    def test_retry_noop_on_solved_lanes(self):
        # When every lane already solves, retry must not disturb results.
        from mcp_tpu.parallel.batch import solve_batch

        mcp = make_gh_mcp()
        thetas = jnp.stack([THETA, THETA + 0.1])
        r0 = solve_batch(mcp, thetas, polish=True)
        r1 = solve_batch(mcp, thetas, polish=True, retry=2)
        assert np.all(np.asarray(r0.status) == SOLVED)
        np.testing.assert_array_equal(np.asarray(r0.x), np.asarray(r1.x))
        np.testing.assert_array_equal(
            np.asarray(r0.outer_iters), np.asarray(r1.outer_iters)
        )

    def test_retry_single_instance(self):
        # Unbatched path: gate plumbing must work without vmap too.
        sol = mcp_tpu.solve(
            make_gh_mcp(), THETA, tightening_rate=100.0, max_outer_iters=8,
            retry=1, polish=True,
        )
        check_solution(sol)

    def test_retry_with_mehrotra_primary(self):
        sol = mcp_tpu.solve(
            make_gh_mcp(), THETA, algorithm="mehrotra", retry=1, polish=True
        )
        check_solution(sol)
