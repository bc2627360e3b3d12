"""Block-tridiagonal-in-time Newton tier tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcp_tpu.bench import lane_change as lc
from mcp_tpu.kernels.block_tridiag import (
    TimeStructure,
    block_thomas_solve,
    extract_blocks,
    tridiag_solve_permuted,
)
from mcp_tpu.parallel.batch import solve_batch
from mcp_tpu.solver import SolverOptions
from mcp_tpu.trajectories.game_builder import validate_time_structure


def random_block_tridiag(T, b, key=0):
    k = jax.random.PRNGKey(key)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    diag = jax.random.normal(k1, (T, b, b)) + 3 * b * jnp.eye(b)[None]
    lower = jax.random.normal(k2, (T - 1, b, b))
    upper = jax.random.normal(k3, (T - 1, b, b))
    rhs = jax.random.normal(k4, (T, b))
    A = jnp.zeros((T * b, T * b))
    for t in range(T):
        A = A.at[t * b : (t + 1) * b, t * b : (t + 1) * b].set(diag[t])
        if t > 0:
            A = A.at[t * b : (t + 1) * b, (t - 1) * b : t * b].set(lower[t - 1])
            A = A.at[(t - 1) * b : t * b, t * b : (t + 1) * b].set(upper[t - 1])
    return A, diag, lower, upper, rhs


class TestBlockThomas:
    def test_matches_dense_solve(self):
        T, b = 6, 4
        A, diag, lower, upper, rhs = random_block_tridiag(T, b)
        x = block_thomas_solve(diag, lower, upper, rhs)
        x_ref = jnp.linalg.solve(A, rhs.reshape(-1))
        np.testing.assert_allclose(x.reshape(-1), x_ref, atol=1e-8)

    def test_extract_blocks_roundtrip(self):
        T, b = 5, 3
        A, diag, lower, upper, rhs = random_block_tridiag(T, b)
        d2, l2, u2 = extract_blocks(A, T, b)
        np.testing.assert_allclose(d2, diag)
        np.testing.assert_allclose(l2, lower)
        np.testing.assert_allclose(u2, upper)

    def test_permuted_solve(self):
        T, b = 4, 3
        A, *_ , rhs = random_block_tridiag(T, b)
        n = T * b
        perm = np.random.default_rng(0).permutation(n)
        # Build a matrix whose perm-ordering is tridiagonal: A_orig = Pᵀ A P
        P = np.eye(n)[perm]
        A_orig = jnp.asarray(P.T @ np.asarray(A) @ P)
        r_orig = jnp.asarray(P.T @ np.asarray(rhs.reshape(-1)))
        structure = TimeStructure(tuple(int(i) for i in perm), T, b)
        x = tridiag_solve_permuted(A_orig, r_orig, structure)
        x_ref = jnp.linalg.solve(A_orig, r_orig)
        np.testing.assert_allclose(x, x_ref, atol=1e-8)


class TestPallasThomas:
    """Fused whole-batch Pallas block-Thomas (kernels/thomas_pallas.py),
    interpret mode on CPU."""

    def test_matches_xla_thomas(self):
        from mcp_tpu.kernels.thomas_pallas import pallas_block_thomas

        B, T, b = 6, 10, 12
        k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
        f32 = jnp.float32
        diag = jax.random.normal(k1, (B, T, b, b), f32) + 6 * jnp.eye(b, dtype=f32)
        lower = 0.3 * jax.random.normal(k2, (B, T - 1, b, b), f32)
        upper = 0.3 * jax.random.normal(k3, (B, T - 1, b, b), f32)
        rhs = jax.random.normal(k4, (B, T, b), f32)
        x_ref = jax.vmap(block_thomas_solve)(diag, lower, upper, rhs)
        x = pallas_block_thomas(diag, lower, upper, rhs, batch_tile=3)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=1e-5)

    @pytest.mark.parametrize("T", [1, 2, 3, 5, 10, 13])
    def test_cr_kernel_matches_one_way(self, T):
        """The in-kernel cyclic reduction (mode='cr', ~log2 T serial depth)
        matches the one-way packed kernel for even/odd/tiny T."""
        from mcp_tpu.kernels.thomas_pallas import pallas_block_thomas

        B, b = 4, 8
        k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(100 + T), 4)
        f32 = jnp.float32
        diag = jax.random.normal(k1, (B, T, b, b), f32) + 6 * jnp.eye(b, dtype=f32)
        lower = 0.3 * jax.random.normal(k2, (B, max(T - 1, 0), b, b), f32)
        upper = 0.3 * jax.random.normal(k3, (B, max(T - 1, 0), b, b), f32)
        rhs = jax.random.normal(k4, (B, T, b), f32)
        x_ref = pallas_block_thomas(diag, lower, upper, rhs, mode="oneway", batch_tile=4)
        x_cr = pallas_block_thomas(diag, lower, upper, rhs, mode="cr", batch_tile=4)
        np.testing.assert_allclose(np.asarray(x_cr), np.asarray(x_ref), atol=1e-5)

    def test_cr_kernel_wide_blocks(self):
        """Wide blocks (3b+1 > 128) route through the split-input CR kernel."""
        from mcp_tpu.kernels.thomas_pallas import pallas_block_thomas

        B, T, b = 2, 5, 50
        k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(7), 4)
        f32 = jnp.float32
        diag = 0.1 * jax.random.normal(k1, (B, T, b, b), f32) + 5 * jnp.eye(b, dtype=f32)
        lower = 0.1 * jax.random.normal(k2, (B, T - 1, b, b), f32)
        upper = 0.1 * jax.random.normal(k3, (B, T - 1, b, b), f32)
        rhs = jax.random.normal(k4, (B, T, b), f32)
        x_ref = jax.vmap(block_thomas_solve)(diag, lower, upper, rhs)
        x_cr = pallas_block_thomas(diag, lower, upper, rhs, mode="cr", batch_tile=2)
        np.testing.assert_allclose(np.asarray(x_cr), np.asarray(x_ref), atol=2e-4)

    @pytest.mark.parametrize("fact", ["gj", "gjp"])
    def test_gauss_jordan_fact_matches_qr(self, fact):
        """The Gauss–Jordan in-kernel factorizations (pivot-free and
        partially-pivoted) match the Householder QR kernel."""
        from mcp_tpu.kernels.thomas_pallas import pallas_block_thomas

        B, T, b = 4, 10, 12
        k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(3), 4)
        f32 = jnp.float32
        diag = jax.random.normal(k1, (B, T, b, b), f32) + 6 * jnp.eye(b, dtype=f32)
        lower = 0.3 * jax.random.normal(k2, (B, T - 1, b, b), f32)
        upper = 0.3 * jax.random.normal(k3, (B, T - 1, b, b), f32)
        rhs = jax.random.normal(k4, (B, T, b), f32)
        x_qr = pallas_block_thomas(diag, lower, upper, rhs, mode="oneway", batch_tile=4)
        x_f = pallas_block_thomas(
            diag, lower, upper, rhs, mode="oneway", fact=fact, batch_tile=4
        )
        np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_qr), atol=1e-5)

    @pytest.mark.parametrize("shape", [(4, 10, 20), (3, 1, 8), (5, 7, 5)])
    def test_lane_major_matches_xla_thomas(self, shape):
        """Lane-major (batch-on-lanes) kernel: column-major storage, batch
        on the 128-lane axis, identity pad b → ⌈b/8⌉·8 — must reproduce the
        XLA Thomas for padded/exact block sizes and T=1."""
        from mcp_tpu.kernels.thomas_pallas import pallas_block_thomas

        B, T, b = shape
        k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(40 + b), 4)
        f32 = jnp.float32
        diag = jax.random.normal(k1, (B, T, b, b), f32) + 6 * jnp.eye(b, dtype=f32)
        lower = 0.3 * jax.random.normal(k2, (B, max(T - 1, 0), b, b), f32)
        upper = 0.3 * jax.random.normal(k3, (B, max(T - 1, 0), b, b), f32)
        rhs = jax.random.normal(k4, (B, T, b), f32)
        x_ref = jax.vmap(block_thomas_solve)(diag, lower, upper, rhs)
        x = pallas_block_thomas(diag, lower, upper, rhs, mode="lanes")
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=1e-4)

    @pytest.mark.parametrize("T", [30, 7, 33])
    def test_lane_major_t_tiled_matches_untiled(self, T, monkeypatch):
        """T-tiled lane-major streaming (band window over an inner grid dim,
        VERDICT r2 #3): forcing a tiny band budget must reproduce the
        untiled kernel bit-for-bit, including T % Tc != 0 identity padding."""
        from mcp_tpu.kernels import thomas_pallas

        B, b = 4, 12
        k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(50 + T), 4)
        f32 = jnp.float32
        diag = jax.random.normal(k1, (B, T, b, b), f32) + 6 * jnp.eye(b, dtype=f32)
        lower = 0.3 * jax.random.normal(k2, (B, T - 1, b, b), f32)
        upper = 0.3 * jax.random.normal(k3, (B, T - 1, b, b), f32)
        rhs = jax.random.normal(k4, (B, T, b), f32)
        x_untiled = thomas_pallas.pallas_block_thomas(
            diag, lower, upper, rhs, mode="lanes"
        )
        # Budget of 4 time-steps' band bytes → Tc=2 after double-buffer halving.
        per_t = (3 * 16 + 1) * 16 * 128 * 4
        monkeypatch.setattr(thomas_pallas, "LANES_BAND_VMEM_BYTES", 4 * per_t)
        x_tiled = thomas_pallas.pallas_block_thomas(
            diag, lower, upper, rhs, mode="lanes"
        )
        np.testing.assert_array_equal(np.asarray(x_tiled), np.asarray(x_untiled))

    def test_gjp_pivoting_handles_zero_leading_pivot(self):
        """A block whose (0,0) entry is zero breaks pivot-free elimination;
        partial pivoting must still solve it."""
        from mcp_tpu.kernels.thomas_pallas import _gj_solve_aug, _gjp_solve_aug

        b = 4
        A = jnp.asarray(
            [[0.0, 2.0, 0.0, 0.0],
             [1.0, 0.0, 0.0, 0.5],
             [0.0, 0.3, 3.0, 0.0],
             [0.2, 0.0, 0.0, 1.0]], jnp.float32
        )[None]
        x_true = jnp.asarray([1.0, -2.0, 0.5, 3.0], jnp.float32)
        rhs = (A[0] @ x_true)[None, :, None]
        M = jnp.concatenate([A, rhs], axis=2)
        x_gjp = _gjp_solve_aug(M, b=b)[0, :, 0]
        np.testing.assert_allclose(np.asarray(x_gjp), np.asarray(x_true), atol=1e-5)
        x_gj = _gj_solve_aug(M, b=b)[0, :, 0]
        assert not np.allclose(np.asarray(x_gj), np.asarray(x_true), atol=1e-3)

    def test_gjp_tier_full_solve(self):
        from mcp_tpu.bench import lane_change as lc
        from mcp_tpu.parallel.batch import solve_batch
        from mcp_tpu.solver import SolverOptions

        bench = lc.generate_test_problem(horizon=10)
        mcp = bench.parametric_game.mcp
        th = lc.generate_parameter_batch(
            jax.random.PRNGKey(1), 4, bench, dtype=jnp.float32
        )
        ref = solve_batch(mcp, th, options=SolverOptions(linear_solver="tridiag_pallas"))
        gjp = solve_batch(
            mcp, th, options=SolverOptions(linear_solver="tridiag_pallas_gjp")
        )
        np.testing.assert_array_equal(np.asarray(gjp.status), np.asarray(ref.status))
        # Different (exact) factorizations round differently in f32 and the
        # IP path amplifies the difference; compare at solver tolerance.
        np.testing.assert_allclose(np.asarray(gjp.x), np.asarray(ref.x), atol=5e-3)
        assert float(jnp.max(gjp.kkt_error)) < 1e-3

    @pytest.mark.parametrize("shape", [(3, 8, 12, 25), (2, 5, 20, 41), (1, 16, 8, 17)])
    def test_multi_rhs_kernel_matches_xla(self, shape):
        """Fused multi-RHS sweep (the SPIKE local slab kernel, VERDICT r2
        #5): must match block_thomas_solve_multi for k = 2b+1-class column
        counts, batched and single."""
        from mcp_tpu.kernels.block_tridiag import block_thomas_solve_multi
        from mcp_tpu.kernels.thomas_pallas import (
            pallas_block_thomas_multi,
            thomas_solve_multi,
        )

        B, T, b, k = shape
        k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(b + k), 4)
        f32 = jnp.float32
        diag = jax.random.normal(k1, (B, T, b, b), f32) + 6 * jnp.eye(b, dtype=f32)
        lower = 0.3 * jax.random.normal(k2, (B, T - 1, b, b), f32)
        upper = 0.3 * jax.random.normal(k3, (B, T - 1, b, b), f32)
        rhs = jax.random.normal(k4, (B, T, b, k), f32)
        x_ref = jax.vmap(block_thomas_solve_multi)(diag, lower, upper, rhs)
        x = pallas_block_thomas_multi(diag, lower, upper, rhs)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=2e-4)
        x_v = jax.jit(jax.vmap(thomas_solve_multi))(diag, lower, upper, rhs)
        np.testing.assert_allclose(np.asarray(x_v), np.asarray(x_ref), atol=2e-4)
        x_1 = thomas_solve_multi(diag[0], lower[0], upper[0], rhs[0])
        np.testing.assert_allclose(np.asarray(x_1), np.asarray(x_ref[0]), atol=2e-4)

    def test_gjpr_refinement_cancels_pivot_growth(self):
        """The refined pivoted Gauss–Jordan (gjpr, VERDICT r2 #4) must land
        QR-class residuals on blocks with severe row-scale spread (the IP
        near-boundary S/Y regime where plain gjp's envelope blows up)."""
        from mcp_tpu.kernels.thomas_pallas import (
            _gjp_solve_aug,
            _gjpr_solve_aug,
            _qr_solve_aug,
        )

        TB, b = 64, 20
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        f32 = jnp.float32
        A = jax.random.normal(k1, (TB, b, b), f32)
        A = A * 10.0 ** jax.random.uniform(k2, (TB, b, 1), minval=-3, maxval=3)
        N = jax.random.normal(k3, (TB, b, 5), f32)
        M = jnp.concatenate([A, N], axis=2)

        def max_rel_residual(X):
            R = N - jnp.einsum("bij,bjk->bik", A, X)
            return float(jnp.max(jnp.abs(R)) / jnp.max(jnp.abs(N)))

        r_qr = max_rel_residual(_qr_solve_aug(M, b=b))
        r_gjp = max_rel_residual(_gjp_solve_aug(M, b=b))
        r_gjpr = max_rel_residual(_gjpr_solve_aug(M, b=b))
        assert r_gjp > 10 * r_qr  # the problem actually exercises the envelope
        assert r_gjpr < 3 * r_qr  # refinement restores QR-class accuracy

    def test_gjb_blocked_matches_unblocked(self):
        """The blocked pivot-free Gauss–Jordan (gjb*, round-5 N=10 kernel)
        must agree with a dense solve across panel-boundary block sizes
        (b below, at, straddling, and off-multiple of GJB_PANEL)."""
        from mcp_tpu.kernels.thomas_pallas import GJB_PANEL, _gjb_solve_aug

        for b, nrhs in [(8, 3), (GJB_PANEL, 5), (GJB_PANEL + 9, 2), (100, 7)]:
            k1, k2 = jax.random.split(jax.random.PRNGKey(b), 2)
            f32 = jnp.float32
            A = jax.random.normal(k1, (3, b, b), f32) + 2 * b * jnp.eye(
                b, dtype=f32
            )
            N = jax.random.normal(k2, (3, b, nrhs), f32)
            M = jnp.concatenate([A, N], axis=2)
            X_ref = jnp.linalg.solve(A, N)
            for refine in (0, 1):
                X = _gjb_solve_aug(M, b=b, refine=refine)
                np.testing.assert_allclose(
                    np.asarray(X), np.asarray(X_ref), atol=5e-4
                )

    def test_gjbr_refinement_cancels_pivot_growth(self):
        """One explicit-inverse refinement pass must pull the pivot-free
        blocked elimination back to QR-class residuals on row-scale-spread
        blocks (same adversary as the gjpr test — gjb has no pivoting at
        all, so refinement carries the full stability load)."""
        from mcp_tpu.kernels.thomas_pallas import (
            _gjb_solve_aug,
            _qr_solve_aug,
        )

        TB, b = 64, 20
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        f32 = jnp.float32
        A = jax.random.normal(k1, (TB, b, b), f32)
        A = A * 10.0 ** jax.random.uniform(k2, (TB, b, 1), minval=-3, maxval=3)
        N = jax.random.normal(k3, (TB, b, 5), f32)
        M = jnp.concatenate([A, N], axis=2)

        def max_rel_residual(X):
            R = N - jnp.einsum("bij,bjk->bik", A, X)
            return float(jnp.max(jnp.abs(R)) / jnp.max(jnp.abs(N)))

        r_qr = max_rel_residual(_qr_solve_aug(M, b=b))
        r_gjb = max_rel_residual(_gjb_solve_aug(M, b=b, refine=0))
        r_gjbr = max_rel_residual(_gjb_solve_aug(M, b=b, refine=1))
        assert r_gjb > 10 * r_qr  # no pivoting: the envelope is real
        assert r_gjbr < 5 * r_qr  # refinement restores QR-class accuracy

    def test_gjbp_pivoted_blocked_matches_unblocked(self):
        """The pivoted blocked elimination (gjbp*) must survive structural
        zero leading pivots + row-scale spread (game KKT diagonal blocks) —
        the regime where the pivot-free blocked variant returns inf
        (measured on the lane-change tier: the crgjb/crgjbr tiers are a
        recorded NEGATIVE result for games; only QP-like SPD blocks admit
        the static pivot order)."""
        from mcp_tpu.kernels.thomas_pallas import (
            _gjbp_solve_aug,
            _gjp_solve_aug,
        )

        TB, b, nrhs = 3, 50, 7
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
        f32 = jnp.float32
        A = jax.random.normal(k1, (TB, b, b), f32)
        A = A.at[:, 0, 0].set(0.0)
        A = A * 10.0 ** jax.random.uniform(k2, (TB, b, 1), minval=-3, maxval=3)
        N = jax.random.normal(k3, (TB, b, nrhs), f32)
        M = jnp.concatenate([A, N], axis=2)
        X_ref = jnp.linalg.solve(A, N)
        scale = float(jnp.max(jnp.abs(X_ref)))
        X_gjp = _gjp_solve_aug(M, b=b)
        X_bp = _gjbp_solve_aug(M, b=b, refine=0)
        X_bpr = _gjbp_solve_aug(M, b=b, refine=1)
        err = lambda X: float(jnp.max(jnp.abs(X - X_ref))) / scale
        assert err(X_bp) < 10 * max(err(X_gjp), 1e-6)
        assert err(X_bpr) <= 2 * err(X_gjp) + 1e-6

    @pytest.mark.parametrize("tier", ["tridiag_pallas_crgjbpr"])
    def test_gjb_tier_full_solve(self, tier):
        bench = lc.generate_test_problem(horizon=10)
        mcp = bench.parametric_game.mcp
        th = lc.generate_parameter_batch(
            jax.random.PRNGKey(1), 4, bench, dtype=jnp.float32
        )
        ref = solve_batch(
            mcp, th, options=SolverOptions(linear_solver="tridiag_pallas")
        )
        out = solve_batch(mcp, th, options=SolverOptions(linear_solver=tier))
        np.testing.assert_array_equal(
            np.asarray(out.status), np.asarray(ref.status)
        )
        np.testing.assert_allclose(
            np.asarray(out.x), np.asarray(ref.x), atol=5e-3
        )
        assert float(jnp.max(out.kkt_error)) < 1e-3

    @pytest.mark.parametrize("tier", ["tridiag_pallas_gjpr", "tridiag_pallas_crgjpr"])
    def test_gjpr_tier_full_solve(self, tier):
        from mcp_tpu.bench import lane_change as lc
        from mcp_tpu.parallel.batch import solve_batch
        from mcp_tpu.solver import SolverOptions

        bench = lc.generate_test_problem(horizon=10)
        mcp = bench.parametric_game.mcp
        th = lc.generate_parameter_batch(
            jax.random.PRNGKey(1), 4, bench, dtype=jnp.float32
        )
        ref = solve_batch(mcp, th, options=SolverOptions(linear_solver="tridiag_pallas"))
        out = solve_batch(mcp, th, options=SolverOptions(linear_solver=tier))
        np.testing.assert_array_equal(np.asarray(out.status), np.asarray(ref.status))
        np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x), atol=5e-3)
        assert float(jnp.max(out.kkt_error)) < 1e-3

    def test_lanes_tier_full_solve(self):
        """tridiag_pallas_lanes end-to-end IP solve parity with tridiag_pallas."""
        from mcp_tpu.bench import lane_change as lc
        from mcp_tpu.parallel.batch import solve_batch
        from mcp_tpu.solver import SolverOptions

        bench = lc.generate_test_problem(horizon=10)
        mcp = bench.parametric_game.mcp
        th = lc.generate_parameter_batch(
            jax.random.PRNGKey(1), 4, bench, dtype=jnp.float32
        )
        ref = solve_batch(mcp, th, options=SolverOptions(linear_solver="tridiag_pallas"))
        lanes = solve_batch(
            mcp, th, options=SolverOptions(linear_solver="tridiag_pallas_lanes")
        )
        np.testing.assert_array_equal(np.asarray(lanes.status), np.asarray(ref.status))
        np.testing.assert_allclose(np.asarray(lanes.x), np.asarray(ref.x), atol=1e-4)

    def test_cr_tier_full_solve(self):
        """tridiag_pallas_cr end-to-end IP solve parity with tridiag_pallas."""
        from mcp_tpu.bench import lane_change as lc
        from mcp_tpu.parallel.batch import solve_batch
        from mcp_tpu.solver import SolverOptions

        bench = lc.generate_test_problem(horizon=10)
        mcp = bench.parametric_game.mcp
        th = lc.generate_parameter_batch(
            jax.random.PRNGKey(1), 4, bench, dtype=jnp.float32
        )
        ref = solve_batch(mcp, th, options=SolverOptions(linear_solver="tridiag_pallas"))
        cr = solve_batch(mcp, th, options=SolverOptions(linear_solver="tridiag_pallas_cr"))
        np.testing.assert_array_equal(np.asarray(cr.status), np.asarray(ref.status))
        np.testing.assert_allclose(np.asarray(cr.x), np.asarray(ref.x), atol=1e-4)

    @pytest.mark.parametrize("T", [2, 3, 5, 10])
    def test_two_way_matches_one_way(self, T):
        """The two-way (BABE) sweep matches the one-way packed kernel and
        the XLA scan for even and odd T."""
        from mcp_tpu.kernels.thomas_pallas import pallas_block_thomas

        B, b = 4, 8
        k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(T), 4)
        f32 = jnp.float32
        diag = jax.random.normal(k1, (B, T, b, b), f32) + 6 * jnp.eye(b, dtype=f32)
        lower = 0.3 * jax.random.normal(k2, (B, T - 1, b, b), f32)
        upper = 0.3 * jax.random.normal(k3, (B, T - 1, b, b), f32)
        rhs = jax.random.normal(k4, (B, T, b), f32)
        x_ref = jax.vmap(block_thomas_solve)(diag, lower, upper, rhs)
        x2 = pallas_block_thomas(diag, lower, upper, rhs, two_way=True)
        x1 = pallas_block_thomas(diag, lower, upper, rhs, two_way=False)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x_ref), atol=1e-5)

    def test_unpacked_fallback_large_block(self):
        """b=44 (3b+1 > 128 lanes) routes to the unpacked kernel."""
        from mcp_tpu.kernels.thomas_pallas import pallas_block_thomas

        B, T, b = 2, 3, 44
        k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(7), 4)
        f32 = jnp.float32
        diag = jax.random.normal(k1, (B, T, b, b), f32) + 9 * jnp.eye(b, dtype=f32)
        lower = 0.3 * jax.random.normal(k2, (B, T - 1, b, b), f32)
        upper = 0.3 * jax.random.normal(k3, (B, T - 1, b, b), f32)
        rhs = jax.random.normal(k4, (B, T, b), f32)
        x_ref = jax.vmap(block_thomas_solve)(diag, lower, upper, rhs)
        x = pallas_block_thomas(diag, lower, upper, rhs)
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(x_ref), rtol=2e-4, atol=1e-4
        )

    def test_custom_vmap_and_single(self):
        from mcp_tpu.kernels.thomas_pallas import thomas_solve

        B, T, b = 4, 6, 8
        k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(1), 4)
        f32 = jnp.float32
        diag = jax.random.normal(k1, (B, T, b, b), f32) + 5 * jnp.eye(b, dtype=f32)
        lower = 0.3 * jax.random.normal(k2, (B, T - 1, b, b), f32)
        upper = 0.3 * jax.random.normal(k3, (B, T - 1, b, b), f32)
        rhs = jax.random.normal(k4, (B, T, b), f32)
        x_ref = jax.vmap(block_thomas_solve)(diag, lower, upper, rhs)
        xv = jax.vmap(thomas_solve)(diag, lower, upper, rhs)
        np.testing.assert_allclose(np.asarray(xv), np.asarray(x_ref), atol=1e-5)
        x1 = thomas_solve(diag[0], lower[0], upper[0], rhs[0])
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x_ref[0]), atol=1e-5)

    def test_auto_dispatch(self):
        """auto_thomas_solve picks the QR sweep kernel for small blocks and
        the in-kernel cyclic reduction (pivoted Gauss–Jordan) above
        PALLAS_THOMAS_MAX_BLOCK; verified by the actual residual (different
        exact f32 algorithms round differently at large b)."""
        from mcp_tpu.kernels.thomas_pallas import (
            PALLAS_THOMAS_MAX_BLOCK,
            auto_thomas_solve,
        )

        for b in (8, PALLAS_THOMAS_MAX_BLOCK + 8):
            T = 5
            k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(b), 4)
            f32 = jnp.float32
            # Diagonally-dominant blocks like the regularized IP Schur
            # denominators this dispatch exists for (a cond-3e4 adversarial
            # system pushes the large-b GJP factorization to ~2e-2 relative
            # residual — documented in thomas_pallas.py; the IP loop absorbs
            # that as ~0.5 extra outer iterations).
            scale = 0.1 if b > PALLAS_THOMAS_MAX_BLOCK else 0.3
            diag = scale * jax.random.normal(k1, (T, b, b), f32) + 6 * jnp.eye(
                b, dtype=f32
            )
            lower = scale * jax.random.normal(k2, (T - 1, b, b), f32)
            upper = scale * jax.random.normal(k3, (T - 1, b, b), f32)
            rhs = jax.random.normal(k4, (T, b), f32)
            x = auto_thomas_solve(diag, lower, upper, rhs)
            r = jnp.einsum("tij,tj->ti", diag, x) - rhs
            r = r.at[1:].add(jnp.einsum("tij,tj->ti", lower, x[:-1]))
            r = r.at[:-1].add(jnp.einsum("tij,tj->ti", upper, x[1:]))
            rel = float(jnp.max(jnp.abs(r)) / jnp.max(jnp.abs(rhs)))
            assert rel < 2e-3, rel

    def test_tier_auto_full_solve(self):
        """tridiag_auto tier solves the lane-change game (small blocks →
        kernel path) with the same iterates as tridiag."""
        bench = lc.generate_test_problem(horizon=10)
        mcp = bench.parametric_game.mcp
        thetas = lc.generate_parameter_batch(
            jax.random.PRNGKey(2), 2, bench, dtype=jnp.float32
        )
        s1 = solve_batch(mcp, thetas, options=SolverOptions(linear_solver="tridiag"))
        s2 = solve_batch(
            mcp, thetas, options=SolverOptions(linear_solver="tridiag_auto")
        )
        np.testing.assert_allclose(np.asarray(s1.x), np.asarray(s2.x), atol=2e-4)

    def test_tier_full_solve_parity(self):
        """tridiag_pallas tier reproduces the tridiag tier's iterates."""
        bench = lc.generate_test_problem(horizon=10)
        mcp = bench.parametric_game.mcp
        thetas = lc.generate_parameter_batch(
            jax.random.PRNGKey(1), 4, bench, dtype=jnp.float32
        )
        s1 = solve_batch(mcp, thetas, options=SolverOptions(linear_solver="tridiag"))
        s2 = solve_batch(
            mcp, thetas, options=SolverOptions(linear_solver="tridiag_pallas")
        )
        np.testing.assert_array_equal(
            np.asarray(s1.outer_iters), np.asarray(s2.outer_iters)
        )
        np.testing.assert_allclose(np.asarray(s1.x), np.asarray(s2.x), atol=2e-4)


class TestCyclicReduction:
    @pytest.mark.parametrize("T", [3, 4, 5, 8, 13])
    def test_matches_thomas(self, T):
        from mcp_tpu.kernels.block_tridiag import block_cyclic_reduction_solve

        b = 4
        A, diag, lower, upper, rhs = random_block_tridiag(T, b, key=T)
        x_cr = block_cyclic_reduction_solve(diag, lower, upper, rhs)
        x_th = block_thomas_solve(diag, lower, upper, rhs)
        np.testing.assert_allclose(x_cr, x_th, atol=1e-7)

    def test_cr_tier_full_solve(self):
        bench = lc.generate_test_problem(horizon=10)
        mcp = bench.parametric_game.mcp
        thetas = lc.generate_parameter_batch(
            jax.random.PRNGKey(1), 2, bench, dtype=jnp.float32
        )
        s1 = solve_batch(mcp, thetas, options=SolverOptions(linear_solver="tridiag"))
        s2 = solve_batch(
            mcp, thetas, options=SolverOptions(linear_solver="tridiag_cr")
        )
        np.testing.assert_array_equal(s1.outer_iters, s2.outer_iters)
        np.testing.assert_allclose(s1.x, s2.x, atol=1e-5)


class TestTridiagTier:
    def test_lane_change_structure_validated(self):
        bench = lc.generate_test_problem(horizon=10)
        ts = bench.parametric_game.mcp.time_structure
        assert ts is not None
        assert ts.num_blocks == 10 and ts.block_size == 20
        assert validate_time_structure(bench.parametric_game, ts) == 0.0

    def test_full_solve_parity(self):
        bench = lc.generate_test_problem(horizon=10)
        mcp = bench.parametric_game.mcp
        thetas = lc.generate_parameter_batch(
            jax.random.PRNGKey(1), 4, bench, dtype=jnp.float32
        )
        s1 = solve_batch(mcp, thetas, options=SolverOptions(linear_solver="schur"))
        s2 = solve_batch(mcp, thetas, options=SolverOptions(linear_solver="tridiag"))
        np.testing.assert_array_equal(s1.outer_iters, s2.outer_iters)
        np.testing.assert_allclose(s1.x, s2.x, atol=1e-5)
        assert np.all(np.asarray(s2.status) == 0)

    def test_tier_requires_structure(self):
        from mcp_tpu import PrimalDualMCP
        import mcp_tpu

        mcp = PrimalDualMCP.from_gh(
            lambda x, y, t: x - t,
            lambda x, y, t: x,
            unconstrained_dimension=2,
            constrained_dimension=2,
            parameter_dimension=2,
        )
        with pytest.raises(ValueError, match="time_structure"):
            mcp_tpu.solve(mcp, jnp.ones(2), linear_solver="tridiag")
