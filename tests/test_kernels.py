"""Pallas kernel tests (interpreter mode on the CPU backend)."""

import jax
import jax.numpy as jnp
import numpy as np

from mcp_tpu.kernels.linear_solve import (
    gauss_solve,
    pallas_gauss_solve,
    pallas_qr_solve_fused,
    pallas_wy_solve,
)


def random_systems(B, n, key=0, dtype=jnp.float32):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    A = jax.random.normal(k1, (B, n, n), dtype) + n * jnp.eye(n, dtype=dtype)[None]
    b = jax.random.normal(k2, (B, n), dtype)
    return A, b


class TestPallasQRSolve:
    def test_matches_xla_solve(self):
        A, b = random_systems(8, 64)
        x_ref = jnp.linalg.solve(A, b[..., None])[..., 0]
        x = pallas_gauss_solve(A, b, batch_tile=4)
        np.testing.assert_allclose(x, x_ref, atol=1e-4)

    def test_padding_path(self):
        A, b = random_systems(6, 32)
        x_ref = jnp.linalg.solve(A, b[..., None])[..., 0]
        x = pallas_gauss_solve(A, b, batch_tile=4)
        np.testing.assert_allclose(x, x_ref, atol=1e-4)

    def test_saddle_point_stability(self):
        """Saddle systems with ~1e-4 diagonal rows (the IP Newton structure)
        must not blow up — the reason the kernel is QR, not pivot-free LU."""
        n_p, n_d = 24, 8
        k = jax.random.PRNGKey(3)
        Q = jax.random.normal(k, (4, n_p, n_p), jnp.float32)
        Q = jnp.einsum("bij,bkj->bik", Q, Q) / n_p + jnp.eye(n_p, dtype=jnp.float32)[None]
        J = jax.random.normal(jax.random.PRNGKey(4), (4, n_d, n_p), jnp.float32)
        top = jnp.concatenate([Q, -jnp.transpose(J, (0, 2, 1))], axis=2)
        bot = jnp.concatenate(
            [J, 1e-4 * jnp.eye(n_d, dtype=jnp.float32)[None].repeat(4, 0)], axis=2
        )
        A = jnp.concatenate([top, bot], axis=1)
        b = jax.random.normal(jax.random.PRNGKey(5), (4, n_p + n_d), jnp.float32)
        x = pallas_gauss_solve(A, b, batch_tile=4)
        residual = jnp.einsum("bij,bj->bi", A, x) - b
        assert float(jnp.max(jnp.abs(residual))) < 1e-3

    def test_custom_vmap_rule(self):
        """vmap(gauss_solve) must hit the batched kernel and agree with the
        unbatched reference."""
        A, b = random_systems(8, 16)
        x_v = jax.vmap(gauss_solve)(A, b)
        x_ref = jnp.linalg.solve(A, b[..., None])[..., 0]
        np.testing.assert_allclose(x_v, x_ref, atol=1e-4)

    def test_unbatched_call(self):
        A, b = random_systems(1, 16)
        x = gauss_solve(A[0], b[0])
        np.testing.assert_allclose(
            x, jnp.linalg.solve(A[0], b[0][..., None])[..., 0], atol=1e-4
        )

    def test_wy_matches_xla_solve(self):
        """Blocked-panel WY kernel agrees with XLA across panel widths and
        n not divisible by the panel (identity-padding path)."""
        for n, nb in [(64, 8), (37, 8), (48, 16)]:
            A, b = random_systems(8, n)
            x_ref = jnp.linalg.solve(A, b[..., None])[..., 0]
            x = pallas_wy_solve(A, b, batch_tile=4, panel=nb)
            np.testing.assert_allclose(x, x_ref, atol=1e-4)

    def test_fused_aug_matches_xla_solve(self):
        """Augmented in-place QR kernel agrees with XLA, including the
        batch-padding path."""
        for B, n in [(8, 64), (6, 32)]:
            A, b = random_systems(B, n)
            x_ref = jnp.linalg.solve(A, b[..., None])[..., 0]
            x = pallas_qr_solve_fused(A, b, batch_tile=4)
            np.testing.assert_allclose(x, x_ref, atol=1e-4)

    def test_fused_aug_saddle_point_stability(self):
        n_p, n_d = 24, 8
        k = jax.random.PRNGKey(3)
        Q = jax.random.normal(k, (4, n_p, n_p), jnp.float32)
        Q = jnp.einsum("bij,bkj->bik", Q, Q) / n_p + jnp.eye(n_p, dtype=jnp.float32)[None]
        J = jax.random.normal(jax.random.PRNGKey(4), (4, n_d, n_p), jnp.float32)
        top = jnp.concatenate([Q, -jnp.transpose(J, (0, 2, 1))], axis=2)
        bot = jnp.concatenate(
            [J, 1e-4 * jnp.eye(n_d, dtype=jnp.float32)[None].repeat(4, 0)], axis=2
        )
        A = jnp.concatenate([top, bot], axis=1)
        b = jax.random.normal(jax.random.PRNGKey(5), (4, n_p + n_d), jnp.float32)
        x = pallas_qr_solve_fused(A, b)
        residual = jnp.einsum("bij,bj->bi", A, x) - b
        assert float(jnp.max(jnp.abs(residual))) < 1e-3

    def test_wy_saddle_point_stability(self):
        n_p, n_d = 24, 8
        k = jax.random.PRNGKey(3)
        Q = jax.random.normal(k, (4, n_p, n_p), jnp.float32)
        Q = jnp.einsum("bij,bkj->bik", Q, Q) / n_p + jnp.eye(n_p, dtype=jnp.float32)[None]
        J = jax.random.normal(jax.random.PRNGKey(4), (4, n_d, n_p), jnp.float32)
        top = jnp.concatenate([Q, -jnp.transpose(J, (0, 2, 1))], axis=2)
        bot = jnp.concatenate(
            [J, 1e-4 * jnp.eye(n_d, dtype=jnp.float32)[None].repeat(4, 0)], axis=2
        )
        A = jnp.concatenate([top, bot], axis=1)
        b = jax.random.normal(jax.random.PRNGKey(5), (4, n_p + n_d), jnp.float32)
        x = pallas_wy_solve(A, b, batch_tile=4, panel=8)
        residual = jnp.einsum("bij,bj->bi", A, x) - b
        assert float(jnp.max(jnp.abs(residual))) < 1e-3

    def test_solver_tier_parity(self):
        """Full IP solve via schur_pallas matches the schur tier."""
        from mcp_tpu import PrimalDualMCP
        from mcp_tpu.parallel.batch import solve_batch
        from mcp_tpu.solver import SolverOptions

        M = jnp.array([[2.0, 1.0], [1.0, 2.0]], jnp.float32)
        mcp = PrimalDualMCP.from_gh(
            lambda x, y, t: M @ x - t - y,
            lambda x, y, t: x - 1.0,
            unconstrained_dimension=2,
            constrained_dimension=2,
            parameter_dimension=2,
        )
        thetas = jax.random.normal(jax.random.PRNGKey(0), (4, 2), jnp.float32)
        s1 = solve_batch(mcp, thetas, options=SolverOptions(linear_solver="schur"))
        s2 = solve_batch(
            mcp, thetas, options=SolverOptions(linear_solver="schur_pallas")
        )
        np.testing.assert_array_equal(s1.outer_iters, s2.outer_iters)
        np.testing.assert_allclose(s1.x, s2.x, atol=1e-5)


class TestLaneMajorQRSolve:
    """pallas_qr_lanes_solve: batch-on-lanes QR (round 4 — the QP n=100
    schur solve was the dominant phase at ~0.06 Tflop/s in the batch-major
    layout; benchmarks_round4.json)."""

    def test_matches_xla_solve_padded_dims(self):
        from mcp_tpu.kernels.linear_solve import pallas_qr_lanes_solve

        # n=10 pads to 16; B=5 pads to 128 with identity systems.
        A, b = random_systems(5, 10, key=3)
        x = pallas_qr_lanes_solve(A, b)
        x_ref = jnp.linalg.solve(A, b[..., None])[..., 0]
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), rtol=2e-3, atol=2e-4)

    def test_saddle_point_stability(self):
        from mcp_tpu.kernels.linear_solve import pallas_qr_lanes_solve

        # IP-like saddle system with ~tol diagonal rows (the case that
        # breaks pivot-free LU; QR must stay stable).
        n = 12
        key = jax.random.PRNGKey(0)
        M = jax.random.normal(key, (4, n // 2, n // 2))
        M = jnp.einsum("bij,bkj->bik", M, M) + jnp.eye(n // 2)[None]
        C = jax.random.normal(jax.random.fold_in(key, 1), (4, n // 2, n // 2))
        top = jnp.concatenate([M, C], axis=2)
        bot = jnp.concatenate(
            [jnp.transpose(C, (0, 2, 1)), 1e-4 * jnp.eye(n // 2)[None].repeat(4, 0)],
            axis=2,
        )
        A = jnp.concatenate([top, bot], axis=1)
        b = jax.random.normal(jax.random.fold_in(key, 2), (4, n))
        x = pallas_qr_lanes_solve(A, b)
        x_ref = jnp.linalg.solve(A, b[..., None])[..., 0]
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), rtol=5e-3, atol=5e-4)

    def test_vmap_dispatch_at_128(self):
        """vmap(gauss_solve) at B >= 128 routes to the lane-major kernel and
        agrees with the XLA solve."""
        A, b = random_systems(128, 6, key=5)
        x = jax.vmap(gauss_solve)(A, b)
        x_ref = jnp.linalg.solve(A, b[..., None])[..., 0]
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), rtol=2e-3, atol=2e-4)


class TestLaneMajorGJSolve:
    """pallas_gj_lanes_solve / gj_solve: no-pivot Gauss-Jordan for SPD
    systems (the QP schur matrix) — round-4 round-5-lead kernel."""

    def _spd_systems(self, B, n, key=0):
        k1, k2 = jax.random.split(jax.random.PRNGKey(key))
        P = jax.random.normal(k1, (B, n, n), jnp.float32)
        A = jnp.einsum("bij,bkj->bik", P, P) + n * jnp.eye(n, dtype=jnp.float32)[None]
        b = jax.random.normal(k2, (B, n), jnp.float32)
        return A, b

    def test_matches_xla_solve(self):
        from mcp_tpu.kernels.linear_solve import pallas_gj_lanes_solve

        A, b = self._spd_systems(5, 10)
        x = pallas_gj_lanes_solve(A, b)
        x_ref = jnp.linalg.solve(A, b[..., None])[..., 0]
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), rtol=2e-3, atol=2e-4)

    def test_vmap_rule(self):
        from mcp_tpu.kernels.linear_solve import gj_solve

        A, b = self._spd_systems(4, 6, key=2)
        x = jax.vmap(gj_solve)(A, b)
        x_ref = jnp.linalg.solve(A, b[..., None])[..., 0]
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), rtol=2e-3, atol=2e-4)

    def test_wide_lane_width(self):
        from mcp_tpu.kernels.linear_solve import (
            pallas_gj_lanes_solve,
            pallas_qr_lanes_solve,
        )

        # Explicit lane_width=256 path: both lane kernels agree with XLA.
        A, b = self._spd_systems(256, 6, key=4)
        x_ref = jnp.linalg.solve(A, b[..., None])[..., 0]
        for f in (pallas_gj_lanes_solve, pallas_qr_lanes_solve):
            x = f(A, b, lane_width=256)
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(x_ref), rtol=2e-3, atol=2e-4
            )

    def test_schur_gj_tier_solves_qp(self):
        import mcp_tpu
        from mcp_tpu.bench import qp

        problem = qp.generate_test_problem(num_primals=8, num_inequalities=6)
        theta = qp.generate_random_parameter(
            jax.random.PRNGKey(3), num_primals=8, num_inequalities=6,
            sparsity_rate=0.0, dtype=jnp.float64,
        )
        sol = mcp_tpu.solve(
            problem.mcp, theta, tol=1e-6, linear_solver="schur_pallas_gj",
            algorithm="mehrotra", polish=True,
        )
        assert int(sol.status) == 0
        assert float(sol.kkt_error) <= 1e-6


class TestLaneMajorGJInverse:
    """pallas_gji_lanes_solve / gji_solve: GJ solve + explicit inverse with
    static-slice pivot extraction (round 5 — the certified-GJ dense tier,
    VERDICT r4 item 3)."""

    def _spd_systems(self, B, n, key=0):
        k1, k2 = jax.random.split(jax.random.PRNGKey(key))
        P = jax.random.normal(k1, (B, n, n), jnp.float32)
        A = jnp.einsum("bij,bkj->bik", P, P) + n * jnp.eye(n, dtype=jnp.float32)[None]
        b = jax.random.normal(k2, (B, n), jnp.float32)
        return A, b

    def test_solve_and_inverse_match_xla(self):
        from mcp_tpu.kernels.linear_solve import pallas_gji_lanes_solve

        A, b = self._spd_systems(5, 10)
        x, Ainv = pallas_gji_lanes_solve(A, b)
        np.testing.assert_allclose(
            np.asarray(x),
            np.asarray(jnp.linalg.solve(A, b[..., None])[..., 0]),
            rtol=2e-3, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(Ainv), np.asarray(jnp.linalg.inv(A)),
            rtol=2e-3, atol=2e-4,
        )

    def test_vmap_rule(self):
        from mcp_tpu.kernels.linear_solve import gji_solve

        A, b = self._spd_systems(4, 6, key=2)
        x, Ainv = jax.vmap(gji_solve)(A, b)
        np.testing.assert_allclose(
            np.asarray(x),
            np.asarray(jnp.linalg.solve(A, b[..., None])[..., 0]),
            rtol=2e-3, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(Ainv), np.asarray(jnp.linalg.inv(A)),
            rtol=2e-3, atol=2e-4,
        )

    def test_refined_solve_beats_plain(self):
        # One refinement pass against the true matrix must reach ~machine-f32
        # residual even on an ill-conditioned SPD system (the 1/256-lane
        # certification failure mode of the plain GJ tier).
        from mcp_tpu.kernels.linear_solve import pallas_gji_lanes_solve

        key = jax.random.PRNGKey(7)
        B, n = 8, 12
        Q, _ = jnp.linalg.qr(jax.random.normal(key, (B, n, n), jnp.float32))
        diag = jnp.logspace(0, 5, n, dtype=jnp.float32)  # cond 1e5
        A = jnp.einsum("bij,j,bkj->bik", Q, diag, Q)
        b = jax.random.normal(jax.random.fold_in(key, 1), (B, n), jnp.float32)
        x0, Ainv = pallas_gji_lanes_solve(A, b)
        x1 = x0 + jnp.einsum("bij,bj->bi", Ainv, b - jnp.einsum("bij,bj->bi", A, x0))
        r0 = jnp.max(jnp.abs(b - jnp.einsum("bij,bj->bi", A, x0)))
        r1 = jnp.max(jnp.abs(b - jnp.einsum("bij,bj->bi", A, x1)))
        assert float(r1) <= float(r0) + 1e-6  # refinement never hurts
        assert float(r1) <= 5e-2  # and lands near the f32 floor at cond 1e5

    def test_schur_gjr_tier_solves_qp_both_algorithms(self):
        import mcp_tpu
        from mcp_tpu.bench import qp

        problem = qp.generate_test_problem(num_primals=8, num_inequalities=6)
        theta = qp.generate_random_parameter(
            jax.random.PRNGKey(3), num_primals=8, num_inequalities=6,
            sparsity_rate=0.0, dtype=jnp.float64,
        )
        for algorithm in ("ip", "mehrotra"):
            sol = mcp_tpu.solve(
                problem.mcp, theta, tol=1e-6,
                linear_solver="schur_pallas_gjr",
                algorithm=algorithm, polish=True,
            )
            assert int(sol.status) == 0, algorithm
            assert float(sol.kkt_error) <= 1e-6, algorithm

    def test_batched_qp_certifies_shipped_config(self):
        # The SHIPPED round-5 QP config: static-slice GJ elimination +
        # Mehrotra, with the in-graph retry falling back to the stable QR
        # tier for ill-conditioned lanes. (The gjr inverse tier is NOT the
        # shipped default: an explicit-inverse matvec is not backward-
        # stable — its Newton residual floors at cond·ε·‖b‖ and stalls
        # Mehrotra on hard lanes; measured round 5, see DESIGN.md.)
        from mcp_tpu.bench import qp
        from mcp_tpu.bench.harness import true_kkt_errors
        from mcp_tpu.parallel.batch import solve_batch
        from mcp_tpu.solver import SolverOptions

        problem = qp.generate_test_problem(num_primals=8, num_inequalities=6)
        thetas = qp.generate_parameter_batch(
            jax.random.PRNGKey(5), 4, num_primals=8, num_inequalities=6,
            sparsity_rate=0.0,
        )
        sol = solve_batch(
            problem.mcp, thetas,
            options=SolverOptions(
                tol=1e-5, linear_solver="schur_pallas_gj",
                algorithm="mehrotra", refinement_steps=0, polish=True,
                retry=1, retry_linear_solver="schur_pallas",
            ),
        )
        assert np.all(np.asarray(sol.status) == 0)
        kkts = np.asarray(true_kkt_errors(problem.mcp, sol, thetas))
        assert float(np.max(kkts)) <= 1e-5
