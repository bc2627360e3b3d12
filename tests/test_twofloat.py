"""Error-free-transformation / double-word arithmetic tests (utils/twofloat.py)
and the compensated-f32 QP tol-1e-6 protocol (bench/qp_dw.py, VERDICT r4
item 6). Every doubled-precision claim is cross-checked against numpy f64."""

import jax
import jax.numpy as jnp
import numpy as np

from mcp_tpu.utils import twofloat as tf


class TestEFT:
    def test_two_sum_exact(self):
        a = jnp.float32(1e8)
        b = jnp.float32(1.2345)
        s, e = jax.jit(tf.two_sum)(a, b)
        assert float(np.float64(float(s)) + np.float64(float(e))) == float(
            np.float64(1e8) + np.float64(np.float32(1.2345))
        )

    def test_two_prod_exact(self):
        rng = np.random.default_rng(0)
        a = rng.normal(size=256).astype(np.float32)
        b = rng.normal(size=256).astype(np.float32)
        p, e = jax.jit(tf.two_prod)(jnp.asarray(a), jnp.asarray(b))
        got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
        assert np.array_equal(got, a.astype(np.float64) * b.astype(np.float64))

    def test_sum2_survives_fusion(self):
        """The compensated sum must stay compensated INSIDE a fused jit
        with its producer — the slice-tree variant lost all compensation to
        the backend's fusion emitter (reassociation); the scan formulation
        is the fix. Exactness target: f64 sum of the f32 products."""
        rng = np.random.default_rng(1)
        A = rng.normal(size=(2, 8, 200)).astype(np.float32)
        V = rng.normal(size=(2, 200)).astype(np.float32)

        def f(A, v):
            return tf.sum2(A * v[..., None, :], axis=-1)

        s, es = jax.jit(f)(jnp.asarray(A), jnp.asarray(V))
        ref = (A * V[:, None, :]).astype(np.float64).sum(-1)
        got = np.asarray(s, np.float64) + np.asarray(es, np.float64)
        assert np.max(np.abs(got - ref)) < 1e-12

    def test_mv2_doubled_precision(self):
        rng = np.random.default_rng(2)
        n = 200
        A = rng.normal(size=(4, n, n)).astype(np.float32)
        v = rng.normal(size=(4, n)).astype(np.float32)
        ref = np.einsum(
            "bij,bj->bi", A.astype(np.float64), v.astype(np.float64)
        )
        hi, lo = jax.jit(tf.mv2)(jnp.asarray(A), jnp.asarray(v))
        got = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
        rel = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
        assert rel < 1e-12  # doubled precision; plain f32 is ~1e-7 here

    def test_dw_residual_beats_f32_floor(self):
        """Residual of a near-exact solution — catastrophic cancellation.
        f32 evaluation floors at ~u·‖A‖‖x‖; the double-word evaluation must
        recover the true tiny residual."""
        rng = np.random.default_rng(3)
        n = 200
        A = rng.normal(size=(n, n)).astype(np.float32) + 3 * np.eye(
            n, dtype=np.float32
        )
        b = A.astype(np.float64) @ rng.normal(size=n)
        b32 = b.astype(np.float32)
        x = np.linalg.solve(A.astype(np.float64), b32.astype(np.float64))
        xhi = x.astype(np.float32)
        xlo = (x - xhi).astype(np.float32)

        hi, lo = jax.jit(
            lambda A, xh, xl: tf.dw_sub(
                tf.dw(jnp.asarray(b32)), tf.dw_mv(A, (xh, xl))
            )
        )(jnp.asarray(A), jnp.asarray(xhi), jnp.asarray(xlo))
        r_dw = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
        r_true = b32.astype(np.float64) - A.astype(np.float64) @ x
        assert np.max(np.abs(r_dw - r_true)) < 1e-10
        r_f32 = (b32 - A @ (xhi + xlo)).astype(np.float64)
        assert np.max(np.abs(r_f32 - r_true)) > 1e-7  # the floor is real


class TestQPDoubleWordProtocol:
    def test_polish_certifies_1e6(self):
        """Reference QP protocol at tol 1e-6 (benchmark/path.jl:8) without
        f64: f32 Mosaic-legal solve + double-word refinement must certify
        true ‖F‖∞ ≤ 1e-6 on every instance, and the dw-certified value must
        agree with an independent f64 evaluation."""
        from mcp_tpu.bench import qp as qp_mod
        from mcp_tpu.bench import qp_dw
        from mcp_tpu.parallel.batch import solve_batch
        from mcp_tpu.solver import SolverOptions

        B, n, m = 4, 100, 100
        prob = qp_mod.generate_test_problem()
        thetas = qp_mod.generate_parameter_batch(jax.random.PRNGKey(0), B)
        opts = SolverOptions(
            linear_solver="schur_pallas",
            algorithm="mehrotra",
            polish=True,
            tol=1e-5,
            refinement_steps=0,
        )
        res = solve_batch(prob.mcp, thetas, options=opts)
        assert bool(np.all(np.asarray(res.status) == 0))
        st, tk = qp_dw.polish_batch_dw(
            thetas, res.x, res.y, res.s, n=n, m=m, tol=1e-6, iters=8
        )
        tk = np.asarray(tk)
        assert np.all(tk <= 1e-6), tk
        # independent f64 cross-check of the certification metric
        for i in range(B):
            M, A, b, phi = qp_mod.unpack_parameters(
                thetas[i].astype(jnp.float32),
                num_primals=n,
                num_inequalities=m,
            )
            M, A, b, phi = (
                np.asarray(v, np.float64) for v in (M, A, b, phi)
            )
            x = np.asarray(st.x_hi[i], np.float64) + np.asarray(
                st.x_lo[i], np.float64
            )
            y = np.asarray(st.y_hi[i], np.float64) + np.asarray(
                st.y_lo[i], np.float64
            )
            s = np.asarray(st.s_hi[i], np.float64) + np.asarray(
                st.s_lo[i], np.float64
            )
            f64kkt = max(
                np.max(np.abs(M @ x - phi - A.T @ y)),
                np.max(np.abs(A @ x - b - s)),
                np.max(np.abs(s * y)),
            )
            assert abs(f64kkt - tk[i]) < 1e-9
            assert f64kkt <= 1.1e-6
