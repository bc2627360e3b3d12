"""Affine-bands fast path (kernels/block_tridiag.AffineBands).

For quadratic trajectory games the banded Jacobian is an exact affine
function of the iterate and independent of θ; the builder precomputes the
decomposition and the solver's per-iteration linearize collapses to one
residual evaluation. These tests pin:
  * the decomposition is attached for the lane-change game and reproduces
    gh_banded exactly at random points,
  * the solve is trajectory-identical (same iterates/status/iterations) to
    the colored-seed path,
  * non-quadratic games (masked-selection 1/d² costs) fail the probe and
    keep affine_bands=None,
  * differentiation through the solve is unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcp_tpu.bench import lane_change as lc
from mcp_tpu.kernels.block_tridiag import gh_banded, gh_banded_fast
from mcp_tpu.solver import SolverOptions, default_initialization, ip_solve
from mcp_tpu.types import SOLVED


@pytest.fixture(scope="module")
def bench():
    return lc.generate_test_problem(horizon=10)


@pytest.fixture(scope="module")
def slow_game(bench):
    from mcp_tpu.trajectories import build_parametric_game

    return build_parametric_game(
        game=bench.game, horizon=10, params_per_player=1, affine_bands=False
    )


def test_affine_bands_attached_and_exact(bench):
    mcp = bench.parametric_game.mcp
    ab = mcp.affine_bands
    assert ab is not None, "lane-change is quadratic; the probe must pass"
    # Structure of the quadratic game: Gx bands depend only on y (collision
    # Hessian × duals), Gy/Hx only on x, lower/upper constant.
    assert ab.diag_x is None and ab.diag_y is not None
    assert ab.Gy_x is not None and ab.Gy_y is None
    assert ab.Hx_x is not None and ab.Hx_y is None

    ts = mcp.time_structure
    n, m = mcp.unconstrained_dimension, mcp.constrained_dimension
    for seed in range(3):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
        x = jax.random.normal(k1, (n,))
        y = 1.0 + jax.random.uniform(k2, (m,))
        theta = jax.random.normal(k3, (10,))
        ref = gh_banded(mcp, ts, x, y, theta)
        fast = gh_banded_fast(mcp, ts, x, y, theta)
        for a, b in zip(ref, fast):
            scale = max(1.0, float(jnp.max(jnp.abs(a))))
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-9 * scale
            )


@pytest.mark.parametrize("tier", ["tridiag", "tridiag_cr"])
def test_solve_parity_with_colored_path(bench, slow_game, tier):
    mcp_fast = bench.parametric_game.mcp
    mcp_slow = slow_game.mcp
    assert mcp_slow.affine_bands is None
    thetas = lc.generate_parameter_batch(
        jax.random.PRNGKey(2), 8, bench, dtype=jnp.float64
    )
    opts = SolverOptions(tol=1e-4, linear_solver=tier)

    def solve_all(mcp):
        def one(th):
            x0, y0, s0 = default_initialization(mcp, th)
            return ip_solve(mcp, opts, th, x0, y0, s0)

        return jax.jit(jax.vmap(one))(thetas)

    rf = solve_all(mcp_fast)
    rs = solve_all(mcp_slow)
    assert bool(jnp.all(rf.status == SOLVED))
    assert bool(jnp.all(rf.status == rs.status))
    assert bool(jnp.all(rf.outer_iters == rs.outer_iters))
    np.testing.assert_allclose(np.asarray(rf.x), np.asarray(rs.x), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(rf.kkt_error), np.asarray(rs.kkt_error), atol=1e-8
    )


def test_polish_and_mehrotra_on_fast_path(bench, slow_game):
    mcp = bench.parametric_game.mcp
    thetas = lc.generate_parameter_batch(
        jax.random.PRNGKey(5), 4, bench, dtype=jnp.float64
    )

    def solve_all(mcp_, opts):
        def one(th):
            x0, y0, s0 = default_initialization(mcp_, th)
            return ip_solve(mcp_, opts, th, x0, y0, s0)

        return jax.jit(jax.vmap(one))(thetas)

    # Polish converges and certifies the true residual on the fast path.
    opts = SolverOptions(tol=1e-4, linear_solver="tridiag", polish=True)
    res = solve_all(mcp, opts)
    assert bool(jnp.all(res.status == SOLVED))
    assert float(jnp.max(res.kkt_error)) <= opts.tol

    # Mehrotra does not converge lane-change cold starts (documented: the
    # annealed homotopy is the robust cold-start algorithm) — assert the
    # fast path reproduces the colored-seed path's outcome exactly.
    opts = SolverOptions(tol=1e-4, linear_solver="tridiag", algorithm="mehrotra")
    rf = solve_all(mcp, opts)
    rs = solve_all(slow_game.mcp, opts)
    assert bool(jnp.all(rf.status == rs.status))
    assert bool(jnp.all(rf.outer_iters == rs.outer_iters))


def test_nonquadratic_game_rejected():
    # The masked-selection games couple players through mask·mask/d² stage
    # costs — bands are NOT affine in the iterate; the probe must fail and
    # leave affine_bands unset (the colored-seed path remains).
    from mcp_tpu.selection.games import (
        build_masked_parametric_game,
        setup_road_environment,
        setup_trajectory_game,
    )

    env = setup_road_environment()
    game = setup_trajectory_game(environment=env, N=3)
    pg = build_masked_parametric_game(game, N=3, horizon=4)
    assert pg.mcp.time_structure is not None
    assert pg.mcp.affine_bands is None


def test_gradients_through_fast_path(bench):
    from mcp_tpu.diff import solve as diff_solve

    mcp = bench.parametric_game.mcp
    theta = lc.generate_random_parameter(
        jax.random.PRNGKey(9), bench, dtype=jnp.float64
    )
    opts = SolverOptions(tol=1e-6, linear_solver="tridiag")

    def loss(th):
        res = diff_solve(mcp, th, options=opts)
        return jnp.sum(res.x**2)

    g = jax.grad(loss)(theta)
    # finite-difference cross-check on a few coordinates
    eps = 1e-6
    for i in (0, 4, 9):
        e = jnp.zeros_like(theta).at[i].set(eps)
        fd = (loss(theta + e) - loss(theta - e)) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), float(fd), rtol=2e-3, atol=1e-5)
