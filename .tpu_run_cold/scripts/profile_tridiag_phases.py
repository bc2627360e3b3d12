"""Per-phase micro-profile of the tridiag (headline) interior-point
iteration on the lane-change bench: (a) colored-seed residual+band assembly
(gh_banded), (b) banded Newton step (Schur reduction + block-Thomas),
(c) the two fraction-to-the-boundary linesearches, (d) whole-solve
reference. Identifies which phase bounds the 285 solves/s headline."""

import argparse
import time

import jax
import jax.numpy as jnp
from jax import lax

parser = argparse.ArgumentParser()
parser.add_argument("--batch", type=int, default=64)
parser.add_argument("--iters", type=int, default=30)
parser.add_argument("--cpu", action="store_true")
# Block-tridiagonal backend for phases (b) and (d): "thomas" (XLA scan),
# "pallas" (fused whole-batch kernel), "cr" (cyclic reduction).
parser.add_argument("--algorithm", default="thomas", choices=["thomas", "pallas", "cr"])
args = parser.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

from mcp_tpu.bench import lane_change as lc
from mcp_tpu.kernels.block_tridiag import (
    banded_newton_step_compressed,
    gh_banded,
)
from mcp_tpu.solver import SolverOptions, fraction_to_the_boundary_linesearch_pair

B, K = args.batch, args.iters
print("device:", jax.devices()[0], f"B={B} iters={K}")

bench = lc.generate_test_problem(horizon=10)
mcp = bench.parametric_game.mcp
ts = mcp.time_structure
n, m = mcp.unconstrained_dimension, mcp.constrained_dimension
print(f"n={n} m={m} T={ts.num_blocks} b={ts.block_size} mt={ts.rows_per_block}")

key = jax.random.PRNGKey(1)
thetas = lc.generate_parameter_batch(key, B, bench, dtype=jnp.float32)
x = jnp.zeros((B, n), jnp.float32)
y = jnp.ones((B, m), jnp.float32)
s = jnp.ones((B, m), jnp.float32)
eps = jnp.float32(0.5)
tol = 1e-4


def timeit(name, body, c0):
    @jax.jit
    def run(c):
        return lax.fori_loop(0, K, body, c)

    out = jax.block_until_ready(run(c0))
    t0 = time.perf_counter()
    out = jax.block_until_ready(run(c0))
    dt = (time.perf_counter() - t0) / K * 1e3
    print(f"{name:38s} {dt:8.3f} ms/iter")
    return out


with jax.default_matmul_precision("highest"):
    # (a) assembly: fused residual + banded Jacobian via colored seeds
    def assembly(i, c):
        g, h, diag, lower, upper, Gy_b, Hx_b = jax.vmap(
            lambda xx, yy, tt: gh_banded(mcp, ts, xx, yy, tt)
        )(x + c * 0, y, thetas)
        return c + jnp.sum(diag) * 1e-20

    timeit("gh_banded assembly", assembly, jnp.float32(0))

    # (a2) the affine-bands fast path (one residual eval + tiny einsums),
    # attached by the builder for quadratic games.
    if getattr(mcp, "affine_bands", None) is not None:
        from mcp_tpu.kernels.block_tridiag import gh_banded_fast

        def assembly_fast(i, c):
            g, h, diag, lower, upper, Gy_b, Hx_b = jax.vmap(
                lambda xx, yy, tt: gh_banded_fast(mcp, ts, xx, yy, tt)
            )(x + c * 0, y, thetas)
            return c + jnp.sum(diag) * 1e-20

        timeit("affine-bands assembly (fast path)", assembly_fast, jnp.float32(0))

    # precompute bands once for phase (b)
    g, h, diag, lower, upper, Gy_b, Hx_b = jax.jit(
        jax.vmap(lambda xx, yy, tt: gh_banded(mcp, ts, xx, yy, tt))
    )(x, y, thetas)
    rG, rH, rC = g, h - s, s * y - eps

    if args.algorithm == "pallas":
        from mcp_tpu.kernels.thomas_pallas import thomas_solve as algo
    elif args.algorithm == "cr":
        algo = "cr"
    else:
        algo = "thomas"

    def newton(i, c):
        dx, dy, ds = jax.vmap(
            lambda D, L, U, GY, HX, yy, ss, a, b_, cc: banded_newton_step_compressed(
                D, L, U, GY, HX, yy, ss, a, b_, cc, tol, ts, algorithm=algo
            )
        )(diag + c * 0, lower, upper, Gy_b, Hx_b, y, s, rG, rH, rC)
        return c + jnp.sum(dx) * 1e-20

    timeit(f"banded newton step (schur+{args.algorithm})", newton, jnp.float32(0))

    # (c) linesearches (two per iteration)
    ds = jax.random.normal(jax.random.PRNGKey(2), (B, m), jnp.float32)
    dy = jax.random.normal(jax.random.PRNGKey(3), (B, m), jnp.float32)

    def linesearch(i, c):
        ls = lambda v, dv: fraction_to_the_boundary_linesearch_pair(
            v, dv, tau=0.995, decay=0.5, min_stepsize=1e-4
        )
        a = jax.vmap(ls)(
            jnp.stack([s + c * 0, y], axis=1), jnp.stack([ds, dy], axis=1)
        )
        return c + jnp.sum(a) * 1e-20

    timeit("fused pair frac-to-boundary ls", linesearch, jnp.float32(0))

    # (c2) the whole inner-loop glue as ONE Pallas kernel
    # (kernels/linesearch_pallas.py): pair linesearch + failure detection +
    # iterate update + ‖F‖∞.
    from mcp_tpu.kernels.linesearch_pallas import make_linesearch_update

    ls_update = make_linesearch_update(tau=0.995, decay=0.5, min_stepsize=1e-4)
    dx = jax.random.normal(jax.random.PRNGKey(4), (B, n), jnp.float32)

    def fused_glue(i, c):
        xo, so, yo, kkt, failed = jax.vmap(ls_update)(
            x + c * 0, dx, s, ds, y, dy, rG, rH, rC
        )
        return c + jnp.sum(xo) * 1e-20 + jnp.sum(kkt) * 1e-20

    timeit("fused ls+update+kkt Pallas kernel", fused_glue, jnp.float32(0))

    # (c3) the unfused glue chain (linesearch + update + norms) for an
    # apples-to-apples in-XLA comparison.
    def unfused_glue(i, c):
        def one(xx, dxx, ss, dss, yy, dyy, a, b_, cc):
            lin_failed = ~(
                jnp.all(jnp.isfinite(dxx))
                & jnp.all(jnp.isfinite(dyy))
                & jnp.all(jnp.isfinite(dss))
            )
            safe = lambda d: jnp.where(lin_failed, jnp.zeros_like(d), d)
            alphas = fraction_to_the_boundary_linesearch_pair(
                jnp.stack([ss, yy]),
                jnp.stack([safe(dss), safe(dyy)]),
                tau=0.995, decay=0.5, min_stepsize=1e-4,
            )
            step_failed = lin_failed | jnp.isnan(alphas[0]) | jnp.isnan(alphas[1])
            a_s = jnp.where(step_failed, 0.0, alphas[0])
            a_y = jnp.where(step_failed, 0.0, alphas[1])
            kkt = jnp.maximum(
                jnp.max(jnp.abs(a)),
                jnp.maximum(jnp.max(jnp.abs(b_)), jnp.max(jnp.abs(cc))),
            )
            return xx + a_s * safe(dxx), ss + a_s * safe(dss), yy + a_y * safe(dyy), kkt

        xo, so, yo, kkt = jax.vmap(one)(x + c * 0, dx, s, ds, y, dy, rG, rH, rC)
        return c + jnp.sum(xo) * 1e-20 + jnp.sum(kkt) * 1e-20

    timeit("unfused ls+update+kkt XLA chain", unfused_glue, jnp.float32(0))

    # (d) whole solve, for the per-iteration budget comparison
    from mcp_tpu.parallel.batch import solve_batch

    tier = {"thomas": "tridiag", "pallas": "tridiag_pallas", "cr": "tridiag_cr"}[
        args.algorithm
    ]
    opts = SolverOptions(linear_solver=tier)
    sol = solve_batch(mcp, thetas, options=opts)
    jax.block_until_ready(sol.x)
    t0 = time.perf_counter()
    sol = solve_batch(mcp, thetas, options=opts)
    jax.block_until_ready(sol.x)
    dt = time.perf_counter() - t0
    iters = int(jnp.max(sol.outer_iters))
    print(
        f"{f'full solve_batch ({tier})':38s} {dt*1e3:8.1f} ms/batch "
        f"(max outer={iters}, median={float(jnp.median(sol.outer_iters))})"
    )
