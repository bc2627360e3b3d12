"""On-device micro-benchmark: where does a Newton iteration's time go?

Times K repetitions of each component inside one jitted fori_loop (so
per-call dispatch overhead is amortized away): the fused residual+Jacobian
evaluation, the schur reduction+solve, and jnp.linalg.solve alone.

Usage: python scripts/microbench_newton.py [--cpu] [--batch B] [--iters K]
"""

import argparse
import time

import jax
import jax.numpy as jnp
from jax import lax

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--batch", type=int, default=64)
parser.add_argument("--iters", type=int, default=20)
args = parser.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

from mcp_tpu.bench import lane_change as lc
from mcp_tpu.linalg import newton_step_schur

print("device:", jax.devices()[0])
B, K = args.batch, args.iters
bench = lc.generate_test_problem(horizon=10)
mcp = bench.parametric_game.mcp
n, m = mcp.unconstrained_dimension, mcp.constrained_dimension
print(f"n={n} m={m} batch={B} iters={K}")

key = jax.random.PRNGKey(0)
thetas = lc.generate_parameter_batch(key, B, bench, dtype=jnp.float32)
x = jnp.zeros((B, n), jnp.float32)
y = jnp.ones((B, m), jnp.float32)
s = jnp.ones((B, m), jnp.float32)


def loop(fn, carry_init):
    @jax.jit
    def run(c):
        return lax.fori_loop(0, K, lambda i, c: fn(i, c), c)

    return run


def timeit(name, fn, carry):
    run = loop(fn, carry)
    out = jax.block_until_ready(run(carry))
    t0 = time.perf_counter()
    out = jax.block_until_ready(run(carry))
    dt = time.perf_counter() - t0
    print(f"{name:40s} {dt / K * 1e3:8.3f} ms/iter")
    return out


with jax.default_matmul_precision("highest"):
    # 1. fused residual + jacobian only
    def jac_body(i, c):
        x, y, s = c
        out = jax.vmap(lambda x, y, t: mcp.gh_linearized(x, y, t))(x, y, thetas)
        g = out[0]
        return (x + 1e-12 * g[:, :n] * 0 + 1e-12 * out[2][:, 0, :n] * 0, y, s)

    timeit("gh_linearized (resid+jac)", jac_body, (x, y, s))

    # 2. full schur newton step given precomputed jacobians
    out = jax.jit(jax.vmap(lambda x, y, t: mcp.gh_linearized(x, y, t)))(x, y, thetas)
    g, h, Gx, Gy, Hx, Hy = out

    def schur_body(i, c):
        x, y, s = c
        rG, rH, rC = g, h - s, s * y - 0.1
        dx, dy, ds = jax.vmap(
            lambda Gx, Gy, Hx, Hy, y, s, rG, rH, rC: newton_step_schur(
                Gx, Gy, Hx, Hy, y, s, rG, rH, rC, 1e-4
            )
        )(Gx, Gy, Hx, Hy, y, s, rG, rH, rC)
        return (x + 1e-12 * dx * 0, y + 1e-12 * dy * 0, s + 1e-12 * ds * 0)

    timeit("schur reduction + linalg.solve", schur_body, (x, y, s))

    # 3. linalg.solve alone (n x n)
    A = Gx + 3.0 * jnp.eye(n, dtype=jnp.float32)
    b = g

    def lu_body(i, c):
        x, y, s = c
        dx = jnp.linalg.solve(A + i * 0.0, b[..., None])[..., 0]
        return (x + 1e-12 * dx * 0, y, s)

    timeit(f"jnp.linalg.solve {n}x{n} only", lu_body, (x, y, s))

    # 3b. pallas QR solve only
    from mcp_tpu.kernels.linear_solve import pallas_gauss_solve

    def pallas_body(i, c):
        x, y, s = c
        dx = pallas_gauss_solve(A + i * 0.0, b)
        return (x + 1e-12 * dx * 0, y, s)

    timeit(f"pallas QR solve {n}x{n} (tile 16)", pallas_body, (x, y, s))

    def pallas_body32(i, c):
        x, y, s = c
        dx = pallas_gauss_solve(A + i * 0.0, b, batch_tile=32)
        return (x + 1e-12 * dx * 0, y, s)

    timeit(f"pallas QR solve {n}x{n} (tile 32)", pallas_body32, (x, y, s))

    # 4. matmul reference: one n x n @ n x n batched matmul
    def mm_body(i, c):
        x, y, s = c
        C = A @ A
        return (x + 1e-12 * C[:, 0, :n] * 0, y, s)

    timeit(f"batched matmul {n}x{n} (reference)", mm_body, (x, y, s))
