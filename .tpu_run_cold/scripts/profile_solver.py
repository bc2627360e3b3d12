"""Profile the interior-point solve's components on the current backend:
residual+Jacobian assembly vs the Newton linear solve vs the full solve.
Usage: python scripts/profile_solver.py [--cpu] [--batch B]
"""

import argparse
import time

import jax
import jax.numpy as jnp

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--batch", type=int, default=16)
parser.add_argument("--f64", action="store_true")
args = parser.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")
if args.f64:
    jax.config.update("jax_enable_x64", True)

from mcp_tpu.bench import lane_change as lc
from mcp_tpu.linalg import newton_step_condensed
from mcp_tpu.parallel.batch import solve_batch
from mcp_tpu.solver import SolverOptions

print("device:", jax.devices()[0])
dtype = jnp.float64 if args.f64 else jnp.float32
B = args.batch
bench = lc.generate_test_problem(horizon=10)
mcp = bench.parametric_game.mcp
n, m = mcp.unconstrained_dimension, mcp.constrained_dimension
print(f"n={n} m={m} batch={B} dtype={dtype.__name__}")

key = jax.random.PRNGKey(0)
thetas = lc.generate_parameter_batch(key, B, bench, dtype=dtype)
x = jnp.zeros((B, n), dtype)
y = jnp.ones((B, m), dtype)
s = jnp.ones((B, m), dtype)


def timeit(name, fn, *a, repeats=5):
    out = fn(*a)
    jax.block_until_ready(out)
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:34s} {min(ts)*1e3:9.2f} ms")
    return out


@jax.jit
def residual(x, y, s, thetas):
    return jax.vmap(lambda x, y, s, t: mcp.F(x, y, s, t, 0.1))(x, y, s, thetas)


@jax.jit
def jacobians(x, y, thetas):
    return jax.vmap(lambda x, y, t: mcp.gh_jacobians(x, y, t))(x, y, thetas)


@jax.jit
def newton(x, y, s, thetas):
    def one(x, y, s, t):
        rG, rH, rC = mcp.F_parts(x, y, s, t, 0.1)
        Gx, Gy, Hx, Hy = mcp.gh_jacobians(x, y, t)
        return newton_step_condensed(Gx, Gy, Hx, Hy, y, s, rG, rH, rC, 1e-4)

    return jax.vmap(one)(x, y, s, thetas)


@jax.jit
def lu_only(A, b):
    return jnp.linalg.solve(A, b[..., None])[..., 0]


timeit("residual F", residual, x, y, s, thetas)
J = timeit("jacobians (Gx,Gy,Hx,Hy)", jacobians, x, y, thetas)
timeit("newton step (resid+jac+solve)", newton, x, y, s, thetas)
A = jax.random.normal(key, (B, n + m, n + m), dtype) + (n + m) * jnp.eye(n + m, dtype=dtype)
b = jax.random.normal(key, (B, n + m), dtype)
timeit(f"jnp.linalg.solve {n+m}x{n+m}", lu_only, A, b)

t0 = time.perf_counter()
sol = solve_batch(mcp, thetas, options=SolverOptions())
jax.block_until_ready(sol.x)
print(f"full solve compile+run: {time.perf_counter()-t0:.2f} s")
t0 = time.perf_counter()
sol = solve_batch(mcp, thetas, options=SolverOptions())
jax.block_until_ready(sol.x)
dt = time.perf_counter() - t0
import numpy as np

print(f"full solve: {dt*1e3:.1f} ms, outer iters: {np.asarray(sol.outer_iters)}")
print(f"statuses: {np.asarray(sol.status)}, kkt: {np.asarray(sol.kkt_error)[:4]}")
