#!/usr/bin/env python
"""Per-phase on-chip profile of the QP suite's Newton iteration (VERDICT r3
item 2: the suite runs ~3 orders of magnitude off the arithmetic roofline —
find where the time goes).

Each phase runs ITERS times inside ONE jitted lax.fori_loop whose carry is a
scalar reduction (immune to dispatch caching and buffer under-wait,
CLAUDE.md timing traps), vmapped over the batch. Reported: ms per iteration
for the whole batch, plus the analytic FLOPs and the implied fraction of
peak (v5e ~197 Tf/s bf16, ~f32 HIGHEST ≈ 1/6 of that ≈ 33 Tf/s usable on
the MXU; see DESIGN.md roofline section).

Usage: python scripts/profile_qp_phases.py [--cpu] [--batch 256] [--iters 20]
"""

import argparse
import os
import sys
import time

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--batch", type=int, default=256)
parser.add_argument("--iters", type=int, default=20)
parser.add_argument("--n", type=int, default=100)
parser.add_argument("--m", type=int, default=100)
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
else:
    from mcp_tpu.utils.devices import configure_tpu_cache

    configure_tpu_cache()  # shared cache + CPU-probe setup (utils/devices.py)

import jax.numpy as jnp
from jax import lax

from mcp_tpu.bench import qp
from mcp_tpu.linalg import _schur_system

print("device:", jax.devices()[0], file=sys.stderr)
n, m, B, ITERS = args.n, args.m, args.batch, args.iters
problem = qp.generate_test_problem(num_primals=n, num_inequalities=m)
mcp = problem.mcp
thetas = qp.generate_parameter_batch(jax.random.PRNGKey(1), B, dtype=jnp.float32)

key = jax.random.PRNGKey(0)
x0 = 0.1 * jax.random.normal(key, (B, n), jnp.float32)
y0 = jnp.ones((B, m), jnp.float32)
s0 = jnp.ones((B, m), jnp.float32)


def timed(name, make_fn, flops_per_iter=None):
    """make_fn() -> jitted f(args...) -> scalar; time ITERS in-graph."""
    fn = make_fn()
    float(fn())  # compile + run
    t0 = time.perf_counter()
    float(fn())
    dt = time.perf_counter() - t0
    per_iter = dt / ITERS
    line = f"{name:28s} {per_iter * 1e3:9.3f} ms/iter/batch{B}"
    if flops_per_iter:
        tf = flops_per_iter / per_iter / 1e12
        line += f"   {tf:7.2f} Tflop/s"
    print(line, flush=True)
    return per_iter


with jax.default_matmul_precision("highest"):
    # -- phase: generic linearize (vmapped (n+m)-seed forward sweep) --------
    def make_linearize():
        def body(i, acc):
            def one(x, y, th):
                g, h, Gx, Gy, Hx, Hy = mcp.gh_linearized(x + acc * 0.0, y, th)
                return jnp.sum(g) + jnp.sum(Gx[0]) + jnp.sum(Hy[0])

            return acc + jnp.sum(jax.vmap(one)(x0, y0, thetas))

        return jax.jit(lambda: lax.fori_loop(0, ITERS, body, jnp.float32(0.0)))

    # -- phase: affine residual (two matvecs via hoisted Jacobian) ----------
    def make_affine_residual():
        def one_data(th):
            return mcp.gh_affine_data(th, dtype=jnp.float32)

        data = jax.vmap(one_data)(thetas)

        def body(i, acc):
            def one(x, y, d):
                g0, h0, Gx, Gy, Hx, Hy = d
                g = g0 + Gx @ (x + acc * 0.0) + Gy @ y
                h = h0 + Hx @ x + Hy @ y
                return jnp.sum(g) + jnp.sum(h)

            return acc + jnp.sum(jax.vmap(one, in_axes=(0, 0, 0))(x0, y0, data))

        return jax.jit(lambda: lax.fori_loop(0, ITERS, body, jnp.float32(0.0)))

    # Fixed Jacobians for the downstream phases.
    g0, h0, GX, GY, HX, HY = jax.vmap(
        lambda th: mcp.gh_affine_data(th, dtype=jnp.float32)
    )(thetas)

    # -- phase: schur assembly (Gy/w @ Hx reduction) ------------------------
    def make_schur_assembly():
        def body(i, acc):
            def one(Gx, Gy, Hx, y, s, rG, rH):
                A, b, *_ = _schur_system(
                    Gx, Gy, Hx, y + acc * 0.0, s, rG, rH, s * y, 1e-5
                )
                return jnp.sum(A[0]) + jnp.sum(b)

            return acc + jnp.sum(jax.vmap(one)(GX, GY, HX, y0, s0, g0, h0))

        return jax.jit(lambda: lax.fori_loop(0, ITERS, body, jnp.float32(0.0)))

    # -- phase: the n×n solve (three backends) ------------------------------
    Amat = GX + 1e-5 * jnp.eye(n, dtype=jnp.float32)[None] + jnp.einsum(
        "bij,bkj->bik", GY, HX * 0.01
    )
    bvec = g0

    def make_solver_phase(solver):
        def body(i, acc):
            x = solver(Amat + acc * 0.0, bvec)
            return acc + jnp.sum(x).astype(jnp.float32) * 1e-9

        return jax.jit(lambda: lax.fori_loop(0, ITERS, body, jnp.float32(0.0)))

    def gauss(A, b):
        from mcp_tpu.kernels.linear_solve import gauss_solve

        return jax.vmap(gauss_solve)(A, b) if A.ndim == 3 else gauss_solve(A, b)

    def gauss_bigtile(A, b):
        # One grid step for the whole batch: the serial reflector chain runs
        # once (n steps) instead of once per VMEM tile (grid·n steps).
        from mcp_tpu.kernels.linear_solve import pallas_qr_solve_fused

        return pallas_qr_solve_fused(A, b, vmem_budget_bytes=48 * 2**20)

    def qr_lanes(A, b):
        # Batch-on-lanes layout (round-4 kernel): every reflector pass is a
        # dense (n8+1, n8, 128) FMA — no Mosaic row padding in the chain.
        from mcp_tpu.kernels.linear_solve import pallas_qr_lanes_solve

        return pallas_qr_lanes_solve(A, b)

    def qr_lanes_128(A, b):
        from mcp_tpu.kernels.linear_solve import pallas_qr_lanes_solve

        return pallas_qr_lanes_solve(A, b, lane_width=128)

    def gj_lanes(A, b):
        # SPD-only Gauss-Jordan: 1 big reduction + 1 FMA per step, no
        # backsub pass (valid: the QP schur matrix is SPD).
        from mcp_tpu.kernels.linear_solve import pallas_gj_lanes_solve

        return pallas_gj_lanes_solve(A, b)

    def wy(A, b):
        # Blocked-panel WY QR: trailing updates on the MXU; at n=100 the
        # panel structure may win where it lost at lane-change block sizes.
        from mcp_tpu.kernels.linear_solve import pallas_wy_solve

        return pallas_wy_solve(A, b, batch_tile=32, panel=8)

    # -- phase: one full Newton inner iteration (affine, schur_pallas) ------
    def make_full_iter():
        from mcp_tpu.linalg import newton_step_schur_pallas

        def body(i, acc):
            def one(Gx, Gy, Hx, Hy, g0i, h0i, x, y, s):
                g = g0i + Gx @ (x + acc * 0.0) + Gy @ y
                h = h0i + Hx @ x + Hy @ y
                dx, dy, ds = newton_step_schur_pallas(
                    Gx, Gy, Hx, Hy, y, s, g, h - s, s * y - 1e-3, 1e-5
                )
                return jnp.sum(dx)

            return acc + jnp.sum(
                jax.vmap(one)(GX, GY, HX, HY, g0, h0, x0, y0, s0)
            ).astype(jnp.float32) * 1e-9

        return jax.jit(lambda: lax.fori_loop(0, ITERS, body, jnp.float32(0.0)))

    flops_lin = 2 * B * (n + m) * (n * n + 2 * m * n)  # J @ eye matmuls
    flops_res = 2 * B * (n * n + 3 * m * n)
    flops_asm = 2 * B * n * n * m
    flops_gauss = 2 * B * n * n * n
    timed("linearize (generic)", make_linearize, flops_lin)
    timed("residual (affine)", make_affine_residual, flops_res)
    timed("schur assembly", make_schur_assembly, flops_asm)
    timed("solve: gauss_pallas", lambda: make_solver_phase(gauss), flops_gauss)
    timed("solve: gauss 48M tile", lambda: make_solver_phase(gauss_bigtile),
          flops_gauss)
    timed("solve: wy blocked p8", lambda: make_solver_phase(wy),
          8 * B * n * n * n)
    timed("solve: qr lanes", lambda: make_solver_phase(qr_lanes),
          4 * B * n * n * n)
    timed("solve: qr lanes LB128", lambda: make_solver_phase(qr_lanes_128),
          4 * B * n * n * n)
    timed("solve: gj lanes", lambda: make_solver_phase(gj_lanes),
          2 * B * n * n * n)
    timed(
        "solve: xla lu",
        lambda: make_solver_phase(
            lambda A, b: jnp.linalg.solve(A, b[..., None])[..., 0]
        ),
        flops_gauss,
    )
    timed("full iter (affine+pallas)", make_full_iter, flops_asm + flops_gauss)

# -- end-to-end solve for context ------------------------------------------
from mcp_tpu.parallel.batch import solve_batch
from mcp_tpu.solver import SolverOptions

opts = SolverOptions(tol=1e-5, linear_solver="schur_pallas", polish=True)
r = solve_batch(mcp, thetas, options=opts)
float(jnp.sum(r.x))
t0 = time.perf_counter()
r = solve_batch(mcp, thetas, options=opts)
float(jnp.sum(r.x))
dt = time.perf_counter() - t0
import numpy as np

print(
    f"full solve: {dt * 1e3:.1f} ms/batch{B} = {B / dt:.1f} solves/s, "
    f"success {float(jnp.mean(r.status == 0)):.3f}, "
    f"median outer {float(jnp.median(r.outer_iters)):.0f}, "
    f"max outer {int(jnp.max(r.outer_iters))}",
    flush=True,
)
