#!/usr/bin/env python
"""MFU / roofline accounting for the flagship Newton iterations (VERDICT r3
item 3: publish FLOPs + bytes per Newton iteration, measured iteration time,
and % of peak, so "is the headline the ceiling?" is answerable from the repo).

Model
-----
Per-instance analytic costs (f32, fused banded iteration — the headline path):

  residual (affine bands):   2·Σ size(attached derivative tensors) + band adds
  banded schur reduction:    ≈ 4·T·b²·m_t      (Gy·diag(1/w)·Hx per block, x2 mults)
  block-Thomas factor+solve: T·(2b³ + 6b²(b+1)) (kernels/thomas_pallas.py cost)
  bytes/iteration:           ≈ 3 passes over the band set
                             (assemble-write + factor-read/write) + iterates

QP (schur_pallas tier, affine fast path):

  residual: 2(n² + 3mn);  assembly: 2n²m + O(mn);  Gauss-Jordan solve: 6n³
  (kernels/linear_solve.py cost estimate);  recover: O(mn).

Peaks (TPU v5e, 1 chip): 197 Tflop/s bf16 MXU; f32 at
jax.default_matmul_precision("highest") runs 6 bf16 passes ≈ 32.8 Tflop/s
usable; HBM ≈ 819 GB/s; VMEM bandwidth is ~an order of magnitude higher.
The solver runs HIGHEST everywhere (bf16 Newton steps ~4x the iteration
count — solver.py matmul_precision), so f32-highest is the honest peak.

Usage:
  python scripts/roofline.py --cpu            # analytic table only
  python scripts/roofline.py --measure        # + in-graph iteration timing (TPU)
  python scripts/roofline.py --measure --json benchmarks_roofline.json
"""

import argparse
import json
import os
import sys
import time

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--measure", action="store_true",
                    help="time one fused Newton iteration in-graph on the current device")
parser.add_argument("--iters", type=int, default=20)
parser.add_argument("--json", default=None)
parser.add_argument(
    "--shapes", default="headline,n4,n10,qp",
    help="comma list of: headline (N=2 T=10 b256), n4 (N=4 T=30 b8), "
    "n10 (N=10 T=30 b8), qp (100/100 b256)",
)
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
else:
    from mcp_tpu.utils.devices import configure_tpu_cache

    configure_tpu_cache()  # shared cache + CPU-probe setup (utils/devices.py)

import jax.numpy as jnp
import numpy as np
from jax import lax

PEAK_BF16 = 197e12
PEAK_F32_HIGHEST = PEAK_BF16 / 6.0
HBM_BYTES_S = 819e9

print("device:", jax.devices()[0], file=sys.stderr)


def banded_costs(mcp, B):
    """(flops, bytes) per Newton iteration for the fused banded path."""
    st = mcp.time_structure
    T, b, mt = st.num_blocks, st.block_size, st.rows_per_block
    ab = mcp.affine_bands
    if ab is not None:
        tensor_sizes = sum(
            int(np.asarray(a).size)
            for a in jax.tree_util.tree_leaves(ab)
        )
        flops_res = 2 * tensor_sizes
    else:
        # colored-seed linearize: 3(b+mt) forward seeds over the residual
        flops_res = 2 * 3 * (b + mt) * T * (b * b + 2 * b * mt)
    flops_schur = 4 * T * b * b * mt
    flops_thomas = T * (2 * b**3 + 6 * b**2 * (b + 1))
    band_bytes = 4 * T * (3 * b * b + 2 * b * mt + 2 * b + 3 * mt)
    bytes_iter = 3 * band_bytes
    return B * (flops_res + flops_schur + flops_thomas), B * bytes_iter, dict(
        T=T, b=b, mt=mt, flops_res=flops_res, flops_schur=flops_schur,
        flops_thomas=flops_thomas)


def qp_costs(n, m, B):
    flops_res = 2 * (n * n + 3 * m * n)
    flops_asm = 2 * n * n * m + 6 * m * n
    flops_solve = 6 * n**3
    bytes_iter = 4 * (3 * (n * n + 2 * m * n) + n * (n + 1))  # J read x2 + A write + solve rw
    return B * (flops_res + flops_asm + flops_solve), B * bytes_iter, dict(
        n=n, m=m, flops_res=flops_res, flops_asm=flops_asm,
        flops_solve=flops_solve)


def measure_banded_iter(mcp, thetas, B, iters):
    """In-graph fori over the fused banded Newton iteration (linearize +
    banded schur + Thomas), scalar-reduced — the honest per-iteration time."""
    from mcp_tpu.kernels.block_tridiag import (
        banded_newton_step_compressed,
        gh_banded_fast,
    )
    from mcp_tpu.kernels.thomas_pallas import auto_thomas_solve

    st = mcp.time_structure
    n, m = mcp.unconstrained_dimension, mcp.constrained_dimension
    key = jax.random.PRNGKey(0)
    x0 = 0.01 * jax.random.normal(key, (B, n), jnp.float32)
    y0 = jnp.ones((B, m), jnp.float32)
    s0 = jnp.ones((B, m), jnp.float32)

    with jax.default_matmul_precision("highest"):

        def body(i, acc):
            def one(x, y, s, th):
                g, h, diag_b, lower_b, upper_b, Gy_b, Hx_b = gh_banded_fast(
                    mcp, st, x + acc * 0.0, y, th
                )
                dx, dy, ds = banded_newton_step_compressed(
                    diag_b, lower_b, upper_b, Gy_b, Hx_b,
                    y, s, g, h - s, s * y - 1e-3, 1e-4, st,
                    # The PRODUCTION kernel (batch-aware Pallas dispatcher),
                    # not the XLA scan — the first measurement pass timed
                    # "thomas" and over-reported per-iteration time ~8x.
                    algorithm=auto_thomas_solve,
                )
                return jnp.sum(dx)

            return acc + jnp.sum(
                jax.vmap(one)(x0, y0, s0, thetas)
            ).astype(jnp.float32) * 1e-9

        fn = jax.jit(lambda: lax.fori_loop(0, iters, body, jnp.float32(0.0)))
    float(fn())
    t0 = time.perf_counter()
    float(fn())
    return (time.perf_counter() - t0) / iters


def measure_qp_iter(mcp, thetas, B, iters):
    from mcp_tpu.linalg import newton_step_schur_pallas

    data = jax.vmap(lambda th: mcp.gh_affine_data(th, dtype=jnp.float32))(thetas)
    n, m = mcp.unconstrained_dimension, mcp.constrained_dimension
    key = jax.random.PRNGKey(0)
    x0 = 0.01 * jax.random.normal(key, (B, n), jnp.float32)
    y0 = jnp.ones((B, m), jnp.float32)
    s0 = jnp.ones((B, m), jnp.float32)

    with jax.default_matmul_precision("highest"):

        def body(i, acc):
            def one(d, x, y, s):
                g0, h0, Gx, Gy, Hx, Hy = d
                g = g0 + Gx @ (x + acc * 0.0) + Gy @ y
                h = h0 + Hx @ x + Hy @ y
                dx, dy, ds = newton_step_schur_pallas(
                    Gx, Gy, Hx, Hy, y, s, g, h - s, s * y - 1e-3, 1e-5
                )
                return jnp.sum(dx)

            return acc + jnp.sum(
                jax.vmap(one, in_axes=(0, 0, 0, 0))(data, x0, y0, s0)
            ).astype(jnp.float32) * 1e-9

        fn = jax.jit(lambda: lax.fori_loop(0, iters, body, jnp.float32(0.0)))
    float(fn())
    t0 = time.perf_counter()
    float(fn())
    return (time.perf_counter() - t0) / iters


def lane_shape(n_players, horizon, batch):
    if n_players == 2:
        from mcp_tpu.bench import lane_change as lc

        bench = lc.generate_test_problem(horizon=horizon)
        mcp = bench.parametric_game.mcp
        thetas = lc.generate_parameter_batch(jax.random.PRNGKey(1), batch, bench)
        return mcp, thetas
    from mcp_tpu.selection.games import (
        build_masked_parametric_game,
        setup_road_environment,
        setup_trajectory_game,
    )

    env = setup_road_environment(length=60.0)
    game = setup_trajectory_game(environment=env, N=n_players)
    pg = build_masked_parametric_game(game, N=n_players, horizon=horizon)
    mcp = pg.mcp
    p = sum(pg.dims.theta)
    thetas = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (batch, p), jnp.float32)
    return mcp, thetas


rows = []
for shape in args.shapes.split(","):
    shape = shape.strip()
    if shape == "qp":
        from mcp_tpu.bench import qp

        n = m = 100
        B = 256
        problem = qp.generate_test_problem()
        mcp = problem.mcp
        thetas = qp.generate_parameter_batch(jax.random.PRNGKey(1), B)
        flops, bts, detail = qp_costs(n, m, B)
        t = measure_qp_iter(mcp, thetas, B, args.iters) if args.measure else None
    else:
        cfg = {"headline": (2, 10, 256), "n4": (4, 30, 8), "n10": (10, 30, 8)}[shape]
        N, T, B = cfg
        mcp, thetas = lane_shape(N, T, B)
        if mcp.time_structure is None:
            print(f"{shape}: no time structure; skipped", file=sys.stderr)
            continue
        flops, bts, detail = banded_costs(mcp, B)
        t = measure_banded_iter(mcp, thetas, B, args.iters) if args.measure else None
    row = {
        "shape": shape,
        "batch": B,
        "flops_per_iter": flops,
        "bytes_per_iter": bts,
        "detail": detail,
        "peak_f32_highest_tflops": PEAK_F32_HIGHEST / 1e12,
        "hbm_gb_s": HBM_BYTES_S / 1e9,
        # Times to hit each roof — whichever is LARGER is the bound.
        "compute_bound_ms": flops / PEAK_F32_HIGHEST * 1e3,
        "memory_bound_ms": bts / HBM_BYTES_S * 1e3,
    }
    if t is not None:
        row.update(
            measured_iter_ms=t * 1e3,
            achieved_tflops=flops / t / 1e12,
            mfu_f32_highest=flops / t / PEAK_F32_HIGHEST,
            hbm_fraction=bts / t / HBM_BYTES_S,
        )
    rows.append(row)
    print(json.dumps(row), flush=True)

if args.json:
    with open(args.json, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {args.json}", file=sys.stderr)
