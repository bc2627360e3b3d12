#!/usr/bin/env python
"""On-chip hybrid/annealed knob sweep at the N=4 flagship shape (h=30, b=8).

One process, one problem build; per config: certified solve stats, host
per-dispatch median (value-forced, fresh bytes), and the in-graph fori
device rate. Goal: make the per-dispatch rate clear 200/s robustly
(round-4 final queue: 172-202/s across runs at ~25 ms compute + ~15 ms
jittery tunnel dispatch — compute must drop toward ~18 ms).
"""

import argparse
import json
import os
import sys
import time

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--batch", type=int, default=8)
parser.add_argument("--repeats", type=int, default=5)
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
else:
    from mcp_tpu.utils.devices import configure_tpu_cache

    configure_tpu_cache()  # shared cache + CPU-probe setup (utils/devices.py)

import jax.numpy as jnp
import numpy as np

from mcp_tpu.bench.harness import _ingraph_repeat_solver, true_kkt_errors
from mcp_tpu.parallel.batch import solve_batch
from mcp_tpu.selection.games import setup_road_environment, setup_trajectory_game
from mcp_tpu.selection.runner import MaskedGameRunner
from mcp_tpu.solver import SolverOptions

print("device:", jax.devices()[0], file=sys.stderr)
N, T, B = 4, 30, args.batch
env = setup_road_environment(length=10.0)
game = setup_trajectory_game(environment=env, N=N)
runner = MaskedGameRunner.create(game, N=N, horizon=T)
mcp = runner.parametric_game.mcp
key = jax.random.PRNGKey(0)
ang = jnp.linspace(0.0, 2 * jnp.pi, N, endpoint=False)
base = jnp.stack([3.0 * jnp.cos(ang), 3.0 * jnp.sin(ang)], axis=1)
init = jnp.concatenate([base, jnp.zeros((N, 2))], 1)[None].repeat(B, 0)
init = (init + 0.05 * jax.random.normal(key, init.shape)).astype(jnp.float32)
goals = (-base)[None].repeat(B, 0).astype(jnp.float32)
masks = jnp.ones((B, N), jnp.float32)
thetas = runner.pack_thetas(
    init, goals, jnp.broadcast_to(masks[:, None, :], (B, N, N))
)
x0 = runner.cold_starts(init)
n, m = mcp.unconstrained_dimension, mcp.constrained_dimension

CONFIGS = [
    ("hybrid sw3e-2 t.02 (r4)", dict(algorithm="hybrid", hybrid_switch_tol=3e-2,
                                     refinement_steps=0, tightening_rate=0.02)),
    ("hybrid sw1e-2 t.02", dict(algorithm="hybrid", hybrid_switch_tol=1e-2,
                                refinement_steps=0, tightening_rate=0.02)),
    ("hybrid sw1e-1 t.02", dict(algorithm="hybrid", hybrid_switch_tol=1e-1,
                                refinement_steps=0, tightening_rate=0.02)),
    ("hybrid sw3e-2 t.03", dict(algorithm="hybrid", hybrid_switch_tol=3e-2,
                                refinement_steps=0, tightening_rate=0.03)),
    ("hybrid sw3e-2 t.05", dict(algorithm="hybrid", hybrid_switch_tol=3e-2,
                                refinement_steps=0, tightening_rate=0.05)),
    ("hybrid sw3e-2 cf.1", dict(algorithm="hybrid", hybrid_switch_tol=3e-2,
                                refinement_steps=0, tightening_rate=0.02,
                                centering_floor=0.1)),
    ("ip t.02", dict(algorithm="ip", tightening_rate=0.02)),
]

for name, kw in CONFIGS:
    opts = SolverOptions(linear_solver="tridiag_auto", polish=True, tol=1e-4, **kw)
    r = solve_batch(mcp, thetas, x0=x0, options=opts)
    float(jnp.sum(r.x))
    times = []
    for rep in range(args.repeats):
        th = thetas + 1e-4 * jax.random.normal(
            jax.random.PRNGKey(100 + rep), thetas.shape, thetas.dtype
        )
        th.block_until_ready()
        t0 = time.perf_counter()
        r = solve_batch(mcp, th, x0=x0, options=opts)
        float(jnp.sum(r.x))
        times.append(time.perf_counter() - t0)
        last = th
    med = float(np.median(times))
    kkts = np.asarray(true_kkt_errors(mcp, r, last))
    # In-graph device rate (3 fresh batches in one fori dispatch).
    stack = jnp.stack([
        thetas + 1e-4 * jax.random.normal(
            jax.random.PRNGKey(200 + rr), thetas.shape, thetas.dtype)
        for rr in range(3)
    ])
    fn = _ingraph_repeat_solver(mcp, opts, 3)
    yi = jnp.ones((B, m), jnp.float32)
    si = jnp.ones((B, m), jnp.float32)
    fn(stack, x0, yi, si).block_until_ready()
    t0 = time.perf_counter()
    fn(stack, x0, yi, si).block_until_ready()
    ig = (time.perf_counter() - t0) / 3
    print(json.dumps({
        "config": name,
        "solves_per_sec": round(B / med, 2),
        "device_rate": round(B / ig, 2),
        "host_ms": round(med * 1e3, 1),
        "ingraph_ms": round(ig * 1e3, 1),
        "success": float(np.mean(np.asarray(r.status) == 0)),
        "frac": float(np.mean(kkts <= 1e-4)),
        "median_outer": float(np.median(np.asarray(r.outer_iters))),
    }), flush=True)
