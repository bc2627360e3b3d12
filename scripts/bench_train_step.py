#!/usr/bin/env python
"""On-TPU solver-in-the-loop training-step benchmark (VERDICT r3 item 5).

The fork's flagship workload is the training epoch
(/root/reference/examples/train_new.jl:27-108): MLP mask predictor →
masked-game solve → composite loss → gradient through the IP solver (IFT) →
SGD. This measures ONE jitted value_and_grad step at the flagship shape
(N=4, horizon 30, batch ≥ 8) with the banded Newton + banded-IFT sensitivity
path and certified (polish) forward solves.

Reference baselines: the reference pays ~5.04 s per N=4 receding-horizon
SOLVE on CPU (scripts/time_plot.py:5-14) and minutes per training step; this
repo's round-1 CPU figures were 31 s (first step) / 2.81 s per step.

Timing: median of --repeats value-forced steps (axon buffer-block
under-waits; CLAUDE.md), fresh-bytes inputs per repeat.

Usage: python scripts/bench_train_step.py [--cpu] [--batch 8] [--repeats 5]
"""

import argparse
import json
import os
import sys
import time

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--batch", type=int, default=8)
parser.add_argument("--players", type=int, default=4)
parser.add_argument("--horizon", type=int, default=30)
parser.add_argument("--repeats", type=int, default=5)
parser.add_argument("--tier", default="tridiag")
parser.add_argument("--no-polish", dest="polish", action="store_false")
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
else:
    from mcp_tpu.utils.devices import configure_tpu_cache

    configure_tpu_cache()  # shared cache + CPU-probe setup (utils/devices.py)

import jax.numpy as jnp
import numpy as np

from mcp_tpu.selection.games import setup_road_environment, setup_trajectory_game
from mcp_tpu.selection.model import init_mlp, input_size
from mcp_tpu.selection.runner import MaskedGameRunner
from mcp_tpu.selection.train import TrainConfig, make_train_step
from mcp_tpu.solver import SolverOptions, auto_tightening_rate

print("device:", jax.devices()[0], file=sys.stderr)
t_start = time.monotonic()

N, T, B = args.players, args.horizon, args.batch
env = setup_road_environment(length=10.0)
game = setup_trajectory_game(environment=env, N=N)
import dataclasses

runner = MaskedGameRunner.create(game, N=N, horizon=T)
# PARTIAL-mask games (the MLP's sigmoid outputs sit near 0.5 early in
# training) are harder than the all-ones flagships: at N=4 the 0.02 anneal
# certifies only half the lanes while 0.05 certifies all (measured, CPU,
# round 4) — so the training bench floors the auto rate at 0.05.
rate = max(auto_tightening_rate(runner.parametric_game.mcp), 0.05)
runner = dataclasses.replace(
    runner,
    options=SolverOptions(
        linear_solver=args.tier,
        sensitivity_solver="tridiag",
        tightening_rate=rate,
        polish=args.polish,
    ),
)
print(f"N={N} T={T} B={B} tier={args.tier} rate={rate} polish={args.polish}",
      file=sys.stderr)

config = TrainConfig(num_players=N, horizon=T, batch_size=B)
train_step, _, sgd_update = make_train_step(runner, config)

# Scenario batch: circle-crossing starts (the bench_tridiag flagship setup),
# ground-truth targets = the all-ones-mask solve of the same scenarios (the
# reference's targets are all-ones-game dumps, game_with_masks.jl:25-43).
key = jax.random.PRNGKey(0)
ang = jnp.linspace(0.0, 2 * jnp.pi, N, endpoint=False)
base = jnp.stack([3.0 * jnp.cos(ang), 3.0 * jnp.sin(ang)], axis=1)
init = jnp.concatenate([base, jnp.zeros((N, 2))], 1)[None].repeat(B, 0)
init = (init + 0.05 * jax.random.normal(key, init.shape)).astype(jnp.float32)
goals = (-base)[None].repeat(B, 0).astype(jnp.float32)
gt = runner.solve(init, goals, jnp.ones((B, N), jnp.float32))
trajectories = gt.trajectories  # (B, N, T, 4)
gt_success = float(jnp.mean(gt.result.status == 0))
print(f"ground-truth solve success: {gt_success:.3f}", file=sys.stderr)

params = init_mlp(jax.random.PRNGKey(3), input_size(N, config.input_horizon,
                                                    config.input_state_dim), N)

# Warm-up/compile.
loss, aux, grads = train_step(params, trajectories, init, goals)
float(loss)
compile_s = time.monotonic() - t_start
print(f"compile+first step: {compile_s:.1f} s", file=sys.stderr)

times = []
for r in range(args.repeats):
    init_r = init + 1e-3 * jax.random.normal(
        jax.random.fold_in(key, r), init.shape, jnp.float32
    )
    jax.block_until_ready(init_r)
    t0 = time.perf_counter()
    loss, aux, grads = train_step(params, trajectories, init_r, goals)
    # Force VALUES (loss + a grad leaf) — buffer-block under-waits on axon.
    float(loss)
    float(jnp.sum(jax.tree_util.tree_leaves(grads)[0]))
    times.append(time.perf_counter() - t0)
    params = sgd_update(params, grads, config.learning_rate)

step_t = float(np.median(times))
per_example, status = aux
out = {
    "metric": "train_step_seconds",
    "value": round(step_t, 4),
    "unit": "s/step",
    "batch_size": B,
    "players": N,
    "horizon": T,
    "examples_per_sec": round(B / step_t, 2),
    "forward_success_rate": float(jnp.mean(status == 0)),
    "loss": float(loss),
    "grads_finite": bool(
        all(bool(jnp.all(jnp.isfinite(g)))
            for g in jax.tree_util.tree_leaves(grads))
    ),
    "certified_forward": bool(args.polish),
    "compile_s": round(compile_s, 1),
    "vs_round1_cpu_2.81s": round(2.81 / step_t, 2),
    "device": str(jax.devices()[0]),
}
print(json.dumps(out))
