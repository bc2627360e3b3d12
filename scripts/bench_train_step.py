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
# Skip the staged-artifact warm path (force the full build + trace).
parser.add_argument("--no-staged", action="store_true")
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
else:
    from mcp_tpu.utils.devices import configure_tpu_cache

    configure_tpu_cache()  # shared cache + CPU-probe setup (utils/devices.py)

import jax.numpy as jnp
import numpy as np

from mcp_tpu.bench.flagships import train_step_setup

print("device:", jax.devices()[0], file=sys.stderr)
t_start = time.monotonic()

N, T, B = args.players, args.horizon, args.batch
# Warm path first: scripts/precompile.py stages the EXPORTED program +
# input arrays under the persistent cache, letting this run skip the game
# build AND the trace (VERDICT r4 item 9: first step < 60 s warm). Falls
# back to the full shared builder when nothing is staged.
staged = False
if not args.no_staged:
    from mcp_tpu.bench.flagships import load_staged_train_step

    s = load_staged_train_step(B, N, T, tier=args.tier, polish=args.polish)
    staged = s is not None
    if staged:
        print("using staged artifacts (exported program + inputs)",
              file=sys.stderr)
if not staged:
    s = train_step_setup(B, N, T, tier=args.tier, polish=args.polish)
print(f"N={N} T={T} B={B} tier={args.tier} rate={s.rate} polish={args.polish}",
      file=sys.stderr)
print(f"ground-truth solve success: {s.gt_success:.3f}", file=sys.stderr)
train_step, sgd_update, config = s.train_step, s.sgd_update, s.config
params, trajectories, init, goals, key = (
    s.params, s.trajectories, s.init, s.goals, s.key
)

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
    float(jnp.sum(init_r))  # outside the clock (VALUE-forced)
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
