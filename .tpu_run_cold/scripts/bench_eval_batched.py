"""Closed-loop evaluation sweep: scenario-batched vs scenario-serial timing.

The reference's evaluation workload (test_receding_horizon.jl:217-289) is a
mode x parameter x scenario triple loop of single solves per sim step;
evaluate_scenarios_batched re-solves all scenarios of one combination as one
batched solve per step. This script measures both on the current backend.
"""

import argparse
import time

import jax

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--scenarios", type=int, default=16)
parser.add_argument("--players", type=int, default=4)
parser.add_argument("--horizon", type=int, default=10)
parser.add_argument("--steps", type=int, default=10)
args = parser.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

from mcp_tpu.selection import (
    MaskedGameRunner,
    generate_scenarios,
    setup_road_environment,
    setup_trajectory_game,
)
from mcp_tpu.selection.evaluate import evaluate_scenario, evaluate_scenarios_batched

print("device:", jax.devices()[0])
N = args.players
env = setup_road_environment(length=10.0)
game = setup_trajectory_game(environment=env, N=N)
runner = MaskedGameRunner.create(game, N=N, horizon=args.horizon)
scenarios = generate_scenarios(
    num_scenarios=args.scenarios, num_players=N, arena_half_width=3.0, seed=5
)

# Compile warm-up for both paths.
evaluate_scenarios_batched(
    runner, scenarios, "Distance Threshold", 2.0, num_sim_steps=1, input_horizon=2
)
evaluate_scenario(
    runner, scenarios[0], "Distance Threshold", 2.0, num_sim_steps=1, input_horizon=2
)

t0 = time.perf_counter()
batched = evaluate_scenarios_batched(
    runner, scenarios, "Distance Threshold", 2.0,
    num_sim_steps=args.steps, input_horizon=2,
)
tb = time.perf_counter() - t0

t0 = time.perf_counter()
serial = [
    evaluate_scenario(
        runner, s, "Distance Threshold", 2.0,
        num_sim_steps=args.steps, input_horizon=2,
    )
    for s in scenarios
]
ts = time.perf_counter() - t0

ok_b = sum(all(st == 0 for st in r["Statuses"]) for r in batched)
ok_s = sum(all(st == 0 for st in r["Statuses"]) for r in serial)
print(
    f"batched {tb:.2f}s  serial {ts:.2f}s  speedup {ts / tb:.2f}x "
    f"({args.scenarios} scenarios x {args.steps} steps, N={N}, "
    f"horizon={args.horizon}; solved {ok_b}/{args.scenarios} vs {ok_s})"
)
