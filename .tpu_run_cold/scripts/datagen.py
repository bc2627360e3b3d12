#!/usr/bin/env python
"""Generate random scenarios and ground-truth solved trajectories.

CLI replacement for the reference's scripts/data_generation.py +
examples/game_with_masks.jl pipeline: sample N-player scenarios with minimum
separation, replay them through the full (all-ones mask) game in batched
solves, and dump one JSON per scenario into train/val/test splits.

Example:
    python scripts/datagen.py --out data --players 4 --horizon 30 \
        --train 64 --val 16 --test 16
"""

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--players", type=int, default=4)
    p.add_argument("--horizon", type=int, default=30)
    p.add_argument("--train", type=int, default=64)
    p.add_argument("--val", type=int, default=16)
    p.add_argument("--test", type=int, default=16)
    p.add_argument("--arena", type=float, default=4.0)
    p.add_argument("--min-separation", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from mcp_tpu.selection import (
        MaskedGameRunner,
        generate_ground_truth,
        generate_scenarios,
        setup_road_environment,
        setup_trajectory_game,
    )

    env = setup_road_environment(length=2 * args.arena + 2)
    game = setup_trajectory_game(environment=env, N=args.players)
    runner = MaskedGameRunner.create(game, N=args.players, horizon=args.horizon)

    splits = [("train", args.train), ("val", args.val), ("test", args.test)]
    seed = args.seed
    for name, count in splits:
        if count == 0:
            continue
        scenarios = generate_scenarios(
            num_scenarios=count,
            num_players=args.players,
            arena_half_width=args.arena,
            min_separation=args.min_separation,
            seed=seed,
        )
        seed += 1
        out_dir = os.path.join(args.out, name)
        examples = generate_ground_truth(runner, scenarios, out_dir)
        print(f"{name}: {len(examples)}/{count} scenarios converged -> {out_dir}")


if __name__ == "__main__":
    main()
