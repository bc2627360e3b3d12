#!/usr/bin/env python
"""Mask loss-landscape grid sweep + heatmap (reference
examples/gradient_test.jl:7-55 and examples/loss_visualize.py): sweep two
mask entries over [0,1]² against a ground-truth example and plot the
composite loss. The whole grid solves as ONE vmapped batch.

    python scripts/loss_landscape.py --data data --players 4 --horizon 30 --out landscape.png
"""

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True, help="dir containing train/ examples")
    p.add_argument("--players", type=int, default=4)
    p.add_argument("--horizon", type=int, default=30)
    p.add_argument("--input-horizon", type=int, default=10)
    p.add_argument("--grid", type=int, default=11)
    p.add_argument("--mask-indices", type=int, nargs=2, default=[1, 2])
    p.add_argument("--example", type=int, default=0)
    p.add_argument("--out", default="landscape.png")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mcp_tpu.analysis import loss_landscape_plot, mask_loss_landscape
    from mcp_tpu.selection import (
        MaskedGameRunner,
        load_all_json_data,
        setup_road_environment,
        setup_trajectory_game,
    )

    examples = load_all_json_data(os.path.join(args.data, "train"))
    ex = examples[args.example]

    env = setup_road_environment(length=10.0)
    game = setup_trajectory_game(environment=env, N=args.players)
    runner = MaskedGameRunner.create(game, N=args.players, horizon=args.horizon)

    out = mask_loss_landscape(
        runner,
        jnp.asarray(ex.initial_states, jnp.float32),
        jnp.asarray(ex.goals, jnp.float32),
        jnp.asarray(ex.trajectories[ex.ego_index], jnp.float32),
        mask_indices=tuple(args.mask_indices),
        grid_points=args.grid,
        input_horizon=args.input_horizon,
    )
    loss_landscape_plot(out["grid_x"], out["grid_y"], out["losses"], args.out)
    print(
        f"landscape written to {args.out}; loss range "
        f"[{out['losses'].min():.4f}, {out['losses'].max():.4f}], "
        f"solved {int((out['statuses'] == 0).sum())}/{out['statuses'].size}"
    )


if __name__ == "__main__":
    main()
