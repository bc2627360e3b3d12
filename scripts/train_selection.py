#!/usr/bin/env python
"""Train the player-selection MLP with the solver in the loop.

CLI replacement for the reference's examples/train_new.jl /
train_with_validation.jl. Example:

    python scripts/train_selection.py --data data --players 4 --horizon 30 \
        --epochs 20 --batch-size 8 --lr 0.005
"""

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True, help="dir containing train/ and val/")
    p.add_argument("--players", type=int, default=4)
    p.add_argument("--horizon", type=int, default=30)
    p.add_argument("--input-horizon", type=int, default=10)
    p.add_argument("--input-state-dim", type=int, default=2)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--lr", type=float, default=0.005)
    p.add_argument("--patience", type=int, default=100)
    p.add_argument("--seed", type=int, default=3)
    p.add_argument("--log-dir", default=None)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from mcp_tpu.utils.devices import configure_tpu_cache

        configure_tpu_cache()  # shared cache + CPU-probe setup (utils/devices.py)

    from mcp_tpu.analysis import loss_curves_plot
    from mcp_tpu.selection import (
        MaskedGameRunner,
        TrainConfig,
        load_all_json_data,
        setup_road_environment,
        setup_trajectory_game,
        train,
    )

    train_data = load_all_json_data(os.path.join(args.data, "train"))
    val_dir = os.path.join(args.data, "val")
    val_data = load_all_json_data(val_dir) if os.path.isdir(val_dir) else None
    print(f"train: {len(train_data)} examples, val: {len(val_data or [])}")

    env = setup_road_environment(length=10.0)
    game = setup_trajectory_game(environment=env, N=args.players)
    runner = MaskedGameRunner.create(game, N=args.players, horizon=args.horizon)

    config = TrainConfig(
        num_players=args.players,
        horizon=args.horizon,
        input_horizon=args.input_horizon,
        input_state_dim=args.input_state_dim,
        batch_size=args.batch_size,
        epochs=args.epochs,
        learning_rate=args.lr,
        patience=args.patience,
        seed=args.seed,
    )
    log_dir = args.log_dir or os.path.join("logs", config.record_name)
    params, history = train(
        runner, train_data, val_data, config=config, log_dir=log_dir
    )
    loss_curves_plot(history, os.path.join(log_dir, "loss_curves.png"))
    print(f"done; checkpoints + curves in {log_dir}")


if __name__ == "__main__":
    main()
