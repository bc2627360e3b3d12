#!/usr/bin/env python
"""Closed-loop evaluation sweep over selection modes + metric analysis.

CLI replacement for the reference's examples/test_receding_horizon.jl and
scripts/result_analysis.py / radar plots. Example:

    python scripts/evaluate_selection.py --data data --players 4 --horizon 30 \
        --model logs/<run>/best_model.pkl --steps 50 --out eval_out
"""

import argparse
import json
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True, help="dir containing test/ scenarios")
    p.add_argument("--players", type=int, default=4)
    p.add_argument("--horizon", type=int, default=30)
    p.add_argument("--input-horizon", type=int, default=10)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--model", default=None, help="checkpoint for NN modes")
    p.add_argument("--modes", nargs="*", default=None)
    p.add_argument("--scenarios", type=int, default=8)
    p.add_argument("--out", required=True)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from mcp_tpu.utils.devices import configure_tpu_cache

        configure_tpu_cache()  # shared cache + CPU-probe setup (utils/devices.py)

    import numpy as np

    from mcp_tpu.analysis import analyze_result, radar_plot
    from mcp_tpu.selection import (
        MODE_PARAMETERS_N4,
        MODE_PARAMETERS_N10,
        MaskedGameRunner,
        Scenario,
        evaluate_modes,
        load_all_json_data,
        load_checkpoint,
        setup_road_environment,
        setup_trajectory_game,
    )

    examples = load_all_json_data(os.path.join(args.data, "test"))[: args.scenarios]
    scenarios = [
        Scenario(initial_states=e.initial_states, goals=e.goals) for e in examples
    ]
    print(f"{len(scenarios)} test scenarios")

    env = setup_road_environment(length=10.0)
    game = setup_trajectory_game(environment=env, N=args.players)
    runner = MaskedGameRunner.create(game, N=args.players, horizon=args.horizon)

    params = None
    if args.model:
        params, _ = load_checkpoint(args.model)

    tables = MODE_PARAMETERS_N10 if args.players == 10 else MODE_PARAMETERS_N4
    if args.modes:
        tables = {m: tables[m] for m in args.modes}
    elif params is None:
        tables = {
            m: v for m, v in tables.items() if not m.startswith("Neural Network")
        }

    evaluate_modes(
        runner,
        scenarios,
        tables,
        args.out,
        num_sim_steps=args.steps,
        model_params=params,
        input_horizon=args.input_horizon,
    )

    # Metric analysis + radar chart over modes (scripts/radar_plot_*.py).
    metrics_by_mode = {}
    for mode, mode_params in tables.items():
        for mp in mode_params:
            rows = []
            for sid in range(len(scenarios)):
                path = os.path.join(
                    args.out,
                    f"receding_horizon_trajectories_[{sid}]_[{mode}]_[{mp}].json",
                )
                if not os.path.exists(path):
                    continue
                with open(path) as f:
                    rows.append(
                        analyze_result(json.load(f), num_players=args.players)
                    )
            if rows:
                metrics_by_mode[f"{mode} [{mp}]"] = {
                    k: float(np.mean([r[k] for r in rows])) for k in rows[0]
                }
    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        json.dump(metrics_by_mode, f, indent=2)
    if metrics_by_mode:
        radar_plot(metrics_by_mode, os.path.join(args.out, "radar.png"))
    print(f"metrics + radar chart in {args.out}")


if __name__ == "__main__":
    main()
