"""Closed-loop receding-horizon evaluation of selection strategies.

Mirror of the reference's evaluation drivers
(examples/test_receding_horizon.jl:217-289 and examples/test_real_data.jl):
for each (mode, mode_parameter, scenario), run a closed-loop simulation where
every step (a) computes the ego mask from the current histories via the
selected heuristic or the trained NN, (b) re-solves the masked game, and
(c) advances to the plan's next state; dump per-scenario JSON with
trajectories, controls, and the mask sequence.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from .baselines import mask_computation
from .data import Scenario
from .model import MLPParams, apply_mlp
from .runner import MaskedGameRunner


def evaluate_scenario(
    runner: MaskedGameRunner,
    scenario: Scenario,
    mode: str,
    mode_parameter: float,
    *,
    num_sim_steps: int = 50,
    model_params: Optional[MLPParams] = None,
    input_horizon: int = 10,
    ego_index: int = 0,
) -> dict:
    """Closed-loop rollout of one scenario under one selection mode.

    Returns the reference's receding_horizon_result dict shape
    (test_receding_horizon.jl:227-281): per-player trajectories/controls,
    the ego mask sequence, initial states, and goals.
    """
    N = runner.N
    model = None
    if model_params is not None:
        model = lambda x: np.asarray(apply_mlp(model_params, jnp.asarray(x, jnp.float32)))

    # "Partial" modes feed only positions to the NN; others feed full states
    # (test_receding_horizon.jl:252-257).
    partial = "Partial" in mode
    isd = 2 if partial else 4

    states = np.asarray(scenario.initial_states, dtype=np.float64)  # (N, 4)
    goals_j = jnp.asarray(scenario.goals, dtype=jnp.float32)[None]
    history = [states.copy()]  # list of (N, 4) per sim step
    controls_hist = []
    masks_hist = []
    statuses = []
    last_solution = None

    for sim_step in range(1, num_sim_steps + 1):
        # Histories as the reference's flat growing/sliding vectors
        # (test_receding_horizon.jl:240-257): first 10 steps grow, then slide.
        window = history[-input_horizon:]
        trajectory = [
            np.concatenate([step[i] for step in window]) for i in range(N)
        ]
        if sim_step > 10:
            input_traj = np.concatenate(
                [
                    np.concatenate([step[i][:isd] for step in window])
                    for i in range(N)
                ]
            )
        else:
            input_traj = None
        latest_control = (
            [controls_hist[-1][i] for i in range(N)] if controls_hist else []
        )
        mask = mask_computation(
            input_traj,
            trajectory,
            latest_control,
            mode,
            sim_step,
            mode_parameter,
            model=model,
        )
        full_mask = np.concatenate([[1.0], mask])
        masks_hist.append(full_mask.copy())

        init_j = jnp.asarray(states, dtype=jnp.float32)[None]
        mask_rows = runner.ego_masked_mask_rows(
            jnp.asarray(full_mask, jnp.float32)[None], ego_index=ego_index
        )
        next_states, applied_controls, bs = runner.step_closed_loop(
            init_j,
            goals_j,
            jnp.asarray(full_mask, jnp.float32)[None],
            mask_rows=mask_rows,
            x0=None if last_solution is None else last_solution.result.x,
            y0=None if last_solution is None else last_solution.result.y,
        )
        if int(bs.result.status[0]) == 0:
            last_solution = bs
        statuses.append(int(bs.result.status[0]))
        states = np.asarray(next_states[0], dtype=np.float64)
        controls_hist.append(np.asarray(applied_controls[0], dtype=np.float64))
        history.append(states.copy())

    result = {}
    for i in range(N):
        result[f"Player {i + 1} Trajectory"] = [h[i].tolist() for h in history]
        result[f"Player {i + 1} Control"] = [c[i].tolist() for c in controls_hist]
        result[f"Player {i + 1} Initial State"] = scenario.initial_states[i].tolist()
        result[f"Player {i + 1} Goal"] = scenario.goals[i].tolist()
    result["Player 1 Mask"] = [m.tolist() for m in masks_hist]
    result["Statuses"] = statuses
    return result


def evaluate_modes(
    runner: MaskedGameRunner,
    scenarios: Sequence[Scenario],
    modes_and_parameters: dict,
    out_dir: str,
    *,
    num_sim_steps: int = 50,
    model_params: Optional[MLPParams] = None,
    input_horizon: int = 10,
    scenario_offset: int = 0,
    verbose: bool = True,
    file_prefix: str = "receding_horizon_trajectories",
) -> None:
    """Evaluation sweep over modes × parameters × scenarios, dumping one JSON
    per combination (test_receding_horizon.jl:217-289 output naming; real-data
    sweeps name files trajectories_[...] — test_real_data.jl:203)."""
    os.makedirs(out_dir, exist_ok=True)
    for mode, params in modes_and_parameters.items():
        for mode_parameter in params:
            for k, scenario in enumerate(scenarios):
                sid = scenario_offset + k
                # Variable-length recordings: a scenario's own duration wins
                # (the reference's per-scenario time_dict,
                # test_real_data.jl:135,159).
                steps = (
                    scenario.sim_steps
                    if getattr(scenario, "sim_steps", None)
                    else num_sim_steps
                )
                if verbose:
                    print(
                        f"mode={mode} param={mode_parameter} scenario={sid} "
                        f"steps={steps}"
                    )
                result = evaluate_scenario(
                    runner,
                    scenario,
                    mode,
                    mode_parameter,
                    num_sim_steps=steps,
                    model_params=model_params,
                    input_horizon=input_horizon,
                )
                path = os.path.join(
                    out_dir,
                    f"{file_prefix}_[{sid}]_[{mode}]_[{mode_parameter}].json",
                )
                with open(path, "w") as f:
                    json.dump(result, f)
