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


def evaluate_scenarios_batched(
    runner: MaskedGameRunner,
    scenarios: Sequence[Scenario],
    mode: str,
    mode_parameter: float,
    *,
    num_sim_steps: int = 50,
    model_params: Optional[MLPParams] = None,
    input_horizon: int = 10,
    ego_index: int = 0,
) -> list[dict]:
    """Closed-loop rollout of MANY scenarios under one selection mode, with
    every sim step solved as ONE batched game solve.

    The reference (and `evaluate_scenario`) steps scenarios one at a time —
    a host-serial loop of batch-1 solves with per-step host↔device
    ping-pong. On an accelerator the whole (mode, parameter) sweep's
    scenarios are data-parallel: mask computation (cheap numpy heuristics /
    one MLP apply) stays host-side per scenario, but the expensive masked
    re-solve runs once per step over the whole scenario batch. Per-scenario
    semantics are unchanged: warm starts track each scenario's own last
    successful solution (utils.jl:232-234), and scenarios with their own
    ``sim_steps`` stop recording at their recorded length (shorter rows ride
    along in the batch; their extra solves are discarded).

    Returns one result dict per scenario, in the reference's
    receding_horizon_result schema (same as `evaluate_scenario`).
    """
    N, B = runner.N, len(scenarios)
    model = None
    if model_params is not None:
        model = lambda x: np.asarray(apply_mlp(model_params, jnp.asarray(x, jnp.float32)))
    partial = "Partial" in mode
    isd = 2 if partial else 4

    lengths = [
        s.sim_steps if getattr(s, "sim_steps", None) else num_sim_steps
        for s in scenarios
    ]
    max_steps = max(lengths)

    states = np.stack(
        [np.asarray(s.initial_states, dtype=np.float64) for s in scenarios]
    )  # (B, N, 4)
    goals_j = jnp.asarray(
        np.stack([np.asarray(s.goals) for s in scenarios]), dtype=jnp.float32
    )
    histories = [[states[b].copy()] for b in range(B)]
    controls_hist: list[list[np.ndarray]] = [[] for _ in range(B)]
    masks_hist: list[list[np.ndarray]] = [[] for _ in range(B)]
    statuses: list[list[int]] = [[] for _ in range(B)]

    # Per-scenario warm starts: rows switch from cold to warm independently
    # as their own solves succeed.
    warm_x = warm_y = None
    has_warm = np.zeros(B, dtype=bool)

    for sim_step in range(1, max_steps + 1):
        # Host-side mask computation per scenario (identical code path to
        # the serial evaluator).
        masks = np.ones((B, N))
        for b in range(B):
            if sim_step > lengths[b]:
                continue  # finished rows ride along with their last mask
            window = histories[b][-input_horizon:]
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
                [controls_hist[b][-1][i] for i in range(N)]
                if controls_hist[b]
                else []
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
            masks[b] = np.concatenate([[1.0], mask])
            masks_hist[b].append(masks[b].copy())

        init_j = jnp.asarray(states, dtype=jnp.float32)
        masks_j = jnp.asarray(masks, jnp.float32)
        mask_rows = runner.ego_masked_mask_rows(masks_j, ego_index=ego_index)
        cold = runner.cold_starts(init_j)
        if warm_x is None:
            x0, y0 = cold, None
        else:
            w = jnp.asarray(has_warm)[:, None]
            x0 = jnp.where(w, warm_x, cold)
            y0 = jnp.where(w, warm_y, jnp.ones_like(warm_y))
        next_states, applied_controls, bs = runner.step_closed_loop(
            init_j, goals_j, masks_j, mask_rows=mask_rows, x0=x0, y0=y0
        )
        ok = np.asarray(bs.result.status) == 0
        if warm_x is None:
            warm_x = jnp.where(jnp.asarray(ok)[:, None], bs.result.x, 0.0)
            warm_y = jnp.where(
                jnp.asarray(ok)[:, None], bs.result.y, jnp.ones_like(bs.result.y)
            )
        else:
            okj = jnp.asarray(ok)[:, None]
            warm_x = jnp.where(okj, bs.result.x, warm_x)
            warm_y = jnp.where(okj, bs.result.y, warm_y)
        has_warm |= ok

        next_np = np.asarray(next_states, dtype=np.float64)
        ctrl_np = np.asarray(applied_controls, dtype=np.float64)
        for b in range(B):
            if sim_step > lengths[b]:
                continue
            statuses[b].append(int(bs.result.status[b]))
            states[b] = next_np[b]
            controls_hist[b].append(ctrl_np[b])
            histories[b].append(states[b].copy())

    results = []
    for b, scenario in enumerate(scenarios):
        result = {}
        for i in range(N):
            result[f"Player {i + 1} Trajectory"] = [
                h[i].tolist() for h in histories[b]
            ]
            result[f"Player {i + 1} Control"] = [
                c[i].tolist() for c in controls_hist[b]
            ]
            result[f"Player {i + 1} Initial State"] = scenario.initial_states[
                i
            ].tolist()
            result[f"Player {i + 1} Goal"] = scenario.goals[i].tolist()
        result["Player 1 Mask"] = [m.tolist() for m in masks_hist[b]]
        result["Statuses"] = statuses[b]
        results.append(result)
    return results


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
    batch_scenarios: bool = True,
) -> None:
    """Evaluation sweep over modes × parameters × scenarios, dumping one JSON
    per combination (test_receding_horizon.jl:217-289 output naming; real-data
    sweeps name files trajectories_[...] — test_real_data.jl:203).

    With ``batch_scenarios`` (default) each (mode, parameter) combination's
    scenarios roll out together, one batched solve per sim step
    (`evaluate_scenarios_batched`) — the reference's workload is a
    mode × parameter × scenario triple loop of single solves
    (test_receding_horizon.jl:217-289); batching the scenario axis is the
    accelerator-shaped redesign. Set False for the scenario-serial path.
    """
    os.makedirs(out_dir, exist_ok=True)
    for mode, params in modes_and_parameters.items():
        for mode_parameter in params:
            if batch_scenarios:
                if verbose:
                    print(
                        f"mode={mode} param={mode_parameter} "
                        f"scenarios=0..{len(scenarios) - 1} (batched)"
                    )
                results = evaluate_scenarios_batched(
                    runner,
                    scenarios,
                    mode,
                    mode_parameter,
                    num_sim_steps=num_sim_steps,
                    model_params=model_params,
                    input_horizon=input_horizon,
                )
            else:
                results = []
                for k, scenario in enumerate(scenarios):
                    # Variable-length recordings: a scenario's own duration
                    # wins (the reference's per-scenario time_dict,
                    # test_real_data.jl:135,159).
                    steps = (
                        scenario.sim_steps
                        if getattr(scenario, "sim_steps", None)
                        else num_sim_steps
                    )
                    if verbose:
                        print(
                            f"mode={mode} param={mode_parameter} "
                            f"scenario={scenario_offset + k} steps={steps}"
                        )
                    results.append(
                        evaluate_scenario(
                            runner,
                            scenario,
                            mode,
                            mode_parameter,
                            num_sim_steps=steps,
                            model_params=model_params,
                            input_horizon=input_horizon,
                        )
                    )
            for k, result in enumerate(results):
                sid = scenario_offset + k
                path = os.path.join(
                    out_dir,
                    f"{file_prefix}_[{sid}]_[{mode}]_[{mode_parameter}].json",
                )
                with open(path, "w") as f:
                    json.dump(result, f)
