"""Real-pedestrian-data evaluation.

Mirror of the reference's examples/test_real_data.jl: evaluate selection
modes on real scenarios (pedestrian recordings) with dataset-fitted game
bounds (setup_real_game, train_and_test_utils.jl:403-442). The reference
reads per-scenario CSVs with one row per player holding columns
x, y, vx, vy, goal_x, goal_y (test_receding_horizon.jl:222-225); the same
schema is used here. Variable-length recordings are handled by trimming the
simulation to each scenario's length.
"""

from __future__ import annotations

import csv
import os
from typing import Optional, Sequence

import numpy as np

from .data import Scenario
from .evaluate import evaluate_modes
from .games import setup_real_environment, setup_real_game
from .model import MLPParams
from .runner import MaskedGameRunner

# Reference real-data environment extent (train_and_test_utils.jl:435-438
# state bounds give the dataset's spatial range).
REAL_BOUNDS = {"xmin": 18.5, "xmax": 26.0, "ymin": 2.0, "ymax": 23.5}


def load_scenario_csv(path: str, *, num_players: Optional[int] = None) -> Scenario:
    """Load one scenario CSV (columns: x, y, vx, vy, goal_x, goal_y; one row
    per player)."""
    rows = []
    with open(path) as f:
        for row in csv.DictReader(f):
            rows.append(
                (
                    float(row["x"]),
                    float(row["y"]),
                    float(row["vx"]),
                    float(row["vy"]),
                    float(row["goal_x"]),
                    float(row["goal_y"]),
                )
            )
    if num_players is not None:
        rows = rows[:num_players]
    arr = np.asarray(rows)
    return Scenario(initial_states=arr[:, :4], goals=arr[:, 4:6])


def load_scenario_dir(directory: str, *, num_players: Optional[int] = None) -> list[Scenario]:
    out = []
    for name in sorted(os.listdir(directory)):
        if name.endswith(".csv"):
            out.append(
                load_scenario_csv(os.path.join(directory, name), num_players=num_players)
            )
    return out


def make_real_runner(
    *, N: int, horizon: int = 30, bounds: dict = REAL_BOUNDS,
    trivial_coupling: bool = True,
) -> MaskedGameRunner:
    env = setup_real_environment(**bounds)
    game = setup_real_game(environment=env, N=N, trivial_coupling=trivial_coupling)
    return MaskedGameRunner.create(game, N=N, horizon=horizon)


def evaluate_real_scenarios(
    scenarios: Sequence[Scenario],
    modes_and_parameters: dict,
    out_dir: str,
    *,
    N: int,
    horizon: int = 30,
    num_sim_steps: int = 50,
    model_params: Optional[MLPParams] = None,
    input_horizon: int = 10,
    verbose: bool = True,
) -> None:
    """Evaluation sweep on real scenarios with the real-game dynamics/bounds
    (test_real_data.jl:135-209)."""
    runner = make_real_runner(N=N, horizon=horizon)
    evaluate_modes(
        runner,
        scenarios,
        modes_and_parameters,
        out_dir,
        num_sim_steps=num_sim_steps,
        model_params=model_params,
        input_horizon=input_horizon,
        verbose=verbose,
    )
