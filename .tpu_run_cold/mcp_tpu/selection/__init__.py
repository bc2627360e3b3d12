"""Player-selection research layer: masked N-player games, NN mask
predictor, solver-in-the-loop training, heuristic baselines, and closed-loop
evaluation (the reference's examples/ research stack, SURVEY.md §2.2
C13-C21)."""

from .baselines import MODE_PARAMETERS_N4, MODE_PARAMETERS_N10, MODES, mask_computation
from .data import (
    DataLoader,
    Example,
    Scenario,
    batch_arrays,
    generate_scenarios,
    load_all_json_data,
    load_example,
    save_example,
)
from .evaluate import evaluate_modes, evaluate_scenario
from .games import (
    build_masked_parametric_game,
    pack_masked_theta,
    setup_real_environment,
    setup_real_game,
    setup_road_environment,
    setup_trajectory_game,
)
from .loss import clamp_cotangent, composite_loss
from .model import MLPParams, apply_mlp, init_mlp, input_size, prepare_input
from .runner import MaskedGameRunner, generate_ground_truth
from .subgame import solve_subgames
from . import real_data
from .train import TrainConfig, load_checkpoint, save_checkpoint, train

__all__ = [
    "MODES",
    "MODE_PARAMETERS_N4",
    "MODE_PARAMETERS_N10",
    "mask_computation",
    "DataLoader",
    "Example",
    "Scenario",
    "batch_arrays",
    "generate_scenarios",
    "load_all_json_data",
    "load_example",
    "save_example",
    "evaluate_modes",
    "evaluate_scenario",
    "build_masked_parametric_game",
    "pack_masked_theta",
    "setup_real_environment",
    "setup_real_game",
    "setup_road_environment",
    "setup_trajectory_game",
    "clamp_cotangent",
    "composite_loss",
    "MLPParams",
    "apply_mlp",
    "init_mlp",
    "input_size",
    "prepare_input",
    "MaskedGameRunner",
    "solve_subgames",
    "real_data",
    "generate_ground_truth",
    "TrainConfig",
    "load_checkpoint",
    "save_checkpoint",
    "train",
]
