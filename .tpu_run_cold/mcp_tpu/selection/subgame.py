"""Subgame decomposition by hard mask.

Mirror of the reference's masked_game_solver.jl:92-223: given a binary
player mask, the selected players play a reduced masked_N-player game among
themselves, while every unselected player solves a solo goal-reaching
optimal-control problem — the hard-selection counterpart of the cost-level
soft masks. Runners are cached per (num_players, horizon) shape, the
compile-cache bucketing strategy for variable subgame sizes
(SURVEY.md §7.3.4).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..solver import SolverOptions
from .games import setup_road_environment, setup_trajectory_game
from .runner import MaskedGameRunner


@functools.lru_cache(maxsize=None)
def _cached_runner(n_players: int, horizon: int, arena_length: float) -> MaskedGameRunner:
    env = setup_road_environment(length=arena_length)
    game = setup_trajectory_game(environment=env, N=n_players)
    return MaskedGameRunner.create(game, N=n_players, horizon=horizon)


def _closed_loop(runner, init, goals, steps):
    """Closed-loop rollout with re-planning every step (turn_length=1)."""
    states = [np.asarray(init)]
    controls = []
    x0_warm = None
    y0_warm = None
    for _ in range(steps):
        cur = jnp.asarray(states[-1], jnp.float32)[None]
        nxt, ctrl, bs = runner.step_closed_loop(
            cur,
            jnp.asarray(goals, jnp.float32)[None],
            jnp.ones((1, runner.N), jnp.float32),
            x0=x0_warm,
            y0=y0_warm,
        )
        if int(bs.result.status[0]) == 0:
            x0_warm, y0_warm = bs.result.x, bs.result.y
        states.append(np.asarray(nxt[0]))
        controls.append(np.asarray(ctrl[0]))
    return np.stack(states), np.stack(controls)  # (T+1, N, 4), (T, N, 2)


def solve_subgames(
    initial_states: np.ndarray,  # (N, 4)
    goals: np.ndarray,  # (N, 2)
    mask: np.ndarray,  # (N,) binary; ego convention: mask[0] == 1
    *,
    horizon: int = 3,
    num_sim_steps: int = 10,
    arena_length: float = 7.0,
) -> dict:
    """Decompose and solve: selected players in one joint game, unselected
    players solo. Returns the reference's per-player results dict shape
    (masked_game_solver.jl:136-223)."""
    N = len(mask)
    mask = np.asarray(mask).astype(int)
    results = {}

    selected = np.flatnonzero(mask == 1)
    unselected = np.flatnonzero(mask == 0)

    def store(player_id, states, controls, sub_index):
        results[f"Player {player_id + 1} Initial State"] = initial_states[player_id].tolist()
        results[f"Player {player_id + 1} Goal"] = goals[player_id].tolist()
        results[f"Player {player_id + 1} Trajectory"] = states[:, sub_index, :].tolist()
        results[f"Player {player_id + 1} Control"] = controls[:, sub_index, :].tolist()

    # Solo optimal-control games for unselected players (reference wraps the
    # solo player in a 2-player "optimal-control-like" game with a dummy
    # second player; a true 1-player game is the clean equivalent).
    if len(unselected):
        solo_runner = _cached_runner(1, horizon, arena_length)
        for i in unselected:
            states, controls = _closed_loop(
                solo_runner,
                initial_states[i : i + 1],
                goals[i : i + 1],
                num_sim_steps,
            )
            store(int(i), states, controls, 0)

    # Joint reduced game among the selected players.
    if len(selected):
        sub_runner = _cached_runner(int(len(selected)), horizon, arena_length)
        states, controls = _closed_loop(
            sub_runner,
            initial_states[selected],
            goals[selected],
            num_sim_steps,
        )
        for sub_index, i in enumerate(selected):
            store(int(i), states, controls, sub_index)

    results["Mask"] = mask.tolist()
    return results
