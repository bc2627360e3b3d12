"""Subgame decomposition tests (reference masked_game_solver.jl:92-223)."""

import numpy as np

from mcp_tpu.selection.subgame import solve_subgames

INIT = np.array([[-2.0, 0, 0, 0], [2.0, 0, 0, 0], [0.0, 2.0, 0, 0]])
GOALS = np.array([[2.0, 0], [-2.0, 0], [0.0, -2.0]])


class TestSubgameDecomposition:
    def test_mixed_mask(self):
        res = solve_subgames(INIT, GOALS, [1, 1, 0], horizon=3, num_sim_steps=3)
        assert res["Mask"] == [1, 1, 0]
        for p in range(3):
            tr = np.asarray(res[f"Player {p + 1} Trajectory"])
            assert tr.shape == (4, 4)  # init + 3 steps, state dim 4
            # each player moves toward its goal
            d0 = np.linalg.norm(tr[0][:2] - GOALS[p])
            d1 = np.linalg.norm(tr[-1][:2] - GOALS[p])
            assert d1 < d0

    def test_all_selected(self):
        res = solve_subgames(INIT, GOALS, [1, 1, 1], horizon=3, num_sim_steps=2)
        assert all(f"Player {p + 1} Trajectory" in res for p in range(3))

    def test_single_selected(self):
        """sum(mask) == 1: the lone selected player solves an optimal-control
        problem (masked_game_solver.jl:144-180)."""
        res = solve_subgames(INIT, GOALS, [1, 0, 0], horizon=3, num_sim_steps=2)
        tr = np.asarray(res["Player 1 Trajectory"])
        assert tr.shape == (3, 4)
