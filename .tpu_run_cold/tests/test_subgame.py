"""Subgame decomposition by hard mask (selection/subgame.py — the
counterpart of reference masked_game_solver.jl:92-223)."""

import numpy as np

from mcp_tpu.selection.subgame import solve_subgames


class TestSubgameDecomposition:
    def test_decomposition_shapes_and_keys(self):
        N = 3
        rng = np.random.default_rng(0)
        init = np.zeros((N, 4), np.float32)
        init[:, 0] = [1.0, 3.0, 5.0]
        init[:, 1] = [1.0, 2.0, 3.0]
        goals = np.array([[5.0, 3.0], [2.0, 1.0], [6.0, 2.0]], np.float32)
        mask = np.array([1, 0, 1])
        steps = 3
        out = solve_subgames(
            init, goals, mask, horizon=3, num_sim_steps=steps, arena_length=7.0
        )
        assert out["Mask"] == [1, 0, 1]
        for i in range(N):
            traj = np.asarray(out[f"Player {i + 1} Trajectory"])
            ctrl = np.asarray(out[f"Player {i + 1} Control"])
            assert traj.shape == (steps + 1, 4)
            assert ctrl.shape == (steps, 2)
            # Trajectory starts at the initial state.
            np.testing.assert_allclose(traj[0], init[i], atol=1e-5)
            assert np.isfinite(traj).all() and np.isfinite(ctrl).all()

    def test_unselected_players_ignore_others(self):
        """An unselected player's solo trajectory must not depend on the
        other players (it is a 1-player optimal-control problem)."""
        init = np.zeros((2, 4), np.float32)
        init[:, 0] = [1.0, 5.0]
        init[:, 1] = [1.0, 3.0]
        goals = np.array([[5.0, 3.0], [2.0, 1.0]], np.float32)
        out_a = solve_subgames(
            init, goals, np.array([1, 0]), horizon=3, num_sim_steps=2
        )
        # Move player 1 (selected); player 2 (unselected, solo) unchanged.
        init_b = init.copy()
        init_b[0, :2] = [2.0, 2.0]
        out_b = solve_subgames(
            init_b, goals, np.array([1, 0]), horizon=3, num_sim_steps=2
        )
        np.testing.assert_allclose(
            np.asarray(out_a["Player 2 Trajectory"]),
            np.asarray(out_b["Player 2 Trajectory"]),
            atol=1e-6,
        )
