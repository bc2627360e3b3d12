"""Analysis-layer tests: metrics, plots, and the experiment harnesses."""

import json
import os

import jax.numpy as jnp
import numpy as np

from mcp_tpu.analysis import (
    analyze_result,
    loss_curves_plot,
    loss_landscape_plot,
    mask_loss_landscape,
    mask_sum,
    n_scaling_experiment,
    radar_plot,
    rate,
    safety,
    time_scaling_plot,
    trajectory_length,
    trajectory_similarity,
    trajectory_smoothness,
)


class TestMetrics:
    def straight_traj(self, n=5):
        return np.stack([np.arange(n, dtype=float), np.zeros(n)], axis=1)

    def test_similarity(self):
        t = self.straight_traj()
        shifted = t + np.array([0.0, 1.0])
        assert trajectory_similarity(t, t) == 0.0
        assert trajectory_similarity(t, shifted) == 1.0

    def test_smoothness_straight_line_is_zero(self):
        assert trajectory_smoothness(self.straight_traj()) == 0.0

    def test_length(self):
        assert trajectory_length(self.straight_traj(5)) == 4.0

    def test_safety(self):
        trajs = {1: self.straight_traj(), 2: self.straight_traj() + [0.0, 3.0]}
        assert safety(trajs) == 3.0

    def test_mask_metrics(self):
        masks = [np.array([1.0, 1.0, 0.0]), np.array([1.0, 0.0, 0.0])]
        assert mask_sum(masks) == 1.5
        np.testing.assert_allclose(rate(masks), 0.5 * (1 / 8 + 1 / 1))

    def test_analyze_result(self):
        result = {
            "Player 1 Trajectory": self.straight_traj().tolist(),
            "Player 2 Trajectory": (self.straight_traj() + [0, 2.0]).tolist(),
            "Player 1 Mask": [[1.0, 1.0]] * 5,
        }
        m = analyze_result(result, num_players=2)
        assert set(m) == {"Smoothness", "Length", "Safety", "Mask Sum", "Rate"}
        assert m["Safety"] == 2.0


class TestPlots:
    def test_radar_and_curves(self, tmp_path):
        metrics = {
            "All [1]": {"Smoothness": 0.1, "Length": 5.0, "Safety": 2.0},
            "NN [2]": {"Smoothness": 0.2, "Length": 4.0, "Safety": 1.5},
        }
        radar_plot(metrics, str(tmp_path / "radar.png"))
        time_scaling_plot([2, 3, 4], [0.1, 0.4, 1.0], str(tmp_path / "time.png"))
        loss_curves_plot({"train_loss": [1.0, 0.5]}, str(tmp_path / "loss.png"))
        loss_landscape_plot(
            np.linspace(0, 1, 3)[None, :].repeat(3, 0),
            np.linspace(0, 1, 3)[:, None].repeat(3, 1),
            np.ones((3, 3)),
            str(tmp_path / "landscape.png"),
        )
        for name in ("radar.png", "time.png", "loss.png", "landscape.png"):
            assert os.path.getsize(tmp_path / name) > 1000


class TestExperiments:
    def test_n_scaling_small(self):
        results = n_scaling_experiment(
            (2, 3), horizon=3, batch=1, repeats=1, verbose=False
        )
        assert set(results) == {2, 3}
        assert all(v > 0 for v in results.values())

    def test_mask_loss_landscape(self):
        from mcp_tpu.selection import (
            MaskedGameRunner,
            setup_road_environment,
            setup_trajectory_game,
        )

        N, T = 3, 3
        env = setup_road_environment(length=10.0)
        game = setup_trajectory_game(environment=env, N=N)
        runner = MaskedGameRunner.create(game, N=N, horizon=T)
        init = jnp.asarray(
            [[-1.0, 0, 0, 0], [1.0, 0, 0, 0], [0.0, 1.5, 0, 0]], jnp.float32
        )
        goals = jnp.asarray([[1.0, 0], [-1.0, 0], [0.0, -1.5]], jnp.float32)
        target = jnp.zeros((T, 4), jnp.float32)
        out = mask_loss_landscape(
            runner, init, goals, target, grid_points=3, input_horizon=2
        )
        assert out["losses"].shape == (3, 3)
        assert np.isfinite(out["losses"]).all()
