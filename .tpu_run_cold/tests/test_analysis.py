"""Analysis-layer tests: metrics, plots, and the experiment harnesses."""

import json
import os

import jax.numpy as jnp
import numpy as np

from mcp_tpu.analysis import (
    RADAR_PRESETS,
    RadarPreset,
    analyze_result,
    collect_mode_metrics,
    loss_curves_plot,
    loss_landscape_plot,
    mask_loss_landscape,
    mask_sum,
    n_scaling_experiment,
    paper_trajectory_grid,
    radar_plot,
    radar_plot_anchored,
    radar_report,
    rate,
    safety,
    time_scaling_plot,
    trajectory_length,
    trajectory_similarity,
    trajectory_smoothness,
)
from mcp_tpu.analysis.plots import _legend_name, _radius


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


def _make_eval_result(num_players=4, steps=12, shift=0.0, mask_on=True):
    """Synthetic evaluation JSON in the reference's result-dict schema."""
    t = np.arange(steps, dtype=float)
    result = {}
    for pid in range(1, num_players + 1):
        traj = np.stack(
            [t * 0.1 + shift, np.full(steps, float(pid))] + [np.zeros(steps)] * 2,
            axis=1,
        )
        result[f"Player {pid} Trajectory"] = traj.tolist()
        result[f"Player {pid} Control"] = np.zeros((steps, 2)).tolist()
        result[f"Player {pid} Initial State"] = traj[0].tolist()
        result[f"Player {pid} Goal"] = [1.0, float(pid)]
    mask = [1.0] + [1.0 if mask_on else 0.0] * (num_players - 1)
    result["Player 1 Mask"] = [mask] * steps
    return result


class TestPaperFigures:
    """The anchored radar presets + trajectory grid (radar_plot_10.py:168-212,
    paper_vis.py:60-236)."""

    def test_radius_mapping_anchors(self):
        ticks = {"min": 0.0, "mean": 2.0, "max": 10.0}
        assert abs(_radius(0.0, ticks, invert=False)) < 1e-5
        assert abs(_radius(2.0, ticks, invert=False) - 0.7) < 1e-5
        assert abs(_radius(10.0, ticks, invert=False) - 1.0) < 1e-5
        # Inverted: min maps to 1 (best), max to 0.
        assert abs(_radius(0.0, ticks, invert=True) - 1.0) < 1e-5
        assert abs(_radius(10.0, ticks, invert=True)) < 1e-5
        assert abs(_radius(2.0, ticks, invert=True) - 0.7) < 1e-5

    def test_legend_names(self):
        assert _legend_name("Neural Network Rank [3]", keep_parameter=False) == "PSN-Full"
        assert (
            _legend_name("Neural Network Partial Threshold [0.5]", keep_parameter=True)
            == "PSN-Partial [0.5]"
        )
        assert _legend_name("Control Barrier Function [3]", keep_parameter=False) == "CBF"
        assert _legend_name("Nearest Neighbor [5]", keep_parameter=False) == "Distance"

    def test_presets_cover_reference_datasets(self):
        assert set(RADAR_PRESETS) == {"n10", "n4", "ped"}
        # Spot-check the hand-tuned anchors against the reference values.
        assert RADAR_PRESETS["n10"].tick_overrides["Length"] == (5.5, 6.5)
        assert RADAR_PRESETS["n4"].tick_overrides["Smoothness"] == (0.02, 0.08)
        assert RADAR_PRESETS["ped"].tick_overrides["Safety"] == (0.3, 1.5)
        assert RADAR_PRESETS["ped"].file_prefix == "trajectories"
        assert "ranking7" in RADAR_PRESETS["n10"].option_groups
        assert "ranking2" in RADAR_PRESETS["n4"].option_groups

    def test_radar_report_end_to_end(self, tmp_path):
        result_dir = tmp_path / "eval"
        result_dir.mkdir()
        for sid in (0, 1):
            for mode, param, on in (
                ("All", 1, True),
                ("Nearest Neighbor", 2, False),
                ("Neural Network Rank", 2, False),
            ):
                path = result_dir / f"receding_horizon_trajectories_[{sid}]_[{mode}]_[{param}].json"
                path.write_text(
                    json.dumps(_make_eval_result(shift=0.1 * sid, mask_on=on))
                )
        preset = RadarPreset(
            num_players=4,
            file_prefix="receding_horizon_trajectories",
            modes_with_params={
                "All": (1,),
                "Nearest Neighbor": (2,),
                "Neural Network Rank": (2,),
            },
            option_groups={"ranking2": frozenset({
                "All [1]", "Nearest Neighbor [2]", "Neural Network Rank [2]",
            })},
            tick_overrides={"Mask Sum": (1, 4), "Rate": (0, 1)},
        )
        metrics = collect_mode_metrics(
            str(result_dir),
            num_players=4,
            modes_with_params=preset.modes_with_params,
            file_prefix=preset.file_prefix,
        )
        assert set(metrics) == {"All [1]", "Nearest Neighbor [2]", "Neural Network Rank [2]"}
        assert metrics["All [1]"]["Mask Sum"] == 4.0
        assert metrics["Nearest Neighbor [2]"]["Mask Sum"] == 1.0

        written = radar_report(str(result_dir), str(tmp_path / "figs"), preset=preset)
        assert set(written) == {"ranking2"}
        assert os.path.getsize(written["ranking2"]) > 1000

        # Tick overrides beat the data range; the mean stays data-derived.
        ticks = radar_plot_anchored(
            metrics, str(tmp_path / "radar2.pdf"), tick_overrides={"Mask Sum": (1, 4)}
        )
        assert ticks["Mask Sum"]["min"] == 1.0 and ticks["Mask Sum"]["max"] == 4.0
        assert 1.0 < ticks["Mask Sum"]["mean"] < 4.0

    def test_paper_trajectory_grid(self, tmp_path):
        results = [_make_eval_result(mask_on=True), _make_eval_result(mask_on=False)]
        out = tmp_path / "grid.pdf"
        paper_trajectory_grid(
            results, ["All", "NN Rank"], str(out), step_indices=(3, 6, 9),
            step_dt=0.1,
        )
        assert os.path.getsize(out) > 1000

    def test_radar_report_on_demo_eval(self, tmp_path):
        demo = os.path.join(os.path.dirname(__file__), "..", "demo", "eval")
        if not os.path.isdir(demo):
            import pytest

            pytest.skip("demo/eval not present")
        written = radar_report(demo, str(tmp_path), preset="n4")
        assert written and all(os.path.getsize(p) > 1000 for p in written.values())


class TestExperiments:
    def test_n_scaling_small(self):
        # One N exercises the whole harness (game build + timed solve);
        # the N-sweep itself is the production experiment, not the test.
        results = n_scaling_experiment((2,), horizon=3, batch=1, repeats=1, verbose=False)
        assert set(results) == {2}
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
