"""Native C++ component tests (scenario generator) and real-data loading."""

import csv
import os

import numpy as np
import pytest

from mcp_tpu.native import generate_scenarios_native, native_available
from mcp_tpu.selection.data import generate_scenarios
from mcp_tpu.selection.real_data import load_scenario_csv, load_scenario_dir


class TestNativeScenarioGen:
    @pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
    def test_constraints_and_shapes(self):
        states, goals = generate_scenarios_native(
            num_scenarios=200,
            num_players=6,
            arena_half_width=4.0,
            min_separation=1.0,
            max_speed=0.5,
            seed=7,
        )
        assert states.shape == (200, 6, 4) and goals.shape == (200, 6, 2)
        d = np.linalg.norm(states[:, :, None, :2] - states[:, None, :, :2], axis=-1)
        d += np.eye(6)[None] * 1e9
        assert d.min() >= 1.0
        assert np.abs(states[:, :, 2:]).max() <= 0.5

    @pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
    def test_deterministic(self):
        a = generate_scenarios_native(
            num_scenarios=5, num_players=4, arena_half_width=3.0,
            min_separation=1.0, max_speed=0.0, seed=11,
        )
        b = generate_scenarios_native(
            num_scenarios=5, num_players=4, arena_half_width=3.0,
            min_separation=1.0, max_speed=0.0, seed=11,
        )
        np.testing.assert_array_equal(a[0], b[0])

    def test_python_fallback(self):
        scenarios = generate_scenarios(
            num_scenarios=4, num_players=3, arena_half_width=3.0, backend="python"
        )
        assert len(scenarios) == 4
        assert scenarios[0].initial_states.shape == (3, 4)

    def test_auto_backend(self):
        scenarios = generate_scenarios(
            num_scenarios=4, num_players=3, arena_half_width=3.0
        )
        assert len(scenarios) == 4


class TestRealDataLoading:
    def test_csv_roundtrip(self, tmp_path):
        rows = [
            {"x": 20.0, "y": 5.0, "vx": 0.2, "vy": 0.5, "goal_x": 24.0, "goal_y": 20.0},
            {"x": 24.0, "y": 6.0, "vx": -0.2, "vy": 0.4, "goal_x": 20.0, "goal_y": 18.0},
        ]
        p = tmp_path / "scenario_0.csv"
        with open(p, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0]))
            w.writeheader()
            w.writerows(rows)
        s = load_scenario_csv(str(p))
        assert s.initial_states.shape == (2, 4)
        np.testing.assert_allclose(s.goals[1], [20.0, 18.0])
        scenarios = load_scenario_dir(str(tmp_path))
        assert len(scenarios) == 1
