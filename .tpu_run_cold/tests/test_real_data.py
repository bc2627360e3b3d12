"""Real-pedestrian-data path: converter, fixtures, and the end-to-end
evaluation sweep with variable-length trimming (reference
examples/test_real_data.jl:135-209)."""

import json
import os

import jax
import numpy as np
import pytest

from mcp_tpu.selection.data import Scenario
from mcp_tpu.selection.model import init_mlp, input_size
from mcp_tpu.selection.real_data import (
    REAL_BOUNDS,
    convert_raw_csv,
    convert_recording,
    evaluate_real_scenarios,
    load_scenario_csv,
    load_scenario_dir,
    make_real_runner,
    save_scenario_csv,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "ped")


class TestConverter:
    def test_convert_recording_states_and_length(self):
        # Straight-line walk: velocity = (p1 - p0)/dt, goal = last frame.
        steps, N, dt = 6, 3, 0.1
        base = np.arange(steps, dtype=float)[:, None, None]
        offsets = np.arange(N, dtype=float)[None, :, None] * 2.0
        positions = base * np.array([0.13, 0.0]) + offsets + np.array([20.0, 5.0])
        s = convert_recording(positions, dt=dt)
        assert s.sim_steps == steps
        np.testing.assert_allclose(s.initial_states[:, :2], positions[0])
        np.testing.assert_allclose(s.initial_states[:, 2:], [[1.3, 0.0]] * N)
        np.testing.assert_allclose(s.goals, positions[-1])

    def test_convert_recording_validates(self):
        with pytest.raises(ValueError):
            convert_recording(np.zeros((1, 2, 2)))
        with pytest.raises(ValueError):
            convert_recording(np.zeros((5, 2, 3)))

    def test_csv_roundtrip(self, tmp_path):
        s = Scenario(
            initial_states=np.array([[20.0, 5.0, 1.0, 0.0], [22.0, 6.0, -1.0, 0.5]]),
            goals=np.array([[25.0, 5.0], [18.0, 7.0]]),
            sim_steps=17,
        )
        path = tmp_path / "scenario.csv"
        save_scenario_csv(s, str(path))
        loaded = load_scenario_csv(str(path))
        np.testing.assert_allclose(loaded.initial_states, s.initial_states)
        np.testing.assert_allclose(loaded.goals, s.goals)
        assert loaded.sim_steps == 17

    def test_raw_csv_conversion_drops_partial_agents(self, tmp_path):
        raw = tmp_path / "raw.csv"
        lines = ["frame,agent_id,x,y"]
        for frame in range(4):
            lines.append(f"{frame},0,{20.0 + 0.1 * frame},5.0")
            lines.append(f"{frame},1,{22.0 - 0.1 * frame},6.0")
            if frame >= 2:  # agent 2 enters late -> must be dropped
                lines.append(f"{frame},2,21.0,7.0")
        raw.write_text("\n".join(lines))
        s = convert_raw_csv(str(raw), dt=0.1)
        assert s.initial_states.shape == (2, 4)
        assert s.sim_steps == 4


class TestFixtures:
    def test_committed_fixtures_load(self):
        scenarios = load_scenario_dir(FIXTURES)
        assert len(scenarios) == 3
        lengths = sorted(s.sim_steps for s in scenarios)
        assert lengths == [18, 22, 30]  # variable-length recordings
        for s in scenarios:
            assert s.initial_states.shape[1] == 4
            assert s.goals.shape[1] == 2
            # Inside the reference real-data bounds.
            assert (s.initial_states[:, 0] >= REAL_BOUNDS["xmin"] - 1).all()
            assert (s.initial_states[:, 0] <= REAL_BOUNDS["xmax"] + 1).all()
            # Pedestrian-plausible speeds.
            speeds = np.linalg.norm(s.initial_states[:, 2:], axis=1)
            assert (speeds > 0.5).all() and (speeds < 2.5).all()

    def test_fixtures_match_raw_conversion(self, tmp_path):
        converted = convert_raw_csv(
            os.path.join(FIXTURES, "raw", "scenario1.csv"), dt=0.1
        )
        committed = load_scenario_csv(os.path.join(FIXTURES, "scenario1.csv"))
        np.testing.assert_allclose(
            converted.initial_states, committed.initial_states, atol=1e-3
        )
        assert converted.sim_steps == committed.sim_steps


class TestEvaluateRealScenarios:
    def test_end_to_end_sweep_with_variable_lengths(self, tmp_path):
        """Heuristic + Partial-NN modes through the real-game runner; one
        scenario long enough (12 steps) for the NN to engage at step 11
        (mask_computation's <=10 Distance fallback), one short (4 steps) to
        prove per-scenario trimming."""
        N, ih = 3, 10
        # Tiny crossing recordings inside the real bounds.
        t_long = np.linspace(0, 1, 13)[:, None, None]
        starts = np.array([[20.0, 8.0], [23.0, 10.0], [21.5, 12.0]])
        goals = np.array([[23.0, 12.0], [20.5, 8.5], [21.5, 6.0]])
        walk = starts[None] + t_long * (goals - starts)[None]
        s_long = convert_recording(walk, dt=0.1)  # sim_steps=13... trim below
        s_long = s_long._replace(sim_steps=12)
        s_short = convert_recording(walk[:5], dt=0.1)  # sim_steps=5
        s_short = s_short._replace(sim_steps=4)

        params = init_mlp(
            jax.random.PRNGKey(0), input_size(N, ih, 2), num_players=N
        )
        # One mode per scenario length keeps the test at ~16 closed-loop
        # solves: the NN mode needs >10 steps to engage (long scenario);
        # the heuristic covers the short one (the batched-vs-serial parity
        # test elsewhere covers mixing lengths inside one sweep).
        out_dir = tmp_path / "ped_eval"
        evaluate_real_scenarios(
            [s_long],
            {"Neural Network Partial Threshold": [0.5]},
            str(out_dir),
            N=N,
            horizon=3,
            num_sim_steps=99,  # must be overridden by each scenario's length
            model_params=params,
            input_horizon=ih,
            verbose=False,
        )
        evaluate_real_scenarios(
            [s_short],
            {"Distance Threshold": [2.0]},
            str(out_dir),
            N=N,
            horizon=3,
            num_sim_steps=99,
            input_horizon=ih,
            scenario_offset=1,
            verbose=False,
        )
        for sid, expected_steps, mode, param in (
            (0, 12, "Neural Network Partial Threshold", 0.5),
            (1, 4, "Distance Threshold", 2.0),
        ):
            path = out_dir / f"trajectories_[{sid}]_[{mode}]_[{param}].json"
            assert path.exists(), path
            result = json.loads(path.read_text())
            # One closed-loop state per sim step + the initial state.
            assert len(result["Player 1 Trajectory"]) == expected_steps + 1
            assert len(result["Player 1 Mask"]) == expected_steps
            assert all(m[0] == 1.0 for m in result["Player 1 Mask"])
        # The long scenario's NN mode actually reached the NN branch: its
        # mask at steps 11+ is thresholded NN output, which for a random
        # net is not guaranteed to equal the distance mask; just check the
        # rollout stayed finite and solved.
        result = json.loads(
            (out_dir / "trajectories_[0]_[Neural Network Partial Threshold]_[0.5].json").read_text()
        )
        assert np.isfinite(np.asarray(result["Player 1 Trajectory"])).all()
        assert any(st == 0 for st in result["Statuses"])


def test_make_real_runner_smoke():
    runner = make_real_runner(N=3, horizon=3)
    assert runner.N == 3
