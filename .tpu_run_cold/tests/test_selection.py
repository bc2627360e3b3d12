"""Selection-layer tests: masked games, data pipeline, solver-in-the-loop
training step, heuristic baselines, and closed-loop evaluation — on tiny
(N=2, short-horizon) games so the whole pipeline runs in seconds on CPU."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcp_tpu.selection import (
    DataLoader,
    MaskedGameRunner,
    TrainConfig,
    apply_mlp,
    generate_ground_truth,
    generate_scenarios,
    init_mlp,
    input_size,
    load_all_json_data,
    load_checkpoint,
    mask_computation,
    setup_road_environment,
    setup_trajectory_game,
    train,
)
from mcp_tpu.selection.evaluate import evaluate_scenario
from mcp_tpu.selection.loss import clamp_cotangent

N, HORIZON = 2, 4


@pytest.fixture(scope="module")
def runner():
    env = setup_road_environment(length=10.0)
    game = setup_trajectory_game(environment=env, N=N)
    return MaskedGameRunner.create(game, N=N, horizon=HORIZON)


@pytest.fixture(scope="module")
def dataset(runner, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("gt"))
    scenarios = generate_scenarios(
        num_scenarios=6, num_players=N, arena_half_width=3.0, seed=0
    )
    examples = generate_ground_truth(runner, scenarios, out)
    return out, scenarios, examples


class TestMaskedGame:
    def test_masked_solve_batch(self, runner):
        init = jnp.asarray(
            [[[-1.0, 0.0, 0.0, 0.0], [1.0, 0.0, 0.0, 0.0]]], dtype=jnp.float32
        )
        goals = jnp.asarray([[[1.0, 0.0], [-1.0, 0.0]]], dtype=jnp.float32)
        masks = jnp.ones((1, N), dtype=jnp.float32)
        bs = runner.solve(init, goals, masks)
        assert int(bs.result.status[0]) == 0
        assert bs.trajectories.shape == (1, N, HORIZON, 4)
        # players move toward their goals
        assert float(bs.trajectories[0, 0, -1, 0]) > -1.0
        assert float(bs.trajectories[0, 1, -1, 0]) < 1.0

    def test_mask_zero_decouples(self, runner):
        """mask=0 removes the interaction cost: the solution matches a game
        where the other player is ignored (the reference's soft-removal trick,
        train_and_test_utils.jl:366-369)."""
        init = jnp.asarray(
            [[[-1.0, 0.0, 0.0, 0.0], [-0.4, 0.3, 0.0, 0.0]]], dtype=jnp.float32
        )
        goals = jnp.asarray([[[1.0, 0.0], [1.0, 0.6]]], dtype=jnp.float32)
        masked = runner.solve(
            init, goals, jnp.asarray([[1.0, 0.0]], dtype=jnp.float32)
        )
        unmasked = runner.solve(init, goals, jnp.ones((1, N), jnp.float32))
        # masked ego ignores the nearby player → different plan
        assert (
            float(
                jnp.max(
                    jnp.abs(masked.trajectories[0, 0] - unmasked.trajectories[0, 0])
                )
            )
            > 1e-4
        )


class TestDataPipeline:
    def test_ground_truth_and_loading(self, dataset):
        out, scenarios, examples = dataset
        assert len(examples) >= 4  # most scenarios converge
        loaded = load_all_json_data(out)
        assert len(loaded) == len(examples)
        ex = loaded[0]
        assert ex.trajectories.shape == (N, HORIZON, 4)
        assert ex.mask.tolist() == [1.0] * N

    def test_dataloader(self, dataset):
        _, _, examples = dataset
        loader = DataLoader(examples, batch_size=2)
        batches = list(loader)
        assert sum(len(b) for b in batches) == len(examples)


class TestTraining:
    def test_train_two_epochs(self, runner, dataset, tmp_path):
        _, _, examples = dataset
        config = TrainConfig(
            num_players=N,
            horizon=HORIZON,
            input_horizon=2,
            input_state_dim=2,
            batch_size=2,
            epochs=2,
            learning_rate=0.01,
            patience=5,
        )
        params, history = train(
            runner,
            examples[:2],
            examples[4:5],
            config=config,
            log_dir=str(tmp_path / "run"),
            verbose=False,
        )
        assert len(history["train_loss"]) == 2
        assert np.isfinite(history["train_loss"]).all()
        # checkpoints written and loadable
        best, payload = load_checkpoint(str(tmp_path / "run" / "trained_model.pkl"))
        assert payload["config"]["num_players"] == N
        assert os.path.exists(str(tmp_path / "run" / "metrics.jsonl"))

    def test_clamp_cotangent(self):
        g = jax.grad(lambda x: jnp.sum(clamp_cotangent(x) * 1000.0))(jnp.ones(3))
        np.testing.assert_allclose(g, [10.0, 10.0, 10.0])


class TestBaselines:
    def make_history(self):
        # 2 sim steps of history for 3 players: ego at origin, one near, one far
        t1 = [
            np.array([0.0, 0.0, 1.0, 0.0, 0.1, 0.1, 1.0, 0.0]),  # ego
            np.array([1.0, 0.0, 0.0, 0.0, 0.9, 0.0, 0.0, 0.0]),  # near
            np.array([5.0, 5.0, 0.0, 0.0, 5.0, 5.0, 0.0, 0.0]),  # far
        ]
        controls = [np.zeros(2), np.array([0.5, 0.0]), np.zeros(2)]
        return t1, controls

    def test_masks_from_ground_truth_dump(self, tmp_path):
        """baseline.jl port: distance-threshold + k-NN masks off a dump's
        first step (reference examples/baseline.jl:21-58)."""
        import json

        from mcp_tpu.selection.baselines import masks_from_ground_truth_dump

        # 4 players: ego at origin, one near (d=1), two far (d=10, 20).
        traj = np.zeros((4, 3, 4))
        traj[1, 0, :2] = [1.0, 0.0]
        traj[2, 0, :2] = [10.0, 0.0]
        traj[3, 0, :2] = [0.0, 20.0]
        traj[:, 1:, :2] = 99.0  # later steps must be ignored (first-step only)
        p = tmp_path / "simulation_results_0.json"
        p.write_text(
            json.dumps({"trajectories": traj.tolist(), "ego_index": 0})
        )
        out = masks_from_ground_truth_dump(str(p), threshold=4.0, num_neighbors=2)
        np.testing.assert_array_equal(out["distance_threshold"], [1, 1, 0, 0])
        # k-NN with num_neighbors=2: ego's own zero distance consumes one
        # pick (the reference's loop quirk), so ego + nearest other.
        np.testing.assert_array_equal(out["nearest_neighbors"], [1, 1, 0, 0])

    def test_all_mode(self):
        traj, ctrl = self.make_history()
        assert mask_computation(None, traj, ctrl, "All", 1, 1).tolist() == [1.0, 1.0]

    def test_distance_threshold(self):
        traj, ctrl = self.make_history()
        mask = mask_computation(None, traj, ctrl, "Distance Threshold", 2, 2.0)
        assert mask.tolist() == [1.0, 0.0]

    def test_nearest_neighbor_selects_k_minus_1(self):
        traj, ctrl = self.make_history()
        mask = mask_computation(None, traj, ctrl, "Nearest Neighbor", 2, 2)
        # reference quirk: parameter k selects k-1 players
        assert mask.sum() == 1.0 and mask[0] == 1.0

    def test_dynamic_modes_run(self):
        traj, ctrl = self.make_history()
        for mode in (
            "Jacobian",
            "Hessian",
            "Cost Evolution",
            "Barrier Function",
            "Control Barrier Function",
        ):
            mask = mask_computation(None, traj, ctrl, mode, 2, 2)
            assert mask.shape == (2,)
            assert set(np.unique(mask)) <= {0.0, 1.0}

    def test_nn_modes_bootstrap_and_predict(self):
        traj, ctrl = self.make_history()
        model = lambda x: np.array([0.9, 0.1])
        early = mask_computation(
            np.zeros(12), traj, ctrl, "Neural Network Threshold", 5, 0.5, model=model
        )
        late = mask_computation(
            np.zeros(12), traj, ctrl, "Neural Network Threshold", 11, 0.5, model=model
        )
        assert early.tolist() == [1.0, 0.0]  # distance bootstrap
        assert late.tolist() == [1.0, 0.0]  # thresholded NN scores


class TestClosedLoopEvaluation:
    def test_evaluate_scenario(self, runner):
        scenarios = generate_scenarios(
            num_scenarios=1, num_players=N, arena_half_width=3.0, seed=1
        )
        result = evaluate_scenario(
            runner,
            scenarios[0],
            "Distance Threshold",
            2.0,
            num_sim_steps=3,
            input_horizon=2,
        )
        assert len(result["Player 1 Trajectory"]) == 4  # init + 3 steps
        assert len(result["Player 1 Mask"]) == 3
        assert all(s == 0 for s in result["Statuses"])

    def test_batched_matches_serial(self, runner):
        """The batched sweep (one solve per sim step over all scenarios)
        reproduces the scenario-serial rollouts, including variable-length
        trimming and per-scenario warm-start tracking."""
        from mcp_tpu.selection.evaluate import evaluate_scenarios_batched

        scenarios = generate_scenarios(
            num_scenarios=3, num_players=N, arena_half_width=3.0, seed=2
        )
        # Variable lengths: scenario 1 stops after 2 steps.
        scenarios = [
            scenarios[0],
            scenarios[1]._replace(sim_steps=2),
            scenarios[2],
        ]
        batched = evaluate_scenarios_batched(
            runner, scenarios, "Distance Threshold", 2.0,
            num_sim_steps=4, input_horizon=2,
        )
        for scenario, res in zip(scenarios, batched):
            steps = scenario.sim_steps or 4
            assert len(res["Player 1 Trajectory"]) == steps + 1
            assert len(res["Player 1 Mask"]) == steps
            serial = evaluate_scenario(
                runner, scenario, "Distance Threshold", 2.0,
                num_sim_steps=steps, input_horizon=2,
            )
            assert res["Statuses"] == serial["Statuses"]
            assert res["Player 1 Mask"] == serial["Player 1 Mask"]
            np.testing.assert_allclose(
                np.asarray(res["Player 1 Trajectory"]),
                np.asarray(serial["Player 1 Trajectory"]),
                atol=2e-4,
            )

    def test_evaluate_modes_batched_writes_files(self, runner, tmp_path):
        from mcp_tpu.selection.evaluate import evaluate_modes

        scenarios = generate_scenarios(
            num_scenarios=2, num_players=N, arena_half_width=3.0, seed=3
        )
        evaluate_modes(
            runner,
            scenarios,
            {"All": [1]},
            str(tmp_path),
            num_sim_steps=2,
            input_horizon=2,
            verbose=False,
        )
        import json

        for sid in (0, 1):
            path = tmp_path / f"receding_horizon_trajectories_[{sid}]_[All]_[1].json"
            assert path.exists()
            result = json.loads(path.read_text())
            assert len(result["Player 1 Trajectory"]) == 3
