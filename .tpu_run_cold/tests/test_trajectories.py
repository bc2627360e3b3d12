"""Trajectory-layer tests: dynamics, environments, packing, and the
lane-change game end-to-end (reference examples/lane_change.jl — the
reference itself has no tests for this layer; SURVEY.md §4 calls for adding
them)."""

import jax.numpy as jnp
import numpy as np

import mcp_tpu
from mcp_tpu.trajectories import (
    PolygonEnvironment,
    ProductDynamics,
    box_constraint_fn,
    pack_parameters,
    pack_trajectory,
    planar_double_integrator,
    rollout,
    unpack_parameters,
    unpack_trajectory,
    zero_input_trajectory,
)
from mcp_tpu.examples.lane_change import (
    build_lane_change_game,
    run_lane_change_example,
    setup_road_environment,
)


class TestDynamics:
    def test_double_integrator_discretization(self):
        dyn = planar_double_integrator()
        x = jnp.array([0.0, 0.0, 1.0, 2.0])
        u = jnp.array([1.0, -1.0])
        x1 = dyn(x, u)
        # dt = 0.1: p += v dt + 0.5 a dt², v += a dt
        np.testing.assert_allclose(x1, [0.105, 0.195, 1.1, 1.9], atol=1e-12)

    def test_product_dynamics(self):
        dyn = ProductDynamics([planar_double_integrator()] * 2)
        assert dyn.state_dim() == 8 and dyn.control_dim() == 4
        assert dyn.state_dim(1) == 4 and dyn.control_dim(0) == 2
        x = jnp.arange(8.0)
        u = jnp.zeros(4)
        x1 = dyn(x, u)
        sub = planar_double_integrator()
        np.testing.assert_allclose(x1[:4], sub(x[:4], u[:2]))
        np.testing.assert_allclose(x1[4:], sub(x[4:], u[2:]))


class TestEnvironment:
    def test_polygon_halfspaces(self):
        env = PolygonEnvironment.from_vertices(
            [[0.0, 0.0], [4.0, 0.0], [4.0, 50.0], [0.0, 50.0]]
        )
        inside = env.position_constraints(jnp.array([2.0, 25.0]))
        assert np.all(np.asarray(inside) > 0)
        outside = env.position_constraints(jnp.array([5.0, 25.0]))
        assert np.any(np.asarray(outside) < 0)
        # Distance semantics: unit normals → residual = distance to edge.
        np.testing.assert_allclose(
            np.sort(np.asarray(inside)), [2.0, 2.0, 25.0, 25.0], atol=1e-12
        )

    def test_road_environment(self):
        road = setup_road_environment(lane_width=2, num_lanes=2, height=50)
        assert road.lane_centers == (1.0, 3.0)
        assert road.environment.contains([1.0, 25.0])
        assert not road.environment.contains([-1.0, 25.0])

    def test_box_constraints_ordering(self):
        f = box_constraint_fn([-np.inf, -10.0], [5.0, np.inf])
        # finite-lb rows first, then finite-ub rows
        np.testing.assert_allclose(f(jnp.array([1.0, 2.0])), [12.0, 4.0])
        assert f.num_constraints == 2


class TestPacking:
    def test_roundtrip(self):
        dyn = ProductDynamics([planar_double_integrator()] * 2)
        T = 5
        flat = [
            jnp.arange(T * 6, dtype=jnp.float64),
            100 + jnp.arange(T * 6, dtype=jnp.float64),
        ]
        trajs = unpack_trajectory(flat, dynamics=dyn, horizon=T)
        assert trajs[0].xs.shape == (T, 4) and trajs[0].us.shape == (T, 2)
        # time-major layout parity with the reference's column-major reshape
        np.testing.assert_allclose(trajs[0].xs[1], [4.0, 5.0, 6.0, 7.0])
        repacked = pack_trajectory(trajs)
        for a, b in zip(repacked, flat):
            np.testing.assert_allclose(a, b)

    def test_parameters_roundtrip(self):
        dyn = ProductDynamics([planar_double_integrator()] * 2)
        x0 = [jnp.array([1.0, 2, 3, 4]), jnp.array([5.0, 6, 7, 8])]
        extra = [jnp.array([9.0]), jnp.array([10.0])]
        theta = pack_parameters(x0, extra)
        assert theta[0].shape == (5,)
        init, other = unpack_parameters(theta, dynamics=dyn)
        np.testing.assert_allclose(init[0], x0[0])
        np.testing.assert_allclose(other[1], extra[1])


class TestLaneChangeGame:
    def test_game_dimensions(self):
        _, pg, _ = build_lane_change_game(horizon=10)
        # 2 players × T(4+2)=60 primals; shared eq = 8 + 9·8 = 80;
        # shared ineq = 10 coupling + 80 env + 80 control box + 80 state box.
        assert pg.dims.x == (60, 60)
        assert pg.dims.shared_lam == 80
        assert pg.dims.shared_mu == 250
        assert pg.mcp.unconstrained_dimension == 200
        assert pg.mcp.constrained_dimension == 250

    def test_lane_change_solves_and_respects_constraints(self):
        game, pg, road = build_lane_change_game(horizon=10)
        initial_state = jnp.array([1.0, 1.0, 0.0, 1.0, 3.2, 0.9, 0.0, 1.0])
        state_blocks = game.dynamics.state_blocking.split(initial_state)
        theta = pack_parameters(state_blocks, [jnp.array([1.0]), jnp.array([1.0])])
        from mcp_tpu.trajectories import solve_trajectory_game

        strategy, sol = solve_trajectory_game(
            game, 10, theta, parametric_game=pg
        )
        assert int(sol.status) == mcp_tpu.SOLVED
        trajs = unpack_trajectory(sol.primals, dynamics=game.dynamics, horizon=10)
        # initial-state pin
        np.testing.assert_allclose(trajs[0].xs[0], initial_state[:4], atol=1e-2)
        # dynamics defects small
        for tr, sub in zip(trajs, game.dynamics.subsystems):
            pred = jnp.stack([sub(tr.xs[t], tr.us[t]) for t in range(9)])
            np.testing.assert_allclose(pred, tr.xs[1:], atol=1e-2)
        # collision constraint: ≥ 2 m separation (allow IP slack)
        d = np.linalg.norm(
            np.asarray(trajs[0].xs[:, :2]) - np.asarray(trajs[1].xs[:, :2]), axis=1
        )
        assert d.min() >= 2.0 - 1e-2

    def test_receding_horizon_rollout(self):
        sim, strat = run_lane_change_example(num_sim_steps=4, turn_length=2, horizon=10)
        assert all(s == mcp_tpu.SOLVED for s in sim.infos)
        assert sim.xs.shape == (4, 8)
        # warm start kept across re-plans
        assert strat.last_solution is not None

    def test_zero_input_trajectory_seed(self):
        game, _, _ = build_lane_change_game(horizon=10)
        x0 = jnp.array([1.0, 1.0, 0.0, 1.0, 3.0, 1.0, 0.0, 1.0])
        trajs = zero_input_trajectory(game=game, horizon=10, initial_state=x0)
        assert all(np.allclose(t.us, 0) for t in trajs)
        np.testing.assert_allclose(trajs[0].xs[0], x0[:4])
        # constant velocity drift under zero input
        np.testing.assert_allclose(trajs[0].xs[-1][:2], [1.0, 1.0 + 0.9], atol=1e-12)
