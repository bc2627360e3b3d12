"""Two-player lane-change trajectory game (reference examples/lane_change.jl).

Two planar double integrators on a two-lane road; each player tracks a lane
preference (its per-player parameter), a nominal forward speed, and penalizes
effort; players must stay ≥ 2 m apart (squared-distance ≥ 4 coupling rows).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..games import ParametricGame
from ..solver import SolverOptions
from ..trajectories import (
    PolygonEnvironment,
    ProductDynamics,
    TimeSeparableTrajectoryGameCost,
    TrajectoryGame,
    WarmStartRecedingHorizonStrategy,
    build_parametric_game,
    mean_reducer,
    planar_double_integrator,
    rollout,
)

Array = jax.Array


class RoadEnvironment(NamedTuple):
    lane_centers: tuple[float, ...]
    environment: PolygonEnvironment


def setup_road_environment(
    *, lane_width: float = 2.0, num_lanes: int = 2, height: float = 50.0
) -> RoadEnvironment:
    """Rectangular road polygon with lane centers (lane_change.jl:2-12)."""
    lane_centers = tuple((i + 0.5) * lane_width for i in range(num_lanes))
    lo = lane_centers[0] - 0.5 * lane_width
    hi = lane_centers[-1] + 0.5 * lane_width
    vertices = [[lo, 0.0], [hi, 0.0], [hi, height], [lo, height]]
    return RoadEnvironment(
        lane_centers=lane_centers,
        environment=PolygonEnvironment.from_vertices(vertices),
    )


def setup_trajectory_game(
    *, environment: PolygonEnvironment, state_bounds=None
) -> TrajectoryGame:
    """Costs, collision coupling, and bounded double-integrator dynamics
    (lane_change.jl:15-55). ``state_bounds`` overrides the fork's ±10 m/s
    velocity box (the pre-fork origin demo used ±5/0..5,
    lane_change_origin.jl:62)."""

    def make_stage_cost(i):
        def stage_cost(xs, us, t, theta_i):
            lane_preference = theta_i[-1]
            x_i, u_i = xs[i], us[i]
            return (
                (x_i[0] - lane_preference) ** 2
                + 0.5 * jnp.sum((x_i[2:4] - jnp.array([0.0, 2.0], x_i.dtype)) ** 2)
                + 0.1 * jnp.sum(u_i**2)
            )

        return stage_cost

    cost = TimeSeparableTrajectoryGameCost(
        stage_costs=[make_stage_cost(i) for i in range(2)],
        reducer=mean_reducer,
        discount_factor=1.0,
    )

    def coupling_constraints(xs, us, thetas):
        # ‖p₁ - p₂‖² - 4 ≥ 0 at every step (lane_change.jl:39-46).
        d = xs[0][:, :2] - xs[1][:, :2]
        return jnp.sum(d * d, axis=1) - 4.0

    if state_bounds is None:
        state_bounds = {
            "lb": [-jnp.inf, -jnp.inf, -10.0, 0.0],
            "ub": [jnp.inf, jnp.inf, 10.0, 10.0],
        }
    agent_dynamics = planar_double_integrator(
        state_bounds=state_bounds,
        control_bounds={"lb": [-5.0, -5.0], "ub": [3.0, 3.0]},
    )
    dynamics = ProductDynamics([agent_dynamics, agent_dynamics])

    return TrajectoryGame(
        dynamics=dynamics,
        cost=cost,
        env=environment,
        coupling_constraints=coupling_constraints,
    )


def build_lane_change_game(
    *, horizon: int = 10, num_lanes: int = 2, lane_width: float = 2.0,
    height: float = 50.0, state_bounds=None,
) -> tuple[TrajectoryGame, ParametricGame, RoadEnvironment]:
    road = setup_road_environment(
        lane_width=lane_width, num_lanes=num_lanes, height=height
    )
    game = setup_trajectory_game(
        environment=road.environment, state_bounds=state_bounds
    )
    parametric_game = build_parametric_game(
        game=game, horizon=horizon, params_per_player=1
    )
    return game, parametric_game, road


def run_lane_change_example(
    *,
    initial_state=None,
    horizon: int = 10,
    height: float = 50.0,
    num_lanes: int = 2,
    lane_width: float = 2.0,
    num_sim_steps: int = 10,
    turn_length: int = 2,
    options: Optional[SolverOptions] = None,
):
    """End-to-end receding-horizon lane-change demo (lane_change.jl:57-122):
    both players prefer the left lane; P2 starts in the right lane and must
    merge behind/ahead while respecting the 2 m separation."""
    game, parametric_game, road = build_lane_change_game(
        horizon=horizon, num_lanes=num_lanes, lane_width=lane_width, height=height
    )
    if initial_state is None:
        initial_state = jnp.array([1.0, 1.0, 0.0, 1.0, 3.2, 0.9, 0.0, 1.0])
    lane_preferences = [
        jnp.array([road.lane_centers[0]]),
        jnp.array([road.lane_centers[0]]),
    ]
    strategy = WarmStartRecedingHorizonStrategy(
        game=game,
        parametric_game=parametric_game,
        turn_length=turn_length,
        horizon=horizon,
        parameters=lane_preferences,
        options=options,
    )
    sim = rollout(
        game.dynamics,
        strategy,
        initial_state,
        num_sim_steps,
        get_info=lambda strat, x, t: strat.solution_status,
    )
    return sim, strategy


def run_lane_change_origin_example(
    *, num_sim_steps: int = 150, options: Optional[SolverOptions] = None
):
    """The PRE-FORK lane-change demo (reference examples/lane_change_origin.jl)
    — identical game to `run_lane_change_example` except: tighter velocity
    box (±5 m/s lateral, 0–5 m/s forward; lane_change_origin.jl:62), 150 sim
    steps with re-plan every 3 (:73, :91), and no gradient probe inside the
    receding-horizon solve (the probe is the fork's addition,
    examples/utils.jl:237-263). The debug `println`s of the original are
    deliberately not replicated."""
    game, parametric_game, road = build_lane_change_game(
        horizon=10,
        state_bounds={
            "lb": [-jnp.inf, -jnp.inf, -5.0, 0.0],
            "ub": [jnp.inf, jnp.inf, 5.0, 5.0],
        },
    )
    initial_state = jnp.array([1.0, 1.0, 0.0, 1.0, 3.2, 0.9, 0.0, 1.0])
    lane_preferences = [
        jnp.array([road.lane_centers[0]]),
        jnp.array([road.lane_centers[0]]),
    ]
    strategy = WarmStartRecedingHorizonStrategy(
        game=game,
        parametric_game=parametric_game,
        turn_length=3,
        horizon=10,
        parameters=lane_preferences,
        options=options,
    )
    sim = rollout(
        game.dynamics,
        strategy,
        initial_state,
        num_sim_steps,
        get_info=lambda strat, x, t: strat.solution_status,
    )
    return sim, strategy
