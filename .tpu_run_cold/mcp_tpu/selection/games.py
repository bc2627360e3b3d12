"""Masked N-player goal-reaching games for learned player selection.

Mirror of the reference's game definitions
(examples/train_and_test_utils.jl:340-442): per-player parameters
θᵢ = [initial-stateᵢ(4); goalᵢ(2); mask(N)] and a stage cost

    ‖pᵢ-goalᵢ‖² + ‖vᵢ‖² + 0.1‖uᵢ‖² + w·Σ_{j≠i} maskᵢ·maskⱼ / ‖pᵢ-pⱼ‖²

whose pairwise repulsion is *soft-masked at the cost level*: zeroing mask
entries removes those players' interactions — the mechanism that makes
player selection differentiable (and doubles as clean max-N padding on TPU,
SURVEY.md §7.3.4). The "real" variant carries pedestrian-dataset-fitted
bounds (:403-442).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..trajectories import (
    PolygonEnvironment,
    ProductDynamics,
    TimeSeparableTrajectoryGameCost,
    TrajectoryGame,
    build_parametric_game,
    mean_reducer,
    planar_double_integrator,
)

Array = jax.Array


def setup_road_environment(*, length: float = 10.0) -> PolygonEnvironment:
    """Square environment of side `length` centered at the origin
    (train_and_test_utils.jl:341-349)."""
    h = 0.5 * length
    return PolygonEnvironment.from_vertices(
        [[-h, -h], [h, -h], [h, h], [-h, h]]
    )


def setup_real_environment(
    *, xmin: float, xmax: float, ymin: float, ymax: float
) -> PolygonEnvironment:
    """Axis-aligned box environment (train_and_test_utils.jl:351-359)."""
    return PolygonEnvironment.from_vertices(
        [[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax]]
    )


def _masked_game(
    *,
    environment: PolygonEnvironment,
    N: int,
    goal_weight: float,
    repulsion_weight: float,
    state_bounds,
    control_bounds,
    trivial_coupling: bool = True,
) -> TrajectoryGame:
    def make_stage_cost(i):
        def stage_cost(xs, us, t, theta_i):
            # θᵢ = [x0(4); goal(2); mask(N)] (train_and_test_utils.jl:366-368).
            goal = theta_i[-(N + 2) : -N]
            mask = theta_i[-N:]
            p_i = xs[i][:2]
            repulsion = sum(
                (mask[i] * mask[j])
                / jnp.sum((p_i - xs[j][:2]) ** 2)
                for j in range(N)
                if j != i
            )
            return (
                goal_weight * jnp.sum((p_i - goal) ** 2)
                + jnp.sum(xs[i][2:4] ** 2)
                + 0.1 * jnp.sum(us[i] ** 2)
                + repulsion_weight * repulsion
            )

        return stage_cost

    cost = TimeSeparableTrajectoryGameCost(
        stage_costs=[make_stage_cost(i) for i in range(N)],
        reducer=mean_reducer,
        discount_factor=1.0,
    )

    # The reference leaves coupling as a constant [1] row per time step
    # (train_and_test_utils.jl:383-390) — collision avoidance lives in the
    # soft-masked cost, not in hard constraints. Kept for shape parity;
    # disable via trivial_coupling=False to drop the dead rows.
    coupling = None
    if trivial_coupling:
        def coupling(xs, us, thetas):
            T = xs[0].shape[0]
            return jnp.ones((T,), dtype=xs[0].dtype)

    agent_dynamics = planar_double_integrator(
        state_bounds=state_bounds, control_bounds=control_bounds
    )
    return TrajectoryGame(
        dynamics=ProductDynamics([agent_dynamics] * N),
        cost=cost,
        env=environment,
        coupling_constraints=coupling,
    )


def setup_trajectory_game(
    *, environment: PolygonEnvironment, N: int, trivial_coupling: bool = True
) -> TrajectoryGame:
    """Synthetic masked game (train_and_test_utils.jl:362-401)."""
    return _masked_game(
        environment=environment,
        N=N,
        goal_weight=1.0,
        repulsion_weight=2.0,
        state_bounds={"lb": [-jnp.inf, -jnp.inf, -2.0, -2.0], "ub": [jnp.inf, jnp.inf, 2.0, 2.0]},
        control_bounds={"lb": [-1.0, -1.0], "ub": [1.0, 1.0]},
        trivial_coupling=trivial_coupling,
    )


def setup_real_game(
    *, environment: PolygonEnvironment, N: int, trivial_coupling: bool = True
) -> TrajectoryGame:
    """Pedestrian-data variant with dataset-fitted bounds
    (train_and_test_utils.jl:403-442)."""
    return _masked_game(
        environment=environment,
        N=N,
        goal_weight=0.3,
        repulsion_weight=1.0,
        state_bounds={"lb": [18.5, 2.0, -1.0, -2.3], "ub": [26.0, 23.5, 1.2, 2.2]},
        control_bounds={"lb": [-0.5, -0.5], "ub": [0.5, 0.5]},
        trivial_coupling=trivial_coupling,
    )


def build_masked_parametric_game(
    game: TrajectoryGame, *, N: int, horizon: int = 30, compute_sensitivities: bool = True
):
    """params_per_player = N + 2 (goal + full mask vector), matching the
    reference's build call (train_and_test_utils.jl:600-601)."""
    return build_parametric_game(
        game=game,
        horizon=horizon,
        params_per_player=N + 2,
        compute_sensitivities=compute_sensitivities,
    )


def pack_masked_theta(
    initial_states: Array, goals: Array, mask: Array, *, ego_index: int = 0
) -> Array:
    """θ blocks per player: [x0ᵢ; goalᵢ; maskᵢ]. The learned mask goes into
    the ego player's block with its own entry forced to 1; other players see
    all-ones (parametric_masked_game_solver.jl:19).

    initial_states: (N, 4); goals: (N, 2); mask: (N,) with mask[ego] == 1.
    """
    N = initial_states.shape[0]
    ones = jnp.ones((N,), dtype=mask.dtype)
    blocks = []
    for i in range(N):
        mi = mask if i == ego_index else ones
        blocks.append(
            jnp.concatenate([initial_states[i], goals[i], mi])
        )
    return jnp.concatenate(blocks)
