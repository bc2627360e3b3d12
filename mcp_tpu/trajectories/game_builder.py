"""TrajectoryGame → ParametricGame (MCP) compilation.

Parity target: the reference's build_parametric_game / build_mcp_components
(examples/utils.jl:53-178). Per-player discounted stage-cost objectives;
shared equalities = initial-state pin + dynamics defects; shared inequalities
= coupling + polygon environment + control box + state box, in the
reference's stacking order (examples/utils.jl:109-155) so solutions compare
entry-wise.

TPU-first: all per-time loops are `vmap`s over the horizon axis, so XLA sees
batched matmuls/elementwise rather than unrolled scalar chains.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..games import OptimizationProblem, ParametricGame
from .costs import TrajectoryGame
from .environment import box_constraint_fn
from .packing import trajectory_blocking, unpack_parameters, unpack_trajectory

Array = jax.Array


def build_objectives(game: TrajectoryGame, horizon: int):
    """Per-player objective closures over the flat joint primal
    (reference examples/utils.jl:96-106)."""
    N = game.num_players
    gamma = game.cost.discount_factor

    def make_objective(i):
        stage_cost = game.cost.stage_costs[i]

        def objective(taus, theta_i):
            trajs = unpack_trajectory(taus, dynamics=game.dynamics, horizon=horizon)
            xs = tuple(t.xs for t in trajs)  # each (T, sd_i)
            us = tuple(t.us for t in trajs)
            ts = jnp.arange(horizon)
            per_stage = jax.vmap(
                lambda x_t, u_t, t: stage_cost(x_t, u_t, t, theta_i)
            )(xs, us, ts)
            discount = gamma ** ts.astype(per_stage.dtype)
            return game.cost.reducer(discount * per_stage)

        return objective

    return [make_objective(i) for i in range(N)]


def build_shared_equality(game: TrajectoryGame, horizon: int):
    """Initial-state pin + dynamics defects (examples/utils.jl:109-123).
    Row order: joint initial-state residual, then per time step the joint
    defect x_t − f(x_{t−1}, u_{t−1})."""

    def shared_equality(taus, thetas):
        trajs = unpack_trajectory(taus, dynamics=game.dynamics, horizon=horizon)
        X = jnp.concatenate([t.xs for t in trajs], axis=1)  # (T, sd_total)
        U = jnp.concatenate([t.us for t in trajs], axis=1)  # (T, cd_total)
        initial_blocks, _ = unpack_parameters(thetas, dynamics=game.dynamics)
        g1 = X[0] - jnp.concatenate(initial_blocks)
        pred = jax.vmap(game.dynamics)(X[:-1], U[:-1])
        g2 = (X[1:] - pred).reshape(-1)
        return jnp.concatenate([g1, g2])

    return shared_equality


def build_shared_inequality(game: TrajectoryGame, horizon: int):
    """Coupling + environment + control box + state box rows, in the
    reference's order (examples/utils.jl:126-155)."""
    dynamics = game.dynamics
    N = game.num_players
    control_box = box_constraint_fn(*dynamics.control_bounds)
    state_box = box_constraint_fn(*dynamics.state_bounds)
    env = game.env

    def shared_inequality(taus, thetas):
        trajs = unpack_trajectory(taus, dynamics=game.dynamics, horizon=horizon)
        xs = tuple(t.xs for t in trajs)
        us = tuple(t.us for t in trajs)
        X = jnp.concatenate(xs, axis=1)  # (T, sd_total)
        U = jnp.concatenate(us, axis=1)

        parts = []
        if game.coupling_constraints is not None:
            parts.append(game.coupling_constraints(xs, us, thetas).reshape(-1))
        if env is not None:
            # Per time, per player, per polygon edge (examples/utils.jl:131-134).
            def env_rows(x_joint_t):
                blocks = dynamics.state_blocking.split(x_joint_t)
                return jnp.concatenate(
                    [env.position_constraints(b[:2]) for b in blocks]
                )

            parts.append(jax.vmap(env_rows)(X).reshape(-1))
        if control_box.num_constraints:
            parts.append(jax.vmap(control_box)(U).reshape(-1))
        if state_box.num_constraints:
            parts.append(jax.vmap(state_box)(X).reshape(-1))
        if not parts:
            return jnp.zeros((0,), dtype=X.dtype)
        return jnp.concatenate(parts)

    return shared_inequality


def build_parametric_game(
    *,
    game: TrajectoryGame,
    horizon: int = 10,
    params_per_player: int = 0,  # not counting the initial state, which is always a param
    compute_sensitivities: bool = True,
) -> ParametricGame:
    """Compile a TrajectoryGame into a ParametricGame/MCP
    (reference examples/utils.jl:53-84, :157-178)."""
    dynamics = game.dynamics
    N = game.num_players
    primal_blocking = trajectory_blocking(dynamics, horizon)

    objectives = build_objectives(game, horizon)
    problems = [OptimizationProblem(objective=f) for f in objectives]

    test_point = [jnp.zeros(s) for s in primal_blocking.sizes]
    test_parameter = [
        jnp.zeros(dynamics.state_dim(i) + params_per_player) for i in range(N)
    ]

    return ParametricGame.create(
        test_point=test_point,
        test_parameter=test_parameter,
        problems=problems,
        shared_equality=build_shared_equality(game, horizon),
        shared_inequality=build_shared_inequality(game, horizon),
        compute_sensitivities=compute_sensitivities,
    )
