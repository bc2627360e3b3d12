"""Open-loop / joint strategies, rollout, and warm-started receding-horizon
control.

Parity targets: TrajectoryGamesBase's OpenLoopStrategy/JointStrategy/rollout
(SURVEY.md §2.5) and the reference's warm-started receding-horizon machinery
(examples/utils.jl:180-308): first solve seeds the primal with a zero-input
rollout and zero equality duals; subsequent solves warm-start from the last
solution's (x, y); the strategy re-plans when the current plan ages past
`turn_length`.

The solve itself is a jitted fixed-shape MCP solve; the receding-horizon
driver is stateful host-side Python (it owns warm-start caching across
re-plans), which is the right split on TPU: device code is shape-static,
control flow that depends on solve success lives on host.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from .. import diff as _diff
from ..games import GameSolveResult, ParametricGame, solve_game
from ..solver import SolverOptions
from ..types import SOLVED
from .costs import TrajectoryGame
from .packing import (
    PlayerTrajectory,
    pack_parameters,
    pack_trajectory,
    unpack_parameters,
    unpack_trajectory,
)

Array = jax.Array


@dataclasses.dataclass
class OpenLoopStrategy:
    """Replays a precomputed open-loop plan (ignores the observed state)."""

    xs: Array  # (T, state_dim_i)
    us: Array  # (T, control_dim_i)

    def __call__(self, state, t: int) -> Array:
        return self.us[t]


@dataclasses.dataclass
class JointStrategy:
    """Per-player substrategies applied to the joint state."""

    substrategies: Sequence[Callable]

    def __call__(self, state, t: int) -> Array:
        return jnp.concatenate([sub(state, t) for sub in self.substrategies])


class Rollout(NamedTuple):
    xs: Array  # (T, state_dim)
    us: Array  # (T, control_dim)
    infos: list


def rollout(dynamics, strategy, initial_state, steps: int, *, get_info=None) -> Rollout:
    """Closed-loop rollout: T states and T controls with the dynamics applied
    T-1 times (TrajectoryGamesBase.rollout semantics — the packed layout
    requires equal-length xs/us, examples/utils.jl:19-24)."""
    x = jnp.asarray(initial_state)
    xs, us, infos = [], [], []
    for t in range(steps):
        u = strategy(x, t)
        xs.append(x)
        us.append(u)
        if get_info is not None:
            infos.append(get_info(strategy, x, t))
        if t < steps - 1:
            x = dynamics(x, u)
    return Rollout(xs=jnp.stack(xs), us=jnp.stack(us), infos=infos)


def zero_input_trajectory(
    *, game: TrajectoryGame, horizon: int, initial_state
) -> tuple[PlayerTrajectory, ...]:
    """Zero-control rollout used to seed cold-started solves
    (examples/utils.jl:181-192)."""
    dynamics = game.dynamics
    cd = dynamics.control_dim()
    strategy = lambda x, t: jnp.zeros(cd, dtype=jnp.asarray(initial_state).dtype)
    r = rollout(dynamics, strategy, initial_state, horizon)
    sb, cb = dynamics.state_blocking, dynamics.control_blocking
    return tuple(
        PlayerTrajectory(
            xs=r.xs[:, so : so + ss],
            us=r.us[:, co : co + cs],
        )
        for so, ss, co, cs in zip(sb.offsets, sb.sizes, cb.offsets, cb.sizes)
    )


def cold_start_primal(
    game: TrajectoryGame, parametric_game: ParametricGame, horizon: int, initial_state
) -> Array:
    """x₀ = [zero-input trajectory; zero equality duals]
    (examples/utils.jl:218-228)."""
    trajs = zero_input_trajectory(game=game, horizon=horizon, initial_state=initial_state)
    tau = jnp.concatenate(pack_trajectory(trajs))
    dims = parametric_game.dims
    dual_zeros = jnp.zeros(sum(dims.lam) + dims.shared_lam, dtype=tau.dtype)
    return jnp.concatenate([tau, dual_zeros])


def solve_trajectory_game(
    game: TrajectoryGame,
    horizon: int,
    parameter_blocks: Sequence[Array],
    *,
    parametric_game: ParametricGame,
    last_solution: Optional[GameSolveResult] = None,
    options: Optional[SolverOptions] = None,
    warm_start_slacks: bool = False,
    **solve_kwargs,
) -> tuple[JointStrategy, GameSolveResult]:
    """One receding-horizon plan update (examples/utils.jl:195-271, minus the
    fork's always-on gradient probe, which lives in the selection layer).

    Warm-starts from `last_solution` when it solved; otherwise cold-starts
    from a zero-input rollout.
    """
    if last_solution is not None and int(last_solution.status) == SOLVED:
        # Reference warm start is (x, y) only (examples/utils.jl:209-216);
        # warm_start_slacks additionally seeds s — an off-central s₀ = 1
        # stalls the Mehrotra algorithm, and with s₀ = s* it re-solves in
        # ~3 iterations vs the annealed loop's ~7.
        if warm_start_slacks:
            solve_kwargs = dict(solve_kwargs, s0=last_solution.s)
        sol = solve_game(
            parametric_game,
            parameter_blocks,
            x0=last_solution.x,
            y0=last_solution.y,
            options=options,
            **solve_kwargs,
        )
    else:
        initial_blocks, _ = unpack_parameters(
            parameter_blocks, dynamics=game.dynamics
        )
        x0 = cold_start_primal(
            game, parametric_game, horizon, jnp.concatenate(initial_blocks)
        )
        sol = solve_game(
            parametric_game, parameter_blocks, x0=x0, options=options, **solve_kwargs
        )

    trajs = unpack_trajectory(sol.primals, dynamics=game.dynamics, horizon=horizon)
    strategy = JointStrategy([OpenLoopStrategy(t.xs, t.us) for t in trajs])
    return strategy, sol


@dataclasses.dataclass
class WarmStartRecedingHorizonStrategy:
    """Receding-horizon strategy with warm starting
    (examples/utils.jl:274-308). Callable as (state, time) inside `rollout`;
    re-plans when the current plan ages past `turn_length`. Failed solves do
    not overwrite the warm start (examples/utils.jl:232-234)."""

    game: TrajectoryGame
    parametric_game: ParametricGame
    turn_length: int
    horizon: int
    parameters: Sequence[Array]  # per-player extra params (beyond initial state)
    options: Optional[SolverOptions] = None
    receding_horizon_strategy: Optional[JointStrategy] = None
    time_last_updated: int = 0
    last_solution: Optional[GameSolveResult] = None
    solution_status: Optional[int] = None

    def __call__(self, state, time: int) -> Array:
        plan_exists = self.receding_horizon_strategy is not None
        time_along_plan = time - self.time_last_updated
        plan_is_valid = 0 <= time_along_plan < self.turn_length

        if not plan_exists or not plan_is_valid:
            state_blocks = self.game.dynamics.state_blocking.split(jnp.asarray(state))
            theta_blocks = pack_parameters(state_blocks, self.parameters)
            strategy, sol = solve_trajectory_game(
                self.game,
                self.horizon,
                theta_blocks,
                parametric_game=self.parametric_game,
                last_solution=self.last_solution,
                options=self.options,
            )
            self.receding_horizon_strategy = strategy
            if int(sol.status) == SOLVED:
                self.last_solution = sol
            self.solution_status = int(sol.status)
            self.time_last_updated = time
            time_along_plan = 0

        return self.receding_horizon_strategy(state, time_along_plan)
