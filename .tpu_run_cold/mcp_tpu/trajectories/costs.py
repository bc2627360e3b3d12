"""Trajectory-game cost containers and the TrajectoryGame bundle.

Owned equivalents of TrajectoryGamesBase's TimeSeparableTrajectoryGameCost and
TrajectoryGame (reference usage at examples/lane_change.jl:15-55,
examples/train_and_test_utils.jl:362-401).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax

from .dynamics import ProductDynamics
from .environment import PolygonEnvironment

Array = jax.Array


@dataclasses.dataclass(frozen=True, eq=False)
class TimeSeparableTrajectoryGameCost:
    """Per-player stage costs + reducer + discounting.

    stage_costs[i] has signature (xs, us, t, theta_i) -> scalar where xs/us
    are tuples of per-player state/control vectors at time t (the JAX
    equivalent of the reference's blocked joint vectors) and t is the
    0-based stage index. The total cost is
        reducer([γ^t · stage_cost(x_t, u_t, t, θi) for t in 0..T-1])
    matching the reference's discounted reduction (examples/utils.jl:96-106,
    with Julia's 1-based `discount_factor^(t-1)` ≡ γ^t here).
    """

    stage_costs: tuple[Callable, ...]
    reducer: Callable[[Array], Array]
    discount_factor: float = 1.0

    def __post_init__(self):
        object.__setattr__(self, "stage_costs", tuple(self.stage_costs))


def mean_reducer(stage_cost_values: Array) -> Array:
    """The reference games all use reduce(+)/length (examples/lane_change.jl:28-30)."""
    return stage_cost_values.mean()


@dataclasses.dataclass(frozen=True, eq=False)
class TrajectoryGame:
    """Bundle of dynamics, cost, environment, and coupling constraints
    (the reference's TrajectoryGame; examples/lane_change.jl:54)."""

    dynamics: ProductDynamics
    cost: TimeSeparableTrajectoryGameCost
    env: Optional[PolygonEnvironment]
    # coupling_constraints(xs, us, thetas) -> vector of residuals ≥ 0, where
    # xs/us are tuples over players of (T, dim) arrays and thetas is the tuple
    # of per-player parameter blocks. None disables coupling rows.
    coupling_constraints: Optional[Callable] = None

    @property
    def num_players(self) -> int:
        return self.dynamics.num_players
