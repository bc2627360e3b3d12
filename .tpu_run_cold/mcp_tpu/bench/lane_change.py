"""Lane-change trajectory-game benchmark problem.

Mirror of the reference's trajectory-game benchmark
(benchmark/trajectory_game_benchmark.jl): the two-player lane-change game at
horizon 10, with random initial states sampled inside the road polygon and
random lane preferences (:62-87).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..examples.lane_change import build_lane_change_game
from ..games import ParametricGame
from ..trajectories import TrajectoryGame

Array = jax.Array


class LaneChangeBenchmark(NamedTuple):
    game: TrajectoryGame
    parametric_game: ParametricGame
    lane_centers: tuple[float, ...]
    horizon: int


def generate_test_problem(
    *, horizon: int = 10, height: float = 50.0
) -> LaneChangeBenchmark:
    """Build (once per horizon) the benchmark problem. Cached: the build
    costs ~20 s of tracing + banded-structure validation, every field of the
    result is immutable, and reusing the instance lets the solver's jit
    cache hit across callers — rebuilding it 16x was a third of the test
    suite's wall-clock. ``height`` scales the road for long horizons (a
    T-step game at the 2 m/s nominal speed travels 2T m; the default 50 m
    road makes horizons ≥ ~25 infeasible)."""
    return _build_test_problem(horizon, height)


@functools.lru_cache(maxsize=None)
def _build_test_problem(horizon: int, height: float = 50.0) -> LaneChangeBenchmark:
    game, pg, road = build_lane_change_game(horizon=horizon, height=height)
    return LaneChangeBenchmark(
        game=game,
        parametric_game=pg,
        lane_centers=road.lane_centers,
        horizon=horizon,
    )


def generate_random_parameter(
    key: Array,
    bench: LaneChangeBenchmark,
    *,
    height: float = 50.0,
    lane_width: float = 2.0,
    dtype=jnp.float32,
) -> Array:
    """θ = per-player [initial state; lane preference], with positions
    uniform inside the road polygon (margin for the 2 m separation), small
    forward velocities, and a uniformly chosen preferred lane center
    (trajectory_game_benchmark.jl:62-87)."""
    num_lanes = len(bench.lane_centers)
    road_width = num_lanes * lane_width
    k1, k2, k3, k4 = jax.random.split(key, 4)
    # Positions: x within road (0.5 margin), y in lower half so the horizon
    # stays inside; ensure players start laterally separated by lane.
    px = jax.random.uniform(
        k1, (2,), dtype, minval=0.5, maxval=road_width - 0.5
    )
    py = jax.random.uniform(k2, (2,), dtype, minval=1.0, maxval=0.5 * height)
    # Keep an initial separation ≥ 2: push player 2 at least 2.5 away in y
    # if the sampled positions are close.
    too_close = jnp.sum((px - px[::-1]) ** 2 + (py - py[::-1]) ** 2) < 2 * 6.25
    py = jnp.where(too_close, py.at[1].set(py[0] + 2.5), py)
    v = jax.random.uniform(k3, (2, 2), dtype, minval=0.0, maxval=2.0)
    lane_idx = jax.random.randint(k4, (2,), 0, num_lanes)
    lanes = jnp.asarray(bench.lane_centers, dtype)[lane_idx]
    theta_blocks = [
        jnp.concatenate(
            [jnp.array([px[i], py[i]], dtype), v[i], lanes[i : i + 1]]
        )
        for i in range(2)
    ]
    return jnp.concatenate(theta_blocks)


def generate_parameter_batch(
    key: Array, batch: int, bench: LaneChangeBenchmark, **kwargs
) -> Array:
    keys = jax.random.split(key, batch)
    return jax.vmap(lambda k: generate_random_parameter(k, bench, **kwargs))(keys)
