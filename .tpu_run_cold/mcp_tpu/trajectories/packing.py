"""Flat-vector ↔ structured trajectory/parameter layouts.

Parity targets (reference examples/utils.jl:1-50):
  * per-player primal block τᵢ = [x₁; …; x_T; u₁; …; u_T] (states then
    controls, time-major within each) — the Julia `reshape(·, (dim, T))`
    column-major layout equals a (T, dim) row-major reshape here.
  * θᵢ = [initial-stateᵢ; extra-paramsᵢ] per player (pack_parameters /
    unpack_parameters, examples/utils.jl:27-41).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..blocks import Blocking
from .dynamics import ProductDynamics

Array = jax.Array


class PlayerTrajectory(NamedTuple):
    xs: Array  # (T, state_dim)
    us: Array  # (T, control_dim)


def trajectory_blocking(dynamics: ProductDynamics, horizon: int) -> Blocking:
    """Per-player primal sizes T·(state_dim + control_dim)
    (reference examples/utils.jl:157-160)."""
    return Blocking(
        tuple(
            horizon * (dynamics.state_dim(i) + dynamics.control_dim(i))
            for i in range(dynamics.num_players)
        )
    )


def unpack_trajectory(
    flat_blocks: Sequence[Array], *, dynamics: ProductDynamics, horizon: int
) -> tuple[PlayerTrajectory, ...]:
    """Per-player flat block → (xs, us) matrices (examples/utils.jl:2-16)."""
    out = []
    for i, tau in enumerate(flat_blocks):
        sd, cd = dynamics.state_dim(i), dynamics.control_dim(i)
        xs = tau[: sd * horizon].reshape(horizon, sd)
        us = tau[sd * horizon :].reshape(horizon, cd)
        out.append(PlayerTrajectory(xs=xs, us=us))
    return tuple(out)


def pack_trajectory(trajs: Sequence[PlayerTrajectory]) -> tuple[Array, ...]:
    """(xs, us) per player → flat per-player blocks (examples/utils.jl:19-24)."""
    return tuple(
        jnp.concatenate([t.xs.reshape(-1), t.us.reshape(-1)]) for t in trajs
    )


def pack_parameters(
    initial_state_blocks: Sequence[Array], other_param_blocks: Sequence[Array]
) -> tuple[Array, ...]:
    """θᵢ = [x₀ᵢ; extraᵢ] per player (examples/utils.jl:27-29)."""
    return tuple(
        jnp.concatenate([jnp.asarray(x0), jnp.asarray(p).reshape(-1)])
        for x0, p in zip(initial_state_blocks, other_param_blocks)
    )


def unpack_parameters(
    theta_blocks: Sequence[Array], *, dynamics: ProductDynamics
) -> tuple[tuple[Array, ...], tuple[Array, ...]]:
    """Inverse of pack_parameters (examples/utils.jl:32-41)."""
    initial, other = [], []
    for i, ti in enumerate(theta_blocks):
        sd = dynamics.state_dim(i)
        initial.append(ti[:sd])
        other.append(ti[sd:])
    return tuple(initial), tuple(other)
