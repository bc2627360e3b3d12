"""Player-selection mask predictor MLP.

Mirror of the reference's Flux model (examples/train_and_test_utils.jl:454-462):
input = flattened ego-history (N · input_horizon · input_state_dim) →
Dense(256, relu) → Dense(64, relu) → Dense(16, relu) → Dense(N-1, sigmoid).

Implemented as a plain JAX pytree of params (init/apply), so the whole
training step — MLP forward, solver-in-the-loop loss, backward — is one
jit-compiled function.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array

HIDDEN_SIZES = (256, 64, 16)


class MLPParams(NamedTuple):
    weights: tuple[Array, ...]
    biases: tuple[Array, ...]


def input_size(num_players: int, input_horizon: int = 10, input_state_dim: int = 2) -> int:
    """N · input_horizon · input_state_dim (train_and_test_utils.jl:584-589)."""
    return num_players * input_horizon * input_state_dim


def init_mlp(
    key: Array, in_size: int, num_players: int, dtype=jnp.float32
) -> MLPParams:
    sizes = (in_size,) + HIDDEN_SIZES + (num_players - 1,)
    ws, bs = [], []
    for i, (a, b) in enumerate(zip(sizes[:-1], sizes[1:])):
        key, sub = jax.random.split(key)
        # Glorot-uniform, Flux's Dense default initializer.
        limit = jnp.sqrt(6.0 / (a + b)).astype(dtype)
        ws.append(jax.random.uniform(sub, (b, a), dtype, -limit, limit))
        bs.append(jnp.zeros((b,), dtype))
    return MLPParams(weights=tuple(ws), biases=tuple(bs))


def apply_mlp(params: MLPParams, x: Array) -> Array:
    """Forward pass; final sigmoid yields per-other-player masks in (0, 1)."""
    h = x
    for i, (W, b) in enumerate(zip(params.weights, params.biases)):
        h = W @ h + b
        if i < len(params.weights) - 1:
            h = jax.nn.relu(h)
    return jax.nn.sigmoid(h)


def prepare_input(
    trajectories: Array, input_horizon: int, input_state_dim: int
) -> Array:
    """Flatten the first `input_horizon` steps / `input_state_dim` dims of all
    players' trajectories (train_and_test_utils.jl:467-470).

    trajectories: (N, T, state_dim) array.
    """
    return trajectories[:, :input_horizon, :input_state_dim].reshape(-1)
