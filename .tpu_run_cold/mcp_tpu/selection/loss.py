"""Composite player-selection training loss + solver-gradient clamping.

Mirror of the reference's solver-in-the-loop loss
(examples/train_and_test_utils.jl:271-278):

    loss = w₁·similarity + w₂·mask-sum + w₃·binariness,  weights [11, 1.5, 1]

where similarity compares the ego player's solved tail positions (the last
`input_horizon` steps of the horizon-T plan) to the ground-truth plan, the
mask-sum term rewards sparsity, and the binariness term pushes masks toward
{0, 1}.

The reference clamps the solver gradient dL/dmask to ±10 before feeding it
into the NN pullback (examples/train_new.jl:65). With one end-to-end
``jax.grad`` that boundary no longer exists, so the clamp is reproduced as a
custom-VJP identity placed at the MLP output: forward is identity, the
backward cotangent (== dL/dmask) is clipped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

DEFAULT_WEIGHTS = (11.0, 1.5, 1.0)  # train_and_test_utils.jl:637
GRAD_CLAMP = 10.0  # train_new.jl:65


@jax.custom_vjp
def clamp_cotangent(x: Array) -> Array:
    """Identity whose backward cotangent is clipped to ±GRAD_CLAMP."""
    return x


def _cc_fwd(x):
    return x, None


def _cc_bwd(_, g):
    return (jnp.clip(g, -GRAD_CLAMP, GRAD_CLAMP),)


clamp_cotangent.defvjp(_cc_fwd, _cc_bwd)


def similarity_loss(
    ego_states: Array,
    target_states: Array,
    *,
    horizon: int,
    input_horizon: int,
) -> Array:
    """Mean 2-norm position error over the tail steps
    (train_and_test_utils.jl:272-273): steps horizon-input_horizon .. horizon-1.

    ego_states / target_states: (T, state_dim≥2) plans.
    """
    tail = slice(horizon - input_horizon, horizon)
    diff = ego_states[tail, :2] - target_states[tail, :2]
    return jnp.mean(jnp.sqrt(jnp.sum(diff**2, axis=-1) + 1e-12))


def mask_sparsity_loss(mask: Array) -> Array:
    """Σ mask / (N-1) (train_and_test_utils.jl:276)."""
    return jnp.mean(mask)


def mask_binariness_loss(mask: Array) -> Array:
    """Σ (0.5 - |0.5 - mask|) / (N-1) (train_and_test_utils.jl:275)."""
    return jnp.mean(0.5 - jnp.abs(0.5 - mask))


def composite_loss(
    ego_states: Array,
    target_states: Array,
    mask: Array,
    *,
    horizon: int,
    input_horizon: int,
    weights=DEFAULT_WEIGHTS,
) -> Array:
    return (
        weights[0]
        * similarity_loss(
            ego_states, target_states, horizon=horizon, input_horizon=input_horizon
        )
        + weights[1] * mask_sparsity_loss(mask)
        + weights[2] * mask_binariness_loss(mask)
    )
