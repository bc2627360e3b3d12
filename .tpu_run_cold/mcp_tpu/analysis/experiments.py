"""Stand-alone experiment harnesses: N-scaling timing and the mask
loss-landscape sweep.

Parity targets: the reference's solver wall-time vs player count experiment
(examples/time_test.jl:21-80, measured per receding-horizon step) and the
2-D mask loss-landscape grid sweep (examples/gradient_test.jl:7-55).

TPU-first: the landscape sweep evaluates the whole mask grid as ONE vmapped
batch of solves; the N-scaling harness times batched steps and reports
per-instance cost.
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..selection.games import setup_road_environment, setup_trajectory_game
from ..selection.loss import composite_loss
from ..selection.runner import MaskedGameRunner
from ..solver import SolverOptions


def n_scaling_experiment(
    player_counts: Sequence[int] = (2, 3, 4),
    *,
    horizon: int = 30,
    batch: int = 1,
    repeats: int = 3,
    seed: int = 0,
    options: Optional[SolverOptions] = None,
    verbose: bool = True,
) -> dict:
    """Measure per-step masked-game solve time vs N
    (examples/time_test.jl:21-80; the reference's own numbers are recorded in
    BASELINE.md). Returns {N: seconds-per-solve}."""
    results = {}
    for N in player_counts:
        env = setup_road_environment(length=10.0)
        game = setup_trajectory_game(environment=env, N=N)
        runner = MaskedGameRunner.create(
            game, N=N, horizon=horizon, options=options or SolverOptions()
        )
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        # Spread players on a circle for guaranteed separation.
        ang = jnp.linspace(0.0, 2 * jnp.pi, N, endpoint=False)
        base = jnp.stack([3.0 * jnp.cos(ang), 3.0 * jnp.sin(ang)], axis=1)
        init = jnp.concatenate(
            [
                base + 0.1 * jax.random.normal(k1, (N, 2)),
                jnp.zeros((N, 2)),
            ],
            axis=1,
        )[None, :, :].repeat(batch, axis=0).astype(jnp.float32)
        goals = (-base + 0.1 * jax.random.normal(k2, (N, 2)))[None].repeat(
            batch, axis=0
        ).astype(jnp.float32)
        masks = jnp.ones((batch, N), jnp.float32)

        bs = runner.solve(init, goals, masks)  # compile + warm
        jax.block_until_ready(bs.result.x)
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            bs = runner.solve(init, goals, masks)
            jax.block_until_ready(bs.result.x)
            times.append(time.perf_counter() - t0)
        per_solve = min(times) / batch
        results[N] = per_solve
        if verbose:
            print(
                f"N={N}: {per_solve:.4f} s/solve (batch {batch}), "
                f"status={np.asarray(bs.result.status)[:4]}"
            )
    return results


def mask_loss_landscape(
    runner: MaskedGameRunner,
    initial_states: jnp.ndarray,  # (N, 4)
    goals: jnp.ndarray,  # (N, 2)
    target_ego_states: jnp.ndarray,  # (T, 4) ground-truth ego plan
    *,
    mask_indices: tuple[int, int] = (1, 2),
    grid_points: int = 11,
    input_horizon: int = 10,
    ego_index: int = 0,
) -> dict:
    """Sweep two mask entries over [0,1]² and evaluate the composite loss at
    each grid point — the reference's loss-landscape probe
    (examples/gradient_test.jl:7-55) — as one batched solve."""
    N = runner.N
    # f32 explicitly: under x64 (tests) linspace yields f64, and an
    # f64-into-f32 scatter is a FutureWarning on its way to an error.
    g = jnp.linspace(0.0, 1.0, grid_points, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(g, g)
    flat_x, flat_y = gx.reshape(-1), gy.reshape(-1)
    B = flat_x.shape[0]

    base_mask = jnp.ones((B, N), jnp.float32)
    masks = base_mask.at[:, mask_indices[0]].set(flat_x).at[:, mask_indices[1]].set(flat_y)
    init = jnp.broadcast_to(initial_states[None], (B, N, 4)).astype(jnp.float32)
    gls = jnp.broadcast_to(goals[None], (B, N, 2)).astype(jnp.float32)
    mask_rows = runner.ego_masked_mask_rows(masks, ego_index=ego_index)
    bs = runner.solve(init, gls, masks, mask_rows=mask_rows)

    losses = jax.vmap(
        lambda ego_states, mask: composite_loss(
            ego_states,
            target_ego_states,
            mask[1:],
            horizon=runner.horizon,
            input_horizon=min(input_horizon, runner.horizon),
        )
    )(bs.trajectories[:, ego_index], masks)

    return {
        "grid_x": np.asarray(gx),
        "grid_y": np.asarray(gy),
        "losses": np.asarray(losses).reshape(grid_points, grid_points),
        "statuses": np.asarray(bs.result.status).reshape(grid_points, grid_points),
    }
