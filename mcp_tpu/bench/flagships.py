"""Shared builders for the flagship benchmark shapes.

Single source of truth for the exact (problem, inputs, options) triples the
flagship benches time — used by scripts/bench_train_step.py,
scripts/bench_tridiag.py AND scripts/precompile.py, so the precompile pass
stages byte-identical programs into the persistent compile cache
(VERDICT r4 item 9: the N=4 training step costs 445 s to compile against a
0.214 s step; pre-staging it must build the very same jaxpr).

Shapes (reference provenance):
  * masked-game flagship: N players on the circle-crossing road scenario,
    horizon 30 — the reference's timing workload
    (/root/reference/scripts/time_plot.py:5-14: 5.04 s/step at N=4,
    73.1 s/step at N=10 on CPU).
  * training step: MLP mask predictor -> masked-game solve -> composite
    loss -> IFT gradient (reference examples/train_new.jl:27-108).
"""

from __future__ import annotations

import dataclasses
from types import SimpleNamespace

import jax
import jax.numpy as jnp


def masked_game_setup(batch: int, players: int, horizon: int, *, seed: int = 0):
    """The circle-crossing masked-game flagship: returns a namespace with
    runner, mcp, thetas (B, p), x0 (B, n), init, goals, masks."""
    from ..selection.games import setup_road_environment, setup_trajectory_game
    from ..selection.runner import MaskedGameRunner

    env = setup_road_environment(length=10.0)
    game = setup_trajectory_game(environment=env, N=players)
    runner = MaskedGameRunner.create(game, N=players, horizon=horizon)
    key = jax.random.PRNGKey(seed)
    ang = jnp.linspace(0.0, 2 * jnp.pi, players, endpoint=False)
    base = jnp.stack([3.0 * jnp.cos(ang), 3.0 * jnp.sin(ang)], axis=1)
    init = (
        jnp.concatenate([base, jnp.zeros((players, 2))], 1)[None]
        .repeat(batch, 0)
        .astype(jnp.float32)
    )
    init = init + 0.05 * jax.random.normal(key, init.shape, jnp.float32)
    goals = (-base)[None].repeat(batch, 0).astype(jnp.float32)
    masks = jnp.ones((batch, players), jnp.float32)
    thetas = runner.pack_thetas(
        init, goals, jnp.broadcast_to(masks[:, None, :], (batch, players, players))
    )
    return SimpleNamespace(
        runner=runner,
        mcp=runner.parametric_game.mcp,
        thetas=thetas,
        x0=runner.cold_starts(init),
        init=init,
        goals=goals,
        masks=masks,
    )


def train_step_setup(
    batch: int = 8,
    players: int = 4,
    horizon: int = 30,
    *,
    tier: str = "tridiag",
    polish: bool = True,
    seed: int = 0,
):
    """The solver-in-the-loop training-step flagship (N=4 h30 b8 default):
    returns a namespace with train_step, sgd_update, config, runner, params,
    trajectories, init, goals, gt_success, rate."""
    from ..selection.model import init_mlp, input_size
    from ..selection.train import TrainConfig, make_train_step
    from ..solver import SolverOptions, auto_tightening_rate

    s = masked_game_setup(batch, players, horizon, seed=seed)
    # PARTIAL-mask games (the MLP's sigmoid outputs sit near 0.5 early in
    # training) are harder than the all-ones flagships: at N=4 the 0.02
    # anneal certifies only half the lanes while 0.05 certifies all
    # (measured, CPU, round 4) — the training bench floors the auto rate.
    rate = max(auto_tightening_rate(s.mcp), 0.05)
    runner = dataclasses.replace(
        s.runner,
        options=SolverOptions(
            linear_solver=tier,
            sensitivity_solver="tridiag",
            tightening_rate=rate,
            polish=polish,
        ),
    )
    config = TrainConfig(num_players=players, horizon=horizon, batch_size=batch)
    train_step, loss_fn, sgd_update = make_train_step(runner, config)
    # Ground-truth targets = the all-ones-mask solve of the same scenarios
    # (the reference's targets are all-ones-game dumps,
    # examples/game_with_masks.jl:25-43).
    gt = runner.solve(
        s.init, s.goals, jnp.ones((batch, players), jnp.float32)
    )
    params = init_mlp(
        jax.random.PRNGKey(3),
        input_size(players, config.input_horizon, config.input_state_dim),
        players,
    )
    return SimpleNamespace(
        train_step=train_step,
        sgd_update=sgd_update,
        config=config,
        runner=runner,
        params=params,
        trajectories=gt.trajectories,
        init=s.init,
        goals=s.goals,
        gt_success=float(jnp.mean(gt.result.status == 0)),
        rate=rate,
        key=jax.random.PRNGKey(seed),
    )


# ---- staged training-step artifacts (VERDICT r4 item 9) -------------------
#
# The 0.214 s training step costs ~445 s to COMPILE cold and ~90 s even on a
# primed compile cache — because the persistent cache only skips XLA
# compilation; the Python build (game setup + ground-truth solve) and the
# jaxpr TRACE of the solver-in-the-loop value_and_grad still run every
# process. Staging exports the traced program (jax.export → StableHLO,
# compile cache applies on rehydration) and the exact input arrays, so a
# warm bench run skips both the build and the trace.


_EXPORT_TYPES_REGISTERED = False


def _register_export_types():
    """jax.export serializes pytreedefs; custom container types in the
    train-step signature (MLPParams) must be registered once per process."""
    global _EXPORT_TYPES_REGISTERED
    if _EXPORT_TYPES_REGISTERED:
        return
    from jax import export as jexport

    from ..selection.model import MLPParams

    jexport.register_namedtuple_serialization(
        MLPParams, serialized_name="mcp_tpu.selection.model.MLPParams"
    )
    _EXPORT_TYPES_REGISTERED = True


def _train_artifact_paths(batch, players, horizon, tier, polish):
    import os

    from ..utils.devices import persistent_cache_dir

    d = os.path.join(persistent_cache_dir(), "staged")
    tag = f"train_N{players}_T{horizon}_B{batch}_{tier}_p{int(polish)}"
    return (
        os.path.join(d, tag + ".jaxexport"),
        os.path.join(d, tag + ".npz"),
    )


def stage_train_step(
    batch: int = 8,
    players: int = 4,
    horizon: int = 30,
    *,
    tier: str = "tridiag",
    polish: bool = True,
    seed: int = 0,
):
    """Build the training-step flagship once and stage (exported program,
    input arrays) under the persistent cache dir. Returns the setup."""
    import os

    import numpy as np
    from jax import export as jexport

    _register_export_types()
    s = train_step_setup(
        batch, players, horizon, tier=tier, polish=polish, seed=seed
    )
    exp_path, npz_path = _train_artifact_paths(
        batch, players, horizon, tier, polish
    )
    os.makedirs(os.path.dirname(exp_path), exist_ok=True)
    exported = jexport.export(s.train_step)(
        s.params, s.trajectories, s.init, s.goals
    )
    with open(exp_path, "wb") as f:
        f.write(exported.serialize())
    flat_params, _ = jax.tree_util.tree_flatten(s.params)
    np.savez(
        npz_path,
        trajectories=np.asarray(s.trajectories),
        init=np.asarray(s.init),
        goals=np.asarray(s.goals),
        rate=np.float32(s.rate),
        gt_success=np.float32(s.gt_success),
        **{f"param_{i}": np.asarray(p) for i, p in enumerate(flat_params)},
    )
    return s


def load_staged_train_step(
    batch: int = 8,
    players: int = 4,
    horizon: int = 30,
    *,
    tier: str = "tridiag",
    polish: bool = True,
):
    """Rehydrate the staged training step WITHOUT building the game or
    tracing the program (compile cache still applies to the XLA stage).
    Returns a namespace compatible with train_step_setup's timing fields,
    or None when no artifacts are staged."""
    import os

    import numpy as np
    from jax import export as jexport

    from ..selection.model import init_mlp, input_size
    from ..selection.train import TrainConfig

    _register_export_types()
    exp_path, npz_path = _train_artifact_paths(
        batch, players, horizon, tier, polish
    )
    if not (os.path.exists(exp_path) and os.path.exists(npz_path)):
        return None
    with open(exp_path, "rb") as f:
        exported = jexport.deserialize(f.read())
    data = np.load(npz_path)
    config = TrainConfig(
        num_players=players, horizon=horizon, batch_size=batch
    )
    # Same param pytree structure as staging (init_mlp), filled with the
    # staged leaves.
    params = init_mlp(
        jax.random.PRNGKey(3),
        input_size(players, config.input_horizon, config.input_state_dim),
        players,
    )
    flat, treedef = jax.tree_util.tree_flatten(params)
    flat = [
        jnp.asarray(data[f"param_{i}"]) for i in range(len(flat))
    ]
    params = jax.tree_util.tree_unflatten(treedef, flat)

    @jax.jit
    def sgd_update(params, grads, lr):
        return jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)

    return SimpleNamespace(
        train_step=exported.call,
        sgd_update=sgd_update,
        config=config,
        params=params,
        trajectories=jnp.asarray(data["trajectories"]),
        init=jnp.asarray(data["init"]),
        goals=jnp.asarray(data["goals"]),
        gt_success=float(data["gt_success"]),
        rate=float(data["rate"]),
        key=jax.random.PRNGKey(0),
    )
