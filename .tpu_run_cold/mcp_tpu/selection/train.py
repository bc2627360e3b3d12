"""Solver-in-the-loop training of the mask-predictor MLP.

Capability parity with the reference training loops (examples/train_new.jl,
examples/train_with_validation.jl): per-batch MLP forward → masked-game solve
→ composite loss → gradient → manual mean-gradient SGD with the ±10 solver-
gradient clamp; per-epoch train/val losses logged; best-on-validation and
final checkpoints; early stopping with patience.

TPU-first redesign (SURVEY.md §3.4): the reference glues two AD systems by
hand (Zygote-through-the-solver gradients fed as cotangents into a Flux
pullback, train_new.jl:63-71). Here the entire step —
``jax.value_and_grad`` of (MLP ∘ pack-θ ∘ batched IP solve ∘ loss) — is one
jit-compiled function; the clamp survives as a custom-VJP identity on the
MLP output (loss.clamp_cotangent).

The reference's failed-gradient fallback (random gradient,
train_and_test_utils.jl:284-289) is reproduced at batch granularity: if the
step produces non-finite gradients, a seeded random gradient of matching
scale is used instead.
"""

from __future__ import annotations

import dataclasses
import json
import os
import pickle
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .data import DataLoader, Example, batch_arrays
from .loss import DEFAULT_WEIGHTS, clamp_cotangent, composite_loss
from .model import MLPParams, apply_mlp, init_mlp, input_size
from .runner import MaskedGameRunner

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Replaces the reference's include-time const globals
    (train_and_test_utils.jl:584-654) with an explicit config."""

    num_players: int = 4
    horizon: int = 30
    input_horizon: int = 10
    input_state_dim: int = 2
    batch_size: int = 2
    epochs: int = 100
    learning_rate: float = 0.005
    loss_weights: tuple = DEFAULT_WEIGHTS
    patience: int = 100
    seed: int = 3
    ego_index: int = 0

    @property
    def record_name(self) -> str:
        """Run-identity string (train_and_test_utils.jl:654)."""
        return (
            f"bs_{self.batch_size}_ep_{self.epochs}_lr_{self.learning_rate}"
            f"_sd_{self.seed}_pat_{self.patience}_N_{self.num_players}"
            f"_h_{self.horizon}_ih{self.input_horizon}_isd_{self.input_state_dim}"
            f"_w_{list(self.loss_weights)}"
        )


class MetricsLogger:
    """JSONL metrics log + optional TensorBoard (the reference uses
    TensorBoardLogger, train_new.jl:14-19)."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir=os.path.join(log_dir, "tb"))
        except Exception:
            pass

    def log(self, step: int, **metrics):
        self._f.write(json.dumps({"step": step, **metrics}) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                if isinstance(v, (int, float)):
                    self._tb.add_scalar(k, v, step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


def save_checkpoint(
    path: str, params: MLPParams, config: TrainConfig, extra=None, backend: str = "pickle"
):
    """Model checkpointing (the reference saves Flux models to BSON,
    train_with_validation.jl:131,146). backend "orbax" writes an Orbax
    StandardCheckpointer directory at `path + '.orbax'` in addition to the
    pickle (SURVEY.md §5 suggests orbax-style checkpointing as the TPU
    equivalent)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(
            {
                "weights": [np.asarray(w) for w in params.weights],
                "biases": [np.asarray(b) for b in params.biases],
                "config": dataclasses.asdict(config),
                "extra": extra,
            },
            f,
        )
    if backend == "orbax":
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            os.path.abspath(path) + ".orbax",
            {"weights": list(params.weights), "biases": list(params.biases)},
            force=True,
        )
        ckptr.wait_until_finished()


def load_checkpoint(path: str) -> tuple[MLPParams, dict]:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    params = MLPParams(
        weights=tuple(jnp.asarray(w) for w in payload["weights"]),
        biases=tuple(jnp.asarray(b) for b in payload["biases"]),
    )
    return params, payload


def make_train_step(runner: MaskedGameRunner, config: TrainConfig):
    """Build the jitted end-to-end training step."""
    N = config.num_players
    ih, isd = config.input_horizon, config.input_state_dim

    def prepare_inputs(trajectories):
        # (B, N, T, 4) ground truth → (B, N·ih·isd) flattened histories
        # (train_and_test_utils.jl:467-470).
        B = trajectories.shape[0]
        return trajectories[:, :, :ih, :isd].reshape(B, -1)

    def loss_fn(params, trajectories, initial_states, goals):
        inputs = prepare_inputs(trajectories)
        masks_pred = jax.vmap(lambda h: apply_mlp(params, h))(inputs)  # (B, N-1)
        masks_pred = clamp_cotangent(masks_pred)  # ±10 solver-grad clamp
        ego = config.ego_index
        # Full mask vector: ego's own entry is 1 (parametric_masked_game_solver.jl:19).
        full_masks = jnp.concatenate(
            [jnp.ones((masks_pred.shape[0], 1), masks_pred.dtype), masks_pred], axis=1
        )
        mask_rows = runner.ego_masked_mask_rows(full_masks, ego_index=ego)
        bs = runner.solve(initial_states, goals, full_masks, mask_rows=mask_rows)
        per_example = jax.vmap(
            lambda ego_states, target_states, mask: composite_loss(
                ego_states,
                target_states,
                mask,
                horizon=config.horizon,
                input_horizon=config.input_horizon,
                weights=config.loss_weights,
            )
        )(bs.trajectories[:, ego], trajectories[:, ego], masks_pred)
        return jnp.mean(per_example), (per_example, bs.result.status)

    @jax.jit
    def train_step(params, trajectories, initial_states, goals):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, trajectories, initial_states, goals
        )
        return loss, aux, grads

    @jax.jit
    def eval_step(params, trajectories, initial_states, goals):
        loss, aux = loss_fn(params, trajectories, initial_states, goals)
        return loss, aux

    @jax.jit
    def sgd_update(params, grads, lr):
        return jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)

    return train_step, eval_step, sgd_update


def _grads_finite(grads) -> bool:
    return all(
        bool(jnp.all(jnp.isfinite(g))) for g in jax.tree_util.tree_leaves(grads)
    )


def _random_like(grads, key, scale=1.0):
    leaves, treedef = jax.tree_util.tree_flatten(grads)
    keys = jax.random.split(key, len(leaves))
    new = [scale * jax.random.normal(k, g.shape, g.dtype) for k, g in zip(keys, leaves)]
    return jax.tree_util.tree_unflatten(treedef, new)


def train(
    runner: MaskedGameRunner,
    train_dataset: list[Example],
    val_dataset: Optional[list[Example]] = None,
    *,
    config: TrainConfig = TrainConfig(),
    log_dir: Optional[str] = None,
    params: Optional[MLPParams] = None,
    verbose: bool = True,
) -> tuple[MLPParams, dict]:
    """Full training loop with validation, early stopping, checkpoints.

    Returns (best params, history dict).
    """
    log_dir = log_dir or os.path.join("logs", config.record_name)
    logger = MetricsLogger(log_dir)
    key = jax.random.PRNGKey(config.seed)

    in_size = input_size(config.num_players, config.input_horizon, config.input_state_dim)
    if params is None:
        key, sub = jax.random.split(key)
        params = init_mlp(sub, in_size, config.num_players)

    train_step, eval_step, sgd_update = make_train_step(runner, config)
    loader = DataLoader(train_dataset, config.batch_size, seed=config.seed)
    val_loader = (
        DataLoader(val_dataset, config.batch_size, seed=config.seed)
        if val_dataset
        else None
    )

    best_val = float("inf")
    patience_counter = 0
    history = {"train_loss": [], "val_loss": []}
    step = 0

    for epoch in range(config.epochs):
        epoch_losses = []
        t0 = time.time()
        for batch in loader:
            trajs, init, goals = batch_arrays(batch)
            loss, (per_example, statuses), grads = train_step(
                params, trajs, init, goals
            )
            if not _grads_finite(grads):
                # Random-gradient fallback (train_and_test_utils.jl:284-289).
                key, sub = jax.random.split(key)
                grads = _random_like(grads, sub, scale=1e-3)
            params = sgd_update(params, grads, config.learning_rate)
            epoch_losses.append(float(loss))
            step += 1
        train_loss = float(np.mean(epoch_losses)) if epoch_losses else float("nan")
        history["train_loss"].append(train_loss)

        val_loss = float("nan")
        if val_loader is not None:
            val_losses = []
            for batch in val_loader:
                trajs, init, goals = batch_arrays(batch)
                l, _ = eval_step(params, trajs, init, goals)
                val_losses.append(float(l))
            val_loss = float(np.mean(val_losses)) if val_losses else float("nan")
            history["val_loss"].append(val_loss)

        logger.log(
            epoch,
            train_loss=train_loss,
            val_loss=val_loss,
            epoch_time_s=time.time() - t0,
        )
        if verbose:
            print(
                f"epoch {epoch}: train {train_loss:.4f} val {val_loss:.4f} "
                f"({time.time() - t0:.1f}s)"
            )

        # Early stopping + best checkpoint (train_with_validation.jl:125-139).
        if val_loader is not None and val_loss < best_val:
            best_val = val_loss
            patience_counter = 0
            save_checkpoint(
                os.path.join(log_dir, "best_model.pkl"), params, config,
                extra={"epoch": epoch, "val_loss": val_loss},
            )
        elif val_loader is not None:
            patience_counter += 1
            if patience_counter >= config.patience:
                if verbose:
                    print(f"early stop at epoch {epoch}")
                break

    save_checkpoint(
        os.path.join(log_dir, "trained_model.pkl"), params, config,
        extra={"history": history},
    )
    with open(os.path.join(log_dir, "losses.json"), "w") as f:
        json.dump(history, f)
    logger.close()

    best_path = os.path.join(log_dir, "best_model.pkl")
    if os.path.exists(best_path):
        params, _ = load_checkpoint(best_path)
    return params, history
