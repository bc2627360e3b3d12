"""Masked-game solving drivers: batched open-loop solves, ground-truth data
generation, and single-scenario closed-loop simulation.

Capability parity with the reference's masked-game simulation driver
(examples/parametric_masked_game_solver.jl:1-89) and ground-truth generation
loop (examples/game_with_masks.jl:15-44). The reference replays one scenario
at a time; here whole scenario batches solve in one vmapped call — the
TPU-first redesign of the same workload.
"""

from __future__ import annotations

import dataclasses
import os
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..games import ParametricGame
from ..parallel.batch import solve_batch
from ..solver import SolverOptions
from ..trajectories import TrajectoryGame, cold_start_primal
from ..types import SolveResult
from .data import Example, Scenario, save_example
from .games import build_masked_parametric_game

Array = jax.Array


class BatchSolution(NamedTuple):
    result: SolveResult
    trajectories: Array  # (B, N, T, 4) solved state plans
    controls: Array  # (B, N, T, 2) solved control plans


@dataclasses.dataclass(frozen=True, eq=False)
class MaskedGameRunner:
    """Bundles a masked TrajectoryGame with its compiled MCP at fixed
    (N, horizon); all solves are batched and jit-cached on this instance."""

    game: TrajectoryGame
    parametric_game: ParametricGame
    N: int
    horizon: int
    # Game MCPs have Hy ≡ 0 → the n×n "schur" Newton tier is exact.
    options: SolverOptions = SolverOptions(linear_solver="schur")

    @staticmethod
    def create(
        game: TrajectoryGame, *, N: int, horizon: int, options: Optional[SolverOptions] = None
    ) -> "MaskedGameRunner":
        pg = build_masked_parametric_game(game, N=N, horizon=horizon)
        if options is None:
            # Structure-aware defaults: block-tridiagonal-in-time Newton and
            # sensitivity solves when the builder validated the structure,
            # else the doubly-condensed schur tier.
            if pg.mcp.time_structure is not None:
                options = SolverOptions(
                    linear_solver="tridiag", sensitivity_solver="tridiag"
                )
            else:
                options = SolverOptions(
                    linear_solver="schur", sensitivity_solver="condensed"
                )
        return MaskedGameRunner(
            game=game,
            parametric_game=pg,
            N=N,
            horizon=horizon,
            options=options,
        )

    # -- θ packing (parametric_masked_game_solver.jl:19) ---------------------

    def pack_thetas(self, initial_states: Array, goals: Array, masks: Array) -> Array:
        """(B,N,4), (B,N,2), (B,N) → (B, N·(N+6)) with each player's block
        [x0ᵢ; goalᵢ; maskᵢ]; the full mask vector rides in every block (the
        cost only reads mask[i]·mask[j] products, so blocks are identical —
        mirroring the reference where player 1 carries the learned mask and
        others carry ones is supported via distinct per-player mask rows)."""

        def pack_one(x0s, gls, mask_rows):
            return jnp.concatenate(
                [
                    jnp.concatenate([x0s[i], gls[i], mask_rows[i]])
                    for i in range(self.N)
                ]
            )

        return jax.vmap(pack_one)(initial_states, goals, masks)

    def ego_masked_mask_rows(self, masks: Array, *, ego_index: int = 0) -> Array:
        """(B, N) learned masks → (B, N, N) per-player mask rows: ego row =
        learned mask, others all-ones (parametric_masked_game_solver.jl:19)."""
        B = masks.shape[0]
        ones = jnp.ones((B, self.N, self.N), dtype=masks.dtype)
        return ones.at[:, ego_index, :].set(masks)

    # -- batched solving -----------------------------------------------------

    def cold_starts(self, initial_states: Array) -> Array:
        """(B, N, 4) → (B, n) zero-input-rollout primal seeds
        (examples/utils.jl:218-228)."""
        return jax.vmap(
            lambda x0s: cold_start_primal(
                self.game, self.parametric_game, self.horizon, x0s.reshape(-1)
            )
        )(initial_states)

    def solve(
        self,
        initial_states: Array,
        goals: Array,
        masks: Array,
        *,
        mask_rows: Optional[Array] = None,
        x0: Optional[Array] = None,
        y0: Optional[Array] = None,
    ) -> BatchSolution:
        """Solve a batch of masked games open-loop.

        masks: (B, N) used for every player unless explicit (B, N, N)
        mask_rows are given.
        """
        if mask_rows is None:
            mask_rows = jnp.broadcast_to(
                masks[:, None, :], (masks.shape[0], self.N, self.N)
            )
        thetas = self.pack_thetas(initial_states, goals, mask_rows)
        if x0 is None:
            x0 = self.cold_starts(initial_states)
        sol = solve_batch(
            self.parametric_game.mcp, thetas, x0=x0, y0=y0, options=self.options
        )
        trajs, ctrls = self.unpack_plans(sol.x)
        return BatchSolution(result=sol, trajectories=trajs, controls=ctrls)

    def unpack_plans(self, x: Array) -> tuple[Array, Array]:
        """Batched primal → ((B,N,T,4) states, (B,N,T,2) controls)."""
        T = self.horizon
        per_player = T * 6

        def unpack_one(xi):
            trajs, ctrls = [], []
            for i in range(self.N):
                tau = xi[i * per_player : (i + 1) * per_player]
                trajs.append(tau[: T * 4].reshape(T, 4))
                ctrls.append(tau[T * 4 :].reshape(T, 2))
            return jnp.stack(trajs), jnp.stack(ctrls)

        return jax.vmap(unpack_one)(x)

    # -- closed-loop stepping (run_example with num_sim_steps=1,
    #    turn_length=1: re-plan every step, advance to plan state 1) ---------

    def step_closed_loop(
        self,
        initial_states: Array,
        goals: Array,
        masks: Array,
        *,
        mask_rows: Optional[Array] = None,
        x0: Optional[Array] = None,
        y0: Optional[Array] = None,
    ) -> tuple[Array, Array, BatchSolution]:
        """One MPC step for a batch: solve, take each plan's state at t=1 as
        the next joint state and the control at t=0 as the applied control
        (parametric_masked_game_solver.jl:63-64)."""
        bs = self.solve(
            initial_states, goals, masks, mask_rows=mask_rows, x0=x0, y0=y0
        )
        next_states = bs.trajectories[:, :, 1, :]
        applied_controls = bs.controls[:, :, 0, :]
        return next_states, applied_controls, bs


def generate_ground_truth(
    runner: MaskedGameRunner,
    scenarios: Sequence[Scenario],
    out_dir: str,
    *,
    ego_index: int = 0,
    batch_size: int = 64,
) -> list[Example]:
    """Replay scenarios through the full (all-ones mask) game and dump one
    JSON per scenario (examples/game_with_masks.jl:25-43; the reference's
    config uses num_sim_steps=1, so the stored ground-truth trajectory is the
    solved open-loop plan)."""
    os.makedirs(out_dir, exist_ok=True)
    examples = []
    for start in range(0, len(scenarios), batch_size):
        chunk = scenarios[start : start + batch_size]
        init = jnp.asarray(
            np.stack([s.initial_states for s in chunk]), dtype=jnp.float32
        )
        goals = jnp.asarray(np.stack([s.goals for s in chunk]), dtype=jnp.float32)
        masks = jnp.ones((len(chunk), runner.N), dtype=jnp.float32)
        bs = runner.solve(init, goals, masks)
        trajs = np.asarray(bs.trajectories)
        statuses = np.asarray(bs.result.status)
        for i, scen in enumerate(chunk):
            if statuses[i] != 0:
                continue  # skip unconverged scenarios
            ex = Example(
                trajectories=trajs[i],
                ego_index=ego_index,
                initial_states=np.asarray(scen.initial_states),
                goals=np.asarray(scen.goals),
                mask=np.ones(runner.N),
            )
            save_example(
                os.path.join(out_dir, f"simulation_results_{start + i}.json"), ex
            )
            examples.append(ex)
    return examples
