"""TrajectoryGame → ParametricGame (MCP) compilation.

Parity target: the reference's build_parametric_game / build_mcp_components
(examples/utils.jl:53-178). Per-player discounted stage-cost objectives;
shared equalities = initial-state pin + dynamics defects; shared inequalities
= coupling + polygon environment + control box + state box, in the
reference's stacking order (examples/utils.jl:109-155) so solutions compare
entry-wise.

TPU-first: all per-time loops are `vmap`s over the horizon axis, so XLA sees
batched matmuls/elementwise rather than unrolled scalar chains.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..games import OptimizationProblem, ParametricGame
from .costs import TrajectoryGame
from .environment import box_constraint_fn
from .packing import trajectory_blocking, unpack_parameters, unpack_trajectory

Array = jax.Array


def build_objectives(game: TrajectoryGame, horizon: int):
    """Per-player objective closures over the flat joint primal
    (reference examples/utils.jl:96-106)."""
    N = game.num_players
    gamma = game.cost.discount_factor

    def make_objective(i):
        stage_cost = game.cost.stage_costs[i]

        def objective(taus, theta_i):
            trajs = unpack_trajectory(taus, dynamics=game.dynamics, horizon=horizon)
            xs = tuple(t.xs for t in trajs)  # each (T, sd_i)
            us = tuple(t.us for t in trajs)
            ts = jnp.arange(horizon)
            per_stage = jax.vmap(
                lambda x_t, u_t, t: stage_cost(x_t, u_t, t, theta_i)
            )(xs, us, ts)
            discount = gamma ** ts.astype(per_stage.dtype)
            return game.cost.reducer(discount * per_stage)

        return objective

    return [make_objective(i) for i in range(N)]


def build_shared_equality(game: TrajectoryGame, horizon: int):
    """Initial-state pin + dynamics defects (examples/utils.jl:109-123).
    Row order: joint initial-state residual, then per time step the joint
    defect x_t − f(x_{t−1}, u_{t−1})."""

    def shared_equality(taus, thetas):
        trajs = unpack_trajectory(taus, dynamics=game.dynamics, horizon=horizon)
        X = jnp.concatenate([t.xs for t in trajs], axis=1)  # (T, sd_total)
        U = jnp.concatenate([t.us for t in trajs], axis=1)  # (T, cd_total)
        initial_blocks, _ = unpack_parameters(thetas, dynamics=game.dynamics)
        g1 = X[0] - jnp.concatenate(initial_blocks)
        pred = jax.vmap(game.dynamics)(X[:-1], U[:-1])
        g2 = (X[1:] - pred).reshape(-1)
        return jnp.concatenate([g1, g2])

    return shared_equality


def build_shared_inequality(game: TrajectoryGame, horizon: int):
    """Coupling + environment + control box + state box rows, in the
    reference's order (examples/utils.jl:126-155)."""
    dynamics = game.dynamics
    N = game.num_players
    control_box = box_constraint_fn(*dynamics.control_bounds)
    state_box = box_constraint_fn(*dynamics.state_bounds)
    env = game.env

    def shared_inequality(taus, thetas):
        trajs = unpack_trajectory(taus, dynamics=game.dynamics, horizon=horizon)
        xs = tuple(t.xs for t in trajs)
        us = tuple(t.us for t in trajs)
        X = jnp.concatenate(xs, axis=1)  # (T, sd_total)
        U = jnp.concatenate(us, axis=1)

        parts = []
        if game.coupling_constraints is not None:
            parts.append(game.coupling_constraints(xs, us, thetas).reshape(-1))
        if env is not None:
            # Per time, per player, per polygon edge (examples/utils.jl:131-134).
            def env_rows(x_joint_t):
                blocks = dynamics.state_blocking.split(x_joint_t)
                return jnp.concatenate(
                    [env.position_constraints(b[:2]) for b in blocks]
                )

            parts.append(jax.vmap(env_rows)(X).reshape(-1))
        if control_box.num_constraints:
            parts.append(jax.vmap(control_box)(U).reshape(-1))
        if state_box.num_constraints:
            parts.append(jax.vmap(state_box)(X).reshape(-1))
        if not parts:
            return jnp.zeros((0,), dtype=X.dtype)
        return jnp.concatenate(parts)

    return shared_inequality


def build_time_structure(game: TrajectoryGame, horizon: int):
    """Time-major permutation of the unconstrained variables [τ; λ̃].

    Block t gathers [x_{i,t} ∀i; u_{i,t} ∀i; λ̃ rows of step t] where λ̃
    block 0 is the initial-state pin and block t≥1 the dynamics defect at t
    (row order of build_shared_equality). Stage costs and per-time
    inequality rows couple only within a block and defect duals couple
    adjacent blocks, so the schur-condensed Newton matrix becomes block
    tridiagonal in this ordering (SURVEY.md §5).
    """
    import numpy as np

    from ..kernels.block_tridiag import TimeStructure

    dynamics = game.dynamics
    N = dynamics.num_players
    sd = [dynamics.state_dim(i) for i in range(N)]
    cd = [dynamics.control_dim(i) for i in range(N)]
    sd_total, cd_total = sum(sd), sum(cd)
    T = horizon
    b = sd_total + cd_total + sd_total

    player_offsets = np.cumsum([0] + [T * (sd[i] + cd[i]) for i in range(N)])
    nx = int(player_offsets[-1])

    perm = []
    for t in range(T):
        for i in range(N):  # states at t
            base = player_offsets[i] + t * sd[i]
            perm.extend(range(base, base + sd[i]))
        for i in range(N):  # controls at t
            base = player_offsets[i] + T * sd[i] + t * cd[i]
            perm.extend(range(base, base + cd[i]))
        # λ̃ rows for step t (initial pin at t=0, defect t otherwise)
        base = nx + t * sd_total
        perm.extend(range(base, base + sd_total))
    return TimeStructure(permutation=tuple(perm), num_blocks=T, block_size=b)


def build_row_time_structure(pg: ParametricGame, structure):
    """Assign each inequality row to a time block by the numeric support of
    its Hx row and Gy column at a pseudo-random point. Rows with empty
    support (constant constraints, e.g. the masked games' trivial coupling
    rows) contribute nothing to the schur reduction and are distributed to
    balance block counts. Returns (row_permutation, rows_per_block) or None
    when rows straddle blocks / counts aren't uniform."""
    import numpy as np

    mcp = pg.mcp
    n, m = mcp.unconstrained_dimension, mcp.constrained_dimension
    T, b = structure.num_blocks, structure.block_size
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    x = 0.1 * jax.random.normal(k1, (n,))
    y = 1.0 + 0.1 * jax.random.uniform(k2, (m,))
    theta = 0.1 * jax.random.normal(k3, (sum(pg.dims.theta),))
    _, _, _, Gy, Hx, _ = (np.asarray(a) for a in mcp.gh_linearized(x, y, theta))

    # time block of each unconstrained index
    blk_of_col = np.empty(n, dtype=np.int64)
    blk_of_col[np.asarray(structure.permutation)] = np.arange(n) // b

    tol = 1e-10
    assignment = np.full(m, -1, dtype=np.int64)
    for r in range(m):
        support = np.flatnonzero(
            (np.abs(Hx[r]) > tol) | (np.abs(Gy[:, r]) > tol)
        )
        if support.size == 0:
            continue  # constant row; fill later
        blocks = np.unique(blk_of_col[support])
        if blocks.size > 1:
            return None
        assignment[r] = blocks[0]

    counts = np.bincount(assignment[assignment >= 0], minlength=T)
    free_rows = np.flatnonzero(assignment < 0)
    if counts.max() * T > m:
        return None  # can't make uniform even with free rows
    mt = m // T
    if m % T != 0 or counts.max() > mt:
        return None
    # Distribute free rows to fill every block to mt.
    fi = 0
    for t in range(T):
        need = mt - counts[t]
        assignment[free_rows[fi : fi + need]] = t
        fi += need
    if fi != free_rows.size:
        return None

    row_perm = np.concatenate([np.flatnonzero(assignment == t) for t in range(T)])
    return tuple(int(i) for i in row_perm), int(mt)


def validate_time_structure(pg: ParametricGame, structure) -> float:
    """One-time numeric bandwidth check: off-tridiagonal mass of the schur
    matrix at a pseudo-random point (returns the max |off-band| entry)."""
    import numpy as np

    from ..linalg import _schur_system

    mcp = pg.mcp
    n, m = mcp.unconstrained_dimension, mcp.constrained_dimension
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = 0.1 * jax.random.normal(k1, (n,))
    y = 1.0 + 0.1 * jax.random.uniform(k2, (m,))
    s = 1.0 + 0.1 * jax.random.uniform(k3, (m,))
    theta = 0.1 * jax.random.normal(k4, (sum(pg.dims.theta),))
    g, h, Gx, Gy, Hx, Hy = mcp.gh_linearized(x, y, theta)
    A, *_ = _schur_system(Gx, Gy, Hx, y, s, g, h - s, s * y - 0.1, 1e-4)
    perm = np.asarray(structure.permutation)
    A_perm = np.asarray(A)[perm][:, perm]
    T, b = structure.num_blocks, structure.block_size
    A4 = A_perm.reshape(T, b, T, b).transpose(0, 2, 1, 3)  # (T, T, b, b)
    mask = np.abs(np.arange(T)[:, None] - np.arange(T)[None, :]) > 1
    return float(np.max(np.abs(A4[mask])) if mask.any() else 0.0)


def build_parametric_game(
    *,
    game: TrajectoryGame,
    horizon: int = 10,
    params_per_player: int = 0,  # not counting the initial state, which is always a param
    compute_sensitivities: bool = True,
    time_structure: bool = True,
    affine_bands: bool = True,
) -> ParametricGame:
    """Compile a TrajectoryGame into a ParametricGame/MCP
    (reference examples/utils.jl:53-84, :157-178).

    When `time_structure` is set (default), the time-major block-tridiagonal
    reordering of the Newton system is computed, numerically validated at a
    test point, and attached to the MCP — enabling the "tridiag" linear
    solver tier. Games with cross-time couplings fail validation and simply
    don't get the structure (dense tiers still apply).

    When `affine_bands` is set (default) and the banded Jacobian probes as
    affine in the iterate and θ-independent (quadratic games: lane-change),
    its exact precomputed decomposition is attached too — the per-iteration
    linearize then costs one residual evaluation (block_tridiag.AffineBands).
    Non-quadratic games fail the probe and keep the colored-seed path.
    """
    import os
    import sys
    import time as _time

    _trace = os.environ.get("MCPTPU_BUILD_TRACE")
    _t0 = _time.perf_counter()

    def _mark(step: str) -> None:
        if _trace:
            print(
                f"[build +{_time.perf_counter() - _t0:6.1f}s] {step}",
                file=sys.stderr,
                flush=True,
            )

    dynamics = game.dynamics
    N = game.num_players
    primal_blocking = trajectory_blocking(dynamics, horizon)

    objectives = build_objectives(game, horizon)
    problems = [OptimizationProblem(objective=f) for f in objectives]

    test_point = [jnp.zeros(s) for s in primal_blocking.sizes]
    test_parameter = [
        jnp.zeros(dynamics.state_dim(i) + params_per_player) for i in range(N)
    ]

    _mark("objectives/constraints built; creating ParametricGame (game_to_mcp)")
    pg = ParametricGame.create(
        test_point=test_point,
        test_parameter=test_parameter,
        problems=problems,
        shared_equality=build_shared_equality(game, horizon),
        shared_inequality=build_shared_inequality(game, horizon),
        compute_sensitivities=compute_sensitivities,
    )

    _mark("ParametricGame created")
    if time_structure:
        from ..utils.devices import probes_on_cpu

        structure = build_time_structure(game, horizon)
        n = pg.mcp.unconstrained_dimension
        if len(structure.permutation) == n:
            # All numeric validation probes run on the CPU backend when one
            # is available (utils/devices.py): each probe is a separate
            # program, and compiling them through the axon TPU tunnel cost
            # ~360 s of the driver bench's 387 s wall-clock (round-4
            # measurement) for what is milliseconds of host compute.
            with probes_on_cpu():
                offband = validate_time_structure(pg, structure)
                _mark("time-structure bandwidth validated")
                if offband < 1e-8:
                    import dataclasses as _dc

                    rows = build_row_time_structure(pg, structure)
                    _mark("row time structure assigned")
                    if rows is not None:
                        structure = structure._replace(
                            row_permutation=rows[0], rows_per_block=rows[1]
                        )
                    mcp = _dc.replace(pg.mcp, time_structure=structure)
                    if affine_bands and structure.row_permutation is not None:
                        from ..kernels.block_tridiag import build_affine_bands

                        ab = build_affine_bands(
                            mcp, structure, sum(pg.dims.theta)
                        )
                        _mark("affine bands probed/built")
                        if ab is not None:
                            mcp = _dc.replace(mcp, affine_bands=ab)
                    pg = ParametricGame(
                        problems=pg.problems,
                        shared_equality=pg.shared_equality,
                        shared_inequality=pg.shared_inequality,
                        dims=pg.dims,
                        mcp=mcp,
                    )
    _mark("build done")
    return pg
