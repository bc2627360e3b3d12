"""Horizon-sharded block-tridiagonal solve over a device mesh (SURVEY.md §5:
the "ring-attention analog" for trajectory-game KKT systems).

The reference factors the whole horizon on one CPU (UMFPACK LU,
src/solver.jl:81-90); the single-chip tiers here already reduce that to a
time-major block-tridiagonal sweep (kernels/block_tridiag.py). This module
distributes that sweep across a `("horizon",)` mesh axis — the domain's
sequence-parallelism: a game too long (or too many-player) for one chip's
HBM/FLOPs is split into T/D contiguous time slabs, one per device.

Algorithm: partitioned Schur complement (SPIKE; the block-structured cousin
of cyclic reduction — SURVEY.md §2.4 sanctions either):

  1. Each device solves its local slab against 1 + 2b right-hand sides
     [r | e₀⊗L_bound | e_last⊗U_bound] with one multi-RHS block-Thomas
     sweep: x_loc = v − W_L·x_lastᵈ⁻¹ − W_R·x_firstᵈ⁺¹.
  2. First/last rows of that identity give a *reduced* block-tridiagonal
     system in the 2b-sized interface unknowns wᵈ = [x_firstᵈ; x_lastᵈ]:
     D blocks instead of T. The six (b,·) interface quantities are
     `all_gather`ed over ICI (the only communication: O(D·b²) bytes) and
     the reduced system is solved redundantly on every device.
  3. Each device reads its neighbors' interface values from the replicated
     reduced solution and back-substitutes locally — no second exchange.

Cost: T/D·b³ local work per device + D·(2b)³ redundant reduced solve; the
speedup condition is 8·D² ≪ T (long horizons — exactly the regime where one
device runs out). The all_gather is one latency hop; no per-level ppermute
chain like textbook distributed cyclic reduction, which matters on ICI where
latency, not bandwidth, would dominate log₂T exchanges of b² blocks.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..kernels.block_tridiag import block_thomas_solve, block_thomas_solve_multi

Array = jax.Array

HORIZON_AXIS = "horizon"


def _local_multi_solve(diag, lower, upper, R):
    """The SPIKE local multi-RHS slab solve. On TPU with a lane-packable row
    (3b + k ≤ 128) this is the fused Pallas sweep — one VMEM-resident
    pallas_call instead of Tl sequential b×b LU dispatches (VERDICT r2 #5:
    the kernels are the whole single-chip story, so the distributed path
    must run them too). Elsewhere (CPU virtual meshes, wide blocks) the XLA
    slab keeps the machine-precision-tested path."""
    b = diag.shape[-1]
    k = R.shape[-1]
    if jax.devices()[0].platform == "tpu" and 3 * b + k <= 128:
        from ..kernels.thomas_pallas import thomas_solve_multi

        return thomas_solve_multi(diag, lower, upper, R)
    return block_thomas_solve_multi(diag, lower, upper, R)


def make_horizon_mesh(devices=None, *, axis_name: str = HORIZON_AXIS) -> Mesh:
    """1-D mesh over all (or given) devices for horizon-parallel solving."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def make_dp_horizon_mesh(
    dp: int,
    horizon: int,
    devices=None,
    *,
    batch_axis: str = "dp",
    axis_name: str = HORIZON_AXIS,
) -> Mesh:
    """2-D ``(dp, horizon)`` mesh: batch-parallel groups of horizon-parallel
    device teams — the production topology for a batch of games each too
    large for one chip. The horizon axis is the *minor* (fastest-varying)
    axis so each team's interface all_gathers ride adjacent-ICI links."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    if dp * horizon != len(devices):
        raise ValueError(
            f"mesh shape ({dp}, {horizon}) needs {dp * horizon} devices, "
            f"got {len(devices)}"
        )
    return Mesh(
        np.asarray(devices).reshape(dp, horizon), (batch_axis, axis_name)
    )


def _local_spike(diag, lower_int, L_bound, upper_int, U_bound, rhs, *, axis_name):
    """Device-local SPIKE stage. Shapes (leading local-shard axis of size 1
    already squeezed): diag (Tl, b, b), lower_int/upper_int (Tl-1, b, b),
    L_bound/U_bound (b, b), rhs (Tl, b). Returns the local x (Tl, b)."""
    Tl, b, _ = diag.shape
    dtype = diag.dtype

    # 1. Local multi-RHS sweep: columns [r | e₀⊗L_bound | e_last⊗U_bound].
    R = jnp.zeros((Tl, b, 1 + 2 * b), dtype)
    R = R.at[:, :, 0].set(rhs)
    R = R.at[0, :, 1 : 1 + b].set(L_bound)
    R = R.at[Tl - 1, :, 1 + b :].set(U_bound)
    X = _local_multi_solve(diag, lower_int, upper_int, R)
    v = X[:, :, 0]  # (Tl, b)
    WL = X[:, :, 1 : 1 + b]  # (Tl, b, b)
    WR = X[:, :, 1 + b :]  # (Tl, b, b)

    # 2. Interface exchange: gather the six boundary quantities.
    vf, vl = lax.all_gather(v[0], axis_name), lax.all_gather(v[-1], axis_name)
    WLf, WLl = lax.all_gather(WL[0], axis_name), lax.all_gather(WL[-1], axis_name)
    WRf, WRl = lax.all_gather(WR[0], axis_name), lax.all_gather(WR[-1], axis_name)
    D = vf.shape[0]

    # Reduced block-tridiagonal system in wᵈ = [x_firstᵈ; x_lastᵈ]:
    #   wᵈ + [0 WLf; 0 WLl]ᵈ wᵈ⁻¹ + [WRf 0; WRl 0]ᵈ wᵈ⁺¹ = [vf; vl]ᵈ
    # (couplings to nonexistent neighbors vanish because the edge devices'
    # L_bound/U_bound are zero, hence WL/WR ≡ 0 there).
    eye2b = jnp.broadcast_to(jnp.eye(2 * b, dtype=dtype), (D, 2 * b, 2 * b))
    zero_half = jnp.zeros((D - 1, b, b), dtype)
    lower_r = jnp.concatenate(
        [
            jnp.concatenate([zero_half, WLf[1:]], axis=-1),
            jnp.concatenate([zero_half, WLl[1:]], axis=-1),
        ],
        axis=1,
    )  # (D-1, 2b, 2b)
    upper_r = jnp.concatenate(
        [
            jnp.concatenate([WRf[:-1], zero_half], axis=-1),
            jnp.concatenate([WRl[:-1], zero_half], axis=-1),
        ],
        axis=1,
    )
    rhs_r = jnp.concatenate([vf, vl], axis=-1)  # (D, 2b)
    w = block_thomas_solve(eye2b, lower_r, upper_r, rhs_r)  # (D, 2b), replicated

    # 3. Local back-substitution with the neighbors' interface values
    # (index clamps are safe: the matching W is zero at the edges).
    d = lax.axis_index(axis_name)
    x_prev_last = lax.dynamic_index_in_dim(
        w, jnp.maximum(d - 1, 0), keepdims=False
    )[b:]
    x_next_first = lax.dynamic_index_in_dim(
        w, jnp.minimum(d + 1, D - 1), keepdims=False
    )[:b]
    return v - WL @ x_prev_last - WR @ x_next_first


@functools.lru_cache(maxsize=None)
def _sharded_tridiag_solver(mesh: Mesh, axis_name: str):
    spec = P(axis_name)

    def packed_solve(diag, lower_pad, upper_pad, rhs):
        # Local shards carry a leading device axis of size 1.
        def squeeze(a):
            return a[0]

        x = _local_spike(
            squeeze(diag),
            squeeze(lower_pad)[1:],
            squeeze(lower_pad)[0],
            squeeze(upper_pad)[:-1],
            squeeze(upper_pad)[-1],
            squeeze(rhs),
            axis_name=axis_name,
        )
        return x[None]

    fn = jax.shard_map(
        packed_solve,
        mesh=mesh,
        # The Thomas scans carry fresh zero constants alongside sharded
        # values; skip the varying-manual-axes consistency check rather than
        # pcast every constant (same rationale as mesh._sharded_solver).
        check_vma=False,
        in_specs=(spec, spec, spec, spec),
        out_specs=spec,
    )
    return jax.jit(fn)


def _spike_replicated(diag, lower, upper, rhs, *, axis_name, num_devices):
    """SPIKE solve for *replicated* global operands inside an existing
    shard_map context: each device dynamic-slices its time slab by
    axis_index, runs the local stage, and the solution is re-assembled with
    one all_gather. Used as the `tridiag_solver` callable inside the
    horizon-sharded interior-point solve, where residual/band assembly is
    replicated (it is O(T·b²), dwarfed by the O(T·b³) factorization being
    distributed)."""
    T, b, _ = diag.shape
    Tl = T // num_devices
    dtype = diag.dtype
    zero = jnp.zeros((1, b, b), dtype)
    lower_pad = jnp.concatenate([zero, lower], axis=0)  # [t] couples t→t-1
    upper_pad = jnp.concatenate([upper, zero], axis=0)  # [t] couples t→t+1
    t0 = lax.axis_index(axis_name) * Tl
    diag_l = lax.dynamic_slice_in_dim(diag, t0, Tl)
    low_l = lax.dynamic_slice_in_dim(lower_pad, t0, Tl)
    up_l = lax.dynamic_slice_in_dim(upper_pad, t0, Tl)
    rhs_l = lax.dynamic_slice_in_dim(rhs, t0, Tl)
    x_loc = _local_spike(
        diag_l, low_l[1:], low_l[0], up_l[:-1], up_l[-1], rhs_l,
        axis_name=axis_name,
    )
    return lax.all_gather(x_loc, axis_name).reshape(T, b)


@functools.lru_cache(maxsize=None)
def _sharded_ip_solver(mcp, options, mesh: Mesh, axis_name: str):
    from ..diff import _solve_ts
    from ..types import SolveResult

    D = int(mesh.devices.size)
    solver_fn = functools.partial(
        _spike_replicated, axis_name=axis_name, num_devices=D
    )

    def replicated(theta, x0, y0, s0):
        # _solve_ts: differentiable (IFT custom_jvp) with every Newton AND
        # sensitivity block-tridiagonal solve SPIKE-distributed over the mesh.
        return _solve_ts(mcp, options, solver_fn, None, theta, x0, y0, s0)

    rep = P()
    fn = jax.shard_map(
        replicated,
        mesh=mesh,
        check_vma=False,
        in_specs=(rep, rep, rep, rep),
        out_specs=SolveResult(
            x=rep, y=rep, s=rep, kkt_error=rep, epsilon=rep,
            outer_iters=rep, status=rep,
        ),
    )
    return jax.jit(fn)


def horizon_sharded_solve_fn(
    mcp,
    *,
    mesh: Optional[Mesh] = None,
    axis_name: str = HORIZON_AXIS,
    options=None,
    **option_overrides,
):
    """Return the jitted DIFFERENTIABLE horizon-sharded solve callable
    ``(theta, x0, y0, s0) -> SolveResult``: jax.grad/jvp through it uses the
    IFT custom rule with the sensitivity block-tridiagonal solves
    SPIKE-distributed over the same mesh (set
    ``sensitivity_solver="tridiag"`` to keep the backward pass banded).
    Same validation as `solve_horizon_sharded`."""
    import dataclasses

    from ..solver import SolverOptions, _TRIDIAG_TIERS

    if options is None:
        options = SolverOptions(linear_solver="tridiag", **option_overrides)
    elif option_overrides:
        options = dataclasses.replace(options, **option_overrides)
    if options.linear_solver not in _TRIDIAG_TIERS:
        raise ValueError(
            "solve_horizon_sharded requires a tridiag-family linear_solver"
        )
    ts = mcp.time_structure
    if ts is None:
        raise ValueError("MCP has no time_structure (not a trajectory game)")
    if mesh is None:
        mesh = make_horizon_mesh(axis_name=axis_name)
    D = int(mesh.devices.size)
    T = ts.num_blocks
    if T % D != 0 or T // D < 2:
        raise ValueError(
            f"horizon {T} must be a multiple of the mesh size {D} with at "
            "least 2 blocks per device"
        )
    return _sharded_ip_solver(mcp, options, mesh, axis_name)


def solve_horizon_sharded(
    mcp,
    theta: Array,
    *,
    mesh: Optional[Mesh] = None,
    axis_name: str = HORIZON_AXIS,
    x0: Optional[Array] = None,
    y0: Optional[Array] = None,
    s0: Optional[Array] = None,
    options=None,
    **option_overrides,
):
    """Full interior-point solve of ONE large trajectory-game MCP with the
    horizon axis of every Newton factorization distributed over the mesh —
    the tensor-parallel counterpart of `mesh.solve_batch_sharded`'s data
    parallelism (SURVEY.md §2.4: TP/SP axes).

    The IP loop itself runs replicated (identical on every device —
    iterates are O(T·b) and assembly O(T·b²)); each inner Newton solve
    dynamic-slices the band blocks per device, factors its T/D slab, and
    exchanges only the 2b-sized interface blocks (see module docstring).
    Requires `options.linear_solver` in the tridiag family and
    T divisible by the mesh size with T/D ≥ 2."""
    import dataclasses

    from ..solver import SolverOptions, _TRIDIAG_TIERS, default_initialization

    if options is None:
        options = SolverOptions(linear_solver="tridiag", **option_overrides)
    elif option_overrides:
        options = dataclasses.replace(options, **option_overrides)
    if options.linear_solver not in _TRIDIAG_TIERS:
        raise ValueError(
            "solve_horizon_sharded requires a tridiag-family linear_solver"
        )
    ts = mcp.time_structure
    if ts is None:
        raise ValueError("MCP has no time_structure (not a trajectory game)")
    if mesh is None:
        mesh = make_horizon_mesh(axis_name=axis_name)
    D = int(mesh.devices.size)
    T = ts.num_blocks
    if T % D != 0 or T // D < 2:
        raise ValueError(
            f"horizon {T} must be a multiple of the mesh size {D} with at "
            "least 2 blocks per device"
        )
    theta = jnp.asarray(theta)
    x0, y0, s0 = default_initialization(mcp, theta, x0, y0, s0)
    return _sharded_ip_solver(mcp, options, mesh, axis_name)(theta, x0, y0, s0)


@functools.lru_cache(maxsize=None)
def _sharded_batch_ip_solver(
    mcp, options, mesh: Mesh, batch_axis: str, axis_name: str
):
    from ..diff import _solve_ts
    from ..types import SolveResult

    D = int(mesh.shape[axis_name])
    solver_fn = functools.partial(
        _spike_replicated, axis_name=axis_name, num_devices=D
    )

    def local(thetas, x0, y0, s0):
        # Local batch slice (replicated along the horizon axis); every
        # instance's Newton factorizations are SPIKE-distributed over the
        # horizon teammates. vmap and the collective commute: the batch axis
        # is unrelated to the gathered interface axis. Differentiable (IFT
        # custom_jvp with the sensitivity solves SPIKE-distributed too).
        return jax.vmap(
            lambda t, x, y, s: _solve_ts(mcp, options, solver_fn, None, t, x, y, s)
        )(thetas, x0, y0, s0)

    bspec = P(batch_axis)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        check_vma=False,
        in_specs=(bspec, bspec, bspec, bspec),
        out_specs=SolveResult(
            x=bspec, y=bspec, s=bspec, kkt_error=bspec, epsilon=bspec,
            outer_iters=bspec, status=bspec,
        ),
    )
    return jax.jit(fn)


def solve_batch_horizon_sharded(
    mcp,
    thetas: Array,
    *,
    mesh: Mesh,
    batch_axis: str = "dp",
    axis_name: str = HORIZON_AXIS,
    x0: Optional[Array] = None,
    y0: Optional[Array] = None,
    s0: Optional[Array] = None,
    options=None,
    **option_overrides,
):
    """Composed dp × horizon solve: a BATCH of large trajectory-game MCPs,
    batch-sharded over ``batch_axis`` while every instance's Newton
    factorizations are horizon-sharded over ``axis_name`` (SURVEY.md §2.4:
    DP and the SP analog on one 2-D mesh — e.g. 16 chips as 8 dp-groups of
    2-chip horizon teams). Requires a mesh from `make_dp_horizon_mesh` (or
    any mesh carrying both axes), batch divisible by the dp size, and the
    game horizon divisible by the horizon-axis size with ≥ 2 blocks per
    device."""
    import dataclasses

    from ..solver import SolverOptions, _TRIDIAG_TIERS

    if options is None:
        options = SolverOptions(linear_solver="tridiag", **option_overrides)
    elif option_overrides:
        options = dataclasses.replace(options, **option_overrides)
    if options.linear_solver not in _TRIDIAG_TIERS:
        raise ValueError(
            "solve_batch_horizon_sharded requires a tridiag-family linear_solver"
        )
    ts = mcp.time_structure
    if ts is None:
        raise ValueError("MCP has no time_structure (not a trajectory game)")
    D = int(mesh.shape[axis_name])
    T = ts.num_blocks
    if T % D != 0 or T // D < 2:
        raise ValueError(
            f"horizon {T} must be a multiple of the horizon-axis size {D} "
            "with at least 2 blocks per device"
        )
    thetas = jnp.asarray(thetas)
    B = thetas.shape[0]
    dp = int(mesh.shape[batch_axis])
    if B % dp != 0:
        raise ValueError(f"batch size {B} must be divisible by dp size {dp}")
    n, m = mcp.unconstrained_dimension, mcp.constrained_dimension
    dtype = thetas.dtype
    if x0 is None:
        x0 = jnp.zeros((B, n), dtype)
    if y0 is None:
        y0 = jnp.ones((B, m), dtype)
    if s0 is None:
        s0 = jnp.ones((B, m), dtype)

    sharding = NamedSharding(mesh, P(batch_axis))
    thetas, x0, y0, s0 = (
        jax.device_put(a, sharding) for a in (thetas, x0, y0, s0)
    )
    return _sharded_batch_ip_solver(mcp, options, mesh, batch_axis, axis_name)(
        thetas, x0, y0, s0
    )


def horizon_sharded_tridiag_solve(
    diag: Array,
    lower: Array,
    upper: Array,
    rhs: Array,
    *,
    mesh: Optional[Mesh] = None,
    axis_name: str = HORIZON_AXIS,
) -> Array:
    """Distributed solve of a global block-tridiagonal system.

    diag (T, b, b), lower/upper (T-1, b, b), rhs (T, b) → x (T, b), with the
    T axis sharded in contiguous slabs over the mesh. Requires T divisible
    by the mesh size with T/D ≥ 2. Numerically equivalent to
    `block_thomas_solve` (tested on the virtual CPU mesh)."""
    if mesh is None:
        mesh = make_horizon_mesh(axis_name=axis_name)
    D = mesh.devices.size
    T, b, _ = diag.shape
    if T % D != 0 or T // D < 2:
        raise ValueError(
            f"horizon length {T} must be a multiple of the mesh size {D} "
            "with at least 2 blocks per device"
        )
    Tl = T // D
    zero = jnp.zeros((1, b, b), diag.dtype)
    # lower_pad[t] couples row t to t-1 (zero for t=0); device d's slab then
    # holds [L_bound; interior lowers]. upper_pad[t] couples row t to t+1
    # (zero for t=T-1); the slab holds [interior uppers; U_bound].
    lower_pad = jnp.concatenate([zero, lower], axis=0).reshape(D, Tl, b, b)
    upper_pad = jnp.concatenate([upper, zero], axis=0).reshape(D, Tl, b, b)
    diag_p = diag.reshape(D, Tl, b, b)
    rhs_p = jnp.asarray(rhs).reshape(D, Tl, b)

    sharding = NamedSharding(mesh, P(axis_name))
    diag_p, lower_pad, upper_pad, rhs_p = (
        jax.device_put(a, sharding) for a in (diag_p, lower_pad, upper_pad, rhs_p)
    )
    x = _sharded_tridiag_solver(mesh, axis_name)(diag_p, lower_pad, upper_pad, rhs_p)
    return x.reshape(T, b)
