"""Tensor parallelism: shard ONE Newton factorization across devices.

The reference factorizes every Newton system on a single CPU core (UMFPACK,
src/solver.jl:50,81-83). The batch (dp) and horizon (sp) meshes cover the
throughput and long-horizon axes; what remained (VERDICT r2, P-TP) is the
very-large-SINGLE-game regime SURVEY.md §2.4 flags: one KKT system too big
(or too latency-critical) for one device's factorization throughput.

Design — distributed right-looking blocked LU with partial pivoting over a
1-D ``("tp",)`` mesh, the ScaLAPACK layout re-expressed in shard_map:

* The (n, n) matrix lives block-COLUMN-sharded: device d holds the
  contiguous column slab ``A[:, d·C:(d+1)·C]`` (C = n/D). The RHS is
  replicated.
* Per panel of ``nb`` columns: the owner broadcasts its current panel (one
  ``psum`` of a one-hot contribution — n·nb floats over ICI); EVERY device
  then runs the small restricted pivoted panel LU redundantly (cheaper than
  a second broadcast of its results) and applies the row permutation +
  rank-nb trailing update to its own slab columns on the MXU. O(n³/D)
  update FLOPs per device, O(n·nb) bytes per panel on the wire.
* Pivoting is restricted to the active rows (≥ panel offset) by rolling
  the panel and zero-masking finished rows before ``lax.linalg.lu`` — a
  zero row is never selected as a pivot of a nonsingular panel, so the
  permutation provably fixes every finished row (LAPACK swaps touch only
  the first nb positions and their |max| pivot rows).
* Back-substitution keeps x replicated: each block row's inner products
  against later columns are computed where those columns live and
  ``psum``-reduced; the diagonal block is broadcast like a panel (nb² on
  the wire per block).

Everything is fixed-shape (`lax.fori_loop` over panels) and jit-safe; the
kernel of each step is an MXU matmul (dims padded to the 128-lane tile by
XLA). Matmuls run at HIGHEST precision — a solver building block must not
inherit bf16 default precision (DESIGN.md bf16 trap).

`TPNewtonBackend` plugs this into the interior-point loop through the
``newton_solver`` injection point (solver.py ip_solve / diff._solve_ts),
mirroring how the SPIKE horizon solve injects via ``tridiag_solver``;
`solve_single_tp` is the user entry: one game, one mesh, every Newton
factorization sharded, differentiable via the IFT custom rule (condensed
sensitivities shard the backward core solves too).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..mcp import PrimalDualMCP
from ..solver import SolverOptions
from ..types import SolveResult

Array = jax.Array

TP_AXIS = "tp"

_HI = lax.Precision.HIGHEST


def make_tp_mesh(devices=None, *, axis_name: str = TP_AXIS) -> Mesh:
    """1-D mesh over all (or given) devices for tensor-parallel solves."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def padded_dimension(n: int, num_devices: int, panel: int) -> int:
    """Smallest n' ≥ n with n' a multiple of num_devices·panel (so every
    panel lives entirely on one device's contiguous column slab)."""
    q = num_devices * panel
    return -(-n // q) * q


def lu_solve_tp_local(
    A_loc: Array,
    b: Array,
    *,
    axis_name: str = TP_AXIS,
    num_devices: int,
    panel: int = 64,
) -> Array:
    """Solve A x = b with A block-column-sharded — call INSIDE shard_map.

    Args:
      A_loc: (n, C) this device's contiguous column slab, C = n/num_devices.
        n must be a multiple of num_devices·panel (pad with an identity
        tail, see `lu_solve_tp`). A must be nonsingular (the IP Newton
        matrix is Tikhonov-regularized, solver.py); pivoting is partial.
      b: (n,) replicated right-hand side.
    Returns x: (n,) replicated.
    """
    n, C = A_loc.shape
    nb = panel
    if C * num_devices != n or C % nb != 0:
        raise ValueError(
            f"column slab {C}x{num_devices} devices must tile n={n} in "
            f"whole {nb}-column panels"
        )
    num_panels = n // nb
    dtype = A_loc.dtype
    i32 = jnp.int32
    idx = lax.axis_index(axis_name).astype(i32)
    col0 = idx * C
    cols_global = col0 + jnp.arange(C, dtype=i32)
    rows = jnp.arange(n)

    def broadcast_panel(A_loc, j0):
        """psum one-hot broadcast of the owner's (n, nb) panel."""
        local_start = j0 - col0
        is_owner = (local_start >= 0) & (local_start < C)
        pl = lax.dynamic_slice(
            A_loc, (i32(0), jnp.clip(local_start, 0, C - nb)), (n, nb)
        )
        return (
            lax.psum(jnp.where(is_owner, pl, jnp.zeros_like(pl)), axis_name),
            is_owner,
            local_start,
        )

    def fwd_body(p, carry):
        A_loc, b = carry
        j0 = (p * nb).astype(i32) if hasattr(p, "astype") else i32(p * nb)
        pl, is_owner, local_start = broadcast_panel(A_loc, j0)

        # Restricted pivoted LU of the active rows (>= j0): roll the panel
        # so active rows lead, zero the finished (wrapped) rows. Finished
        # rows are provably fixed points of the resulting permutation.
        rolled = jnp.roll(pl, -j0, axis=0)
        active = rows < (n - j0)
        lu, _, perm = lax.linalg.lu(jnp.where(active[:, None], rolled, 0.0))
        L11 = jnp.tril(lu[:nb, :nb], -1) + jnp.eye(nb, dtype=dtype)
        U11 = jnp.triu(lu[:nb, :nb])
        L21 = lu[nb:, :]  # multipliers; zero on finished rows

        # Replicated RHS update (redundant on every device — n·nb FLOPs,
        # cheaper than broadcasting the owner's result).
        brp = jnp.roll(b, -j0)[perm]
        y1 = jax.scipy.linalg.solve_triangular(
            L11, brp[:nb], lower=True, unit_diagonal=True
        )
        b_new = jnp.roll(
            jnp.concatenate([y1, brp[nb:] - jnp.matmul(L21, y1, precision=_HI)]),
            j0,
        )

        # Trailing update of the local slab columns right of the panel.
        Ar = jnp.roll(A_loc, -j0, axis=0)[perm]
        U12 = jax.scipy.linalg.solve_triangular(
            L11, Ar[:nb], lower=True, unit_diagonal=True
        )
        tail = Ar[nb:] - jnp.matmul(L21, U12, precision=_HI)
        updated = jnp.roll(jnp.concatenate([U12, tail], axis=0), j0, axis=0)
        trailing = cols_global >= (j0 + nb)
        A_next = jnp.where(trailing[None, :], updated, A_loc)

        # Owner writes the panel back: earlier U rows stay, the diagonal
        # block becomes U11, eliminated rows zero (back-substitution reads
        # only U rows).
        U11_at = lax.dynamic_update_slice(
            jnp.zeros((n, nb), dtype), U11, (j0, i32(0))
        )
        wb = jnp.where((rows < j0)[:, None], pl, U11_at)
        A_owner = lax.dynamic_update_slice(
            A_next, wb, (i32(0), jnp.clip(local_start, 0, C - nb))
        )
        A_next = jnp.where(is_owner, A_owner, A_next)
        return A_next, b_new

    A_fac, b_fac = lax.fori_loop(
        0, num_panels, fwd_body, (A_loc, b), unroll=False
    )

    # Back-substitution: x replicated; inner products live where the
    # columns live and psum-reduce.
    x_seg_cols = lax.dynamic_slice_in_dim  # alias for brevity

    def bwd_body(k, x):
        p = num_panels - 1 - k
        j0 = (p * nb).astype(i32) if hasattr(p, "astype") else i32(p * nb)
        local_start = j0 - col0
        is_owner = (local_start >= 0) & (local_start < C)
        diag_blk = lax.dynamic_slice(
            A_fac, (j0, jnp.clip(local_start, 0, C - nb)), (nb, nb)
        )
        U11 = lax.psum(
            jnp.where(is_owner, diag_blk, jnp.zeros_like(diag_blk)), axis_name
        )
        rowsU = lax.dynamic_slice(A_fac, (j0, i32(0)), (nb, C))
        xs = x_seg_cols(x, col0, C, axis=0)
        later = cols_global >= (j0 + nb)
        c = lax.psum(
            jnp.matmul(rowsU, jnp.where(later, xs, 0.0), precision=_HI),
            axis_name,
        )
        rhs = lax.dynamic_slice(b_fac, (j0,), (nb,)) - c
        xp = jax.scipy.linalg.solve_triangular(U11, rhs, lower=False)
        return lax.dynamic_update_slice(x, xp, (j0,))

    x = lax.fori_loop(
        0, num_panels, bwd_body, jnp.zeros((n,), dtype), unroll=False
    )
    return x


def _embed_padded(A: Array, b: Array, n_pad: int):
    """Embed (n, n) A into an n_pad identity-extended system (the tail
    decouples: x_pad[n:] = 0)."""
    n = A.shape[0]
    if n_pad == n:
        return A, b
    A_pad = jnp.eye(n_pad, dtype=A.dtype)
    A_pad = A_pad.at[:n, :n].set(A)
    return A_pad, jnp.concatenate([b, jnp.zeros((n_pad - n,), b.dtype)])


@functools.lru_cache(maxsize=None)
def _tp_solver(mesh: Mesh, axis_name: str, panel: int, n_pad: int):
    D = int(mesh.devices.size)

    def local(A_loc, b):
        return lu_solve_tp_local(
            A_loc, b, axis_name=axis_name, num_devices=D, panel=panel
        )

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis_name), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)


def lu_solve_tp(
    A: Array,
    b: Array,
    *,
    mesh: Optional[Mesh] = None,
    axis_name: str = TP_AXIS,
    panel: int = 64,
) -> Array:
    """Solve the dense system A x = b with the factorization sharded over
    the mesh: host-level entry (shards A's columns, pads to whole panels
    per device, unpads the solution)."""
    if mesh is None:
        mesh = make_tp_mesh(axis_name=axis_name)
    D = int(mesh.devices.size)
    A = jnp.asarray(A)
    b = jnp.asarray(b)
    n = A.shape[0]
    n_pad = padded_dimension(n, D, panel)
    A_pad, b_pad = _embed_padded(A, b, n_pad)
    A_pad = jax.device_put(A_pad, NamedSharding(mesh, P(None, axis_name)))
    x = _tp_solver(mesh, axis_name, panel, n_pad)(A_pad, b_pad)
    return x[:n]


class TPNewtonBackend:
    """`newton_solver` backend for solver.ip_solve / diff._solve_ts — call
    INSIDE shard_map with replicated operands.

    As a callable it is the Newton step: assembles the condensed (n+m)
    system (exactly linalg.newton_step_condensed) replicated — cheap
    relative to the O(k³) factorization — and solves it with the
    column-sharded LU. `ift_solve`/`ift_solve_t` additionally distribute
    the IFT sensitivity core solves (diff.py condensed branch), so the
    backward pass rides the same mesh as the forward."""

    def __init__(
        self, *, axis_name: str = TP_AXIS, num_devices: int, panel: int = 64
    ):
        self.axis_name = axis_name
        self.num_devices = num_devices
        self.panel = panel

    def _sharded_solve(self, A: Array, rhs: Array) -> Array:
        """Column-shard the replicated (k, k) system and run the
        distributed LU; returns the replicated solution."""
        k = A.shape[0]
        k_pad = padded_dimension(k, self.num_devices, self.panel)
        A_pad, rhs_pad = _embed_padded(A, rhs, k_pad)
        C = k_pad // self.num_devices
        idx = lax.axis_index(self.axis_name).astype(jnp.int32)
        A_loc = lax.dynamic_slice(A_pad, (jnp.int32(0), idx * C), (k_pad, C))
        return lu_solve_tp_local(
            A_loc,
            rhs_pad,
            axis_name=self.axis_name,
            num_devices=self.num_devices,
            panel=self.panel,
        )[:k]

    def __call__(self, Gx, Gy, Hx, Hy, y, s, rG, rH, rC, reg):
        n, m = rG.shape[0], rH.shape[0]
        dtype = Gx.dtype
        d = 1.0 / (y + reg)
        A = jnp.block(
            [
                [Gx + reg * jnp.eye(n, dtype=dtype), Gy],
                [Hx, Hy + reg * jnp.eye(m, dtype=dtype) + jnp.diag(d * s)],
            ]
        )
        rhs = jnp.concatenate([-rG, -rH - d * rC])
        dxy = self._sharded_solve(A, rhs)
        dx, dy = dxy[:n], dxy[n:]
        ds = -(rC + s * dy) * d
        return dx, dy, ds

    def ift_solve(self, A: Array, rhs: Array) -> Array:
        return self._sharded_solve(A, rhs)

    def ift_solve_t(self, A: Array, rhs: Array) -> Array:
        return self._sharded_solve(A.T, rhs)


@functools.lru_cache(maxsize=None)
def _tp_backend(axis_name: str, num_devices: int, panel: int) -> TPNewtonBackend:
    # One instance per config: custom_jvp nondiff args and the jit caches
    # key on object identity.
    return TPNewtonBackend(
        axis_name=axis_name, num_devices=num_devices, panel=panel
    )


def make_newton_step_condensed_tp(
    *, axis_name: str = TP_AXIS, num_devices: int, panel: int = 64
):
    """Backward-compatible factory returning the callable backend."""
    return _tp_backend(axis_name, num_devices, panel)


@functools.lru_cache(maxsize=None)
def _tp_ip_solver(
    mcp: PrimalDualMCP,
    options: SolverOptions,
    mesh: Mesh,
    axis_name: str,
    panel: int,
):
    D = int(mesh.devices.size)
    step = make_newton_step_condensed_tp(
        axis_name=axis_name, num_devices=D, panel=panel
    )

    def replicated(theta, x0, y0, s0):
        # Differentiable (IFT custom_jvp): the Newton factorizations AND —
        # with sensitivity_solver="condensed" + assume_hy_zero — the
        # backward core solves are tensor-parallel over the mesh.
        from ..diff import _solve_ts

        return _solve_ts(mcp, options, None, step, theta, x0, y0, s0)

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


def solve_single_tp(
    mcp: PrimalDualMCP,
    theta: Array,
    *,
    mesh: Optional[Mesh] = None,
    axis_name: str = TP_AXIS,
    panel: int = 64,
    x0: Optional[Array] = None,
    y0: Optional[Array] = None,
    s0: Optional[Array] = None,
    options: Optional[SolverOptions] = None,
    **option_overrides,
) -> SolveResult:
    """Interior-point solve of ONE large game with every Newton
    factorization tensor-parallel over the mesh.

    Uses the condensed (n+m) system (exact w.r.t. the dense tier). The
    solver loop runs replicated on every device in lockstep; only the
    per-iteration factorization is sharded. algorithm='ip' (the reference
    loop) only. Differentiable w.r.t. theta (IFT custom_jvp); with
    sensitivity_solver="condensed" on an assume_hy_zero MCP the backward
    core solves are sharded over the same mesh."""
    if options is None:
        options = SolverOptions(**option_overrides)
    elif option_overrides:
        import dataclasses

        options = dataclasses.replace(options, **option_overrides)
    if options.linear_solver in ("condensed", "dense"):
        pass  # the injected step IS the condensed solve
    else:
        raise ValueError(
            "solve_single_tp shards the condensed Newton system; pass "
            "linear_solver='condensed' (default) or 'dense'"
        )
    if mesh is None:
        mesh = make_tp_mesh(axis_name=axis_name)
    theta = jnp.asarray(theta)
    from ..solver import default_initialization

    x0, y0, s0 = default_initialization(mcp, theta, x0, y0, s0)
    return _tp_ip_solver(mcp, options, mesh, axis_name, panel)(
        theta, x0, y0, s0
    )
