"""Polygon environments as halfspace constraint generators (SURVEY.md §2.5).

Owned equivalent of TrajectoryGamesBase.PolygonEnvironment + get_constraints
(used by the reference at examples/utils.jl:131-134,
examples/lane_change.jl:2-12): a convex polygon from counter-clockwise
vertices, exposed as per-position halfspace residuals  b - aᵀp ≥ 0.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclasses.dataclass(frozen=True, eq=False)
class PolygonEnvironment:
    """Convex polygon from CCW-ordered 2D vertices."""

    vertices: np.ndarray  # (num_vertices, 2)
    A: np.ndarray  # (num_edges, 2) outward normals
    b: np.ndarray  # (num_edges,)

    @staticmethod
    def from_vertices(vertices) -> "PolygonEnvironment":
        V = np.asarray(vertices, dtype=np.float64)
        if V.ndim != 2 or V.shape[1] != 2:
            raise ValueError("vertices must be (num_vertices, 2)")
        # Edge v_i -> v_{i+1}; outward normal for a CCW polygon is the edge
        # direction rotated -90°: n = (e_y, -e_x). Halfspace: n·p ≤ n·v_i.
        E = np.roll(V, -1, axis=0) - V
        A = np.stack([E[:, 1], -E[:, 0]], axis=1)
        norms = np.linalg.norm(A, axis=1, keepdims=True)
        A = A / norms
        b = np.sum(A * V, axis=1)
        # Ensure normals point outward (centroid strictly inside).
        c = V.mean(axis=0)
        if np.any(A @ c - b > 0):
            A, b = -A, -b
        return PolygonEnvironment(vertices=V, A=A, b=b)

    @property
    def num_constraints(self) -> int:
        return self.A.shape[0]

    def position_constraints(self, p: Array) -> Array:
        """Residuals g(p) = b - A p, one per edge, all ≥ 0 inside.

        Matches TrajectoryGamesBase.get_constraints' per-position output
        ``-(aᵀp - b)`` for each halfspace.
        """
        A = jnp.asarray(self.A, dtype=p.dtype)
        b = jnp.asarray(self.b, dtype=p.dtype)
        return b - A @ p

    def contains(self, p) -> bool:
        return bool(np.all(np.asarray(self.A) @ np.asarray(p) - self.b <= 1e-12))


def box_constraint_fn(lb, ub):
    """Finite-bound box residuals, matching TrajectoryGamesBase.
    get_constraints_from_box_bounds ordering (used at examples/utils.jl:137-155):
    all finite lower-bound rows (y - lb) first, then all finite upper-bound
    rows (ub - y)."""
    lb = np.asarray(lb, dtype=np.float64)
    ub = np.asarray(ub, dtype=np.float64)
    lb_idx = np.flatnonzero(~np.isinf(lb))
    ub_idx = np.flatnonzero(~np.isinf(ub))
    lb_vals, ub_vals = lb[lb_idx], ub[ub_idx]
    lb_idx_j, ub_idx_j = jnp.asarray(lb_idx), jnp.asarray(ub_idx)

    def constraints(y: Array) -> Array:
        lo = y[lb_idx_j] - jnp.asarray(lb_vals, dtype=y.dtype)
        hi = jnp.asarray(ub_vals, dtype=y.dtype) - y[ub_idx_j]
        return jnp.concatenate([lo, hi])

    constraints.num_constraints = len(lb_idx) + len(ub_idx)
    return constraints
