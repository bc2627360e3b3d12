"""Core result/status types for the interior-point MCP solver.

Reference semantics: the Julia solver returns the named tuple
``(; status, x, y, s, kkt_error, ϵ, outer_iters)`` with ``status ∈ {:solved, :failed}``
(reference ``src/solver.jl:121``). Here status is an int32 code so that results are
jit/vmap-friendly fixed-shape pytrees.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# Status codes (int32). SOLVED/FAILED mirror the reference's `:solved`/`:failed`
# (reference src/solver.jl:69,86,98,117-119).
SOLVED = 0
FAILED = 1


class SolveResult(NamedTuple):
    """Result of one interior-point MCP solve (a fixed-shape pytree).

    Fields mirror the reference's return value (src/solver.jl:121):
      x: unconstrained primal block, shape (n,)
      y: constrained dual block, shape (m,)
      s: slack block, shape (m,)
      kkt_error: ‖F‖∞ at the last accepted iterate (stale by one step, as in the
        reference where the residual is evaluated before the Newton update).
      epsilon: final central-path relaxation ϵ.
      outer_iters: number of outer (ϵ-annealing) iterations performed.
      status: SOLVED or FAILED (int32).
    """

    x: jax.Array
    y: jax.Array
    s: jax.Array
    kkt_error: jax.Array
    epsilon: jax.Array
    outer_iters: jax.Array
    status: jax.Array

    @property
    def solved(self) -> jax.Array:
        return self.status == SOLVED


def zeros_tangent(x):
    """Zero tangent matching JAX's dtype rules (float0 for integer leaves)."""
    if jnp.issubdtype(x.dtype, jnp.inexact):
        return jnp.zeros_like(x)
    import numpy as np

    return np.zeros(x.shape, dtype=jax.dtypes.float0)
