"""Parameterized mixed complementarity problems (MCPs), TPU-native.

An MCP is specified by pure-JAX callables ``G`` and ``H`` such that

    0  = G(x, y, θ)
    0 <= H(x, y, θ)  ⟂  y >= 0.

Introducing a slack ``s`` and a central-path relaxation ``ϵ > 0`` yields the
primal-dual residual

    F(x, y, s; θ, ϵ) = [ G(x, y, θ) ; H(x, y, θ) - s ; s∘y - ϵ ]

whose root is driven to 0 by the interior-point solver as ϵ → 0.

This mirrors the capability surface of the reference's ``PrimalDualMCP``
(reference src/mcp.jl:13-24 and constructors at :27-52, :155-210), with one
deliberate architectural change (SURVEY.md §7.1.1): there is **no symbolic
tracing layer**. The reference traces G/H with Symbolics.jl and emits compiled
residual/Jacobian kernels (src/mcp.jl:82-147); here the user's G/H are plain
JAX functions, Jacobians come from ``jax.jacfwd`` at trace time, and XLA is
the code generator. Sparse-structure bookkeeping (src/mcp.jl:110-119) is
unnecessary: XLA folds constants and fuses at compile time.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclasses.dataclass(frozen=True, eq=False)
class PrimalDualMCP:
    """A parameterized MCP in primal-dual form.

    Attributes:
      G: callable ``G(x, y, theta) -> (n,)`` — the unconstrained residual.
      H: callable ``H(x, y, theta) -> (m,)`` — the constrained residual.
      unconstrained_dimension: n, size of x.
      constrained_dimension: m, size of y (and s).
      parameter_dimension: p, size of θ.
      compute_sensitivities: whether differentiation through ``solve`` is
        permitted (reference src/mcp.jl:33; error path src/AutoDiff.jl:19-23).
        Under JAX nothing is precomputed either way — this is an API-parity
        gate, not a tracing toggle.
      GH: optional fused callable returning ``(G, H)`` in one evaluation; used
        by the solver so K-form problems evaluate K once per residual.

    Note: ``eq=False`` gives identity hashing so instances can be passed as
    static jit arguments; each MCP instance owns its compile-cache entries,
    matching the reference's one-symbolic-compile-per-MCP model.
    """

    G: Callable[[Array, Array, Array], Array]
    H: Callable[[Array, Array, Array], Array]
    unconstrained_dimension: int
    constrained_dimension: int
    parameter_dimension: int
    compute_sensitivities: bool = True
    GH: Optional[Callable[[Array, Array, Array], tuple[Array, Array]]] = None
    # Optional static time-major block-tridiagonal structure of the
    # schur-condensed Newton system (set by the trajectory-game builder;
    # enables the "tridiag" linear-solver tier). kernels/block_tridiag.py.
    time_structure: Optional[object] = None
    # True when H is structurally independent of y (all KKT-stacked games:
    # the game layer's h rows are functions of the primal x only). Enables
    # the doubly-condensed "schur"/"tridiag" tiers and the condensed
    # sensitivity solves without a runtime check.
    assume_hy_zero: bool = False
    # Optional precomputed affine decomposition of the banded Jacobian
    # (kernels/block_tridiag.AffineBands), attached by the trajectory-game
    # builder when the game is numerically verified quadratic: the solver's
    # per-iteration linearize then costs one residual evaluation instead of
    # a 3b+3m_t-seed forward-mode sweep.
    affine_bands: Optional[object] = None
    # True when (G, H) are AFFINE in (x, y) for fixed θ — i.e. Gx/Gy/Hx/Hy
    # are independent of the iterate. The dense analog of `affine_bands`:
    # the solver then extracts the Jacobian ONCE per solve (n+m forward
    # seeds, hoisted before the Newton loop) and each inner iteration's
    # residual+Jacobian costs two matvecs instead of an (n+m)-seed
    # linearize sweep. True for every QP-derived KKT system — the
    # reference's QP benchmark problem has G = Mx − ϕ − Aᵀy, H = Ax − b
    # (benchmark/quadratic_program_benchmark.jl:20-35), both affine.
    # Verify with `verify_affine` before setting on user problems.
    affine: bool = False

    # -- residual assembly ---------------------------------------------------

    def gh(self, x: Array, y: Array, theta: Array) -> tuple[Array, Array]:
        """Evaluate (G, H) with a single fused pass when available."""
        if self.GH is not None:
            return self.GH(x, y, theta)
        return self.G(x, y, theta), self.H(x, y, theta)

    def F(self, x: Array, y: Array, s: Array, theta: Array, epsilon) -> Array:
        """Primal-dual residual ``[G; H - s; s∘y - ϵ]`` (src/mcp.jl:76-80)."""
        g, h = self.gh(x, y, theta)
        return jnp.concatenate([g, h - s, s * y - epsilon])

    def F_parts(
        self, x: Array, y: Array, s: Array, theta: Array, epsilon
    ) -> tuple[Array, Array, Array]:
        """Residual split into (rG, rH, rC) blocks without concatenation."""
        g, h = self.gh(x, y, theta)
        return g, h - s, s * y - epsilon

    def gh_linearized(self, x: Array, y: Array, theta: Array):
        """One fused pass: (G, H) values AND their Jacobians w.r.t. (x, y).

        Uses ``jax.linearize`` so the primal evaluation is shared between the
        residual and the (n+m)-seed forward-mode Jacobian — the solver's
        per-iteration F/∇F pair costs one trace instead of two
        (the reference evaluates compiled F! and ∇F_z! separately,
        src/solver.jl:79-80).

        Returns (g, h, Gx, Gy, Hx, Hy).
        """
        n = self.unconstrained_dimension
        m = self.constrained_dimension

        def stacked(w):
            g, h = self.gh(w[:n], w[n:], theta)
            return jnp.concatenate([g, h])

        w0 = jnp.concatenate([x, y])
        val, jvp = jax.linearize(stacked, w0)
        # Row i of `cols` is J @ e_i, i.e. column i of J.
        cols = jax.vmap(jvp)(jnp.eye(n + m, dtype=w0.dtype))
        J = cols.T
        return val[:n], val[n:], J[:n, :n], J[:n, n:], J[n:, :n], J[n:, n:]

    def gh_jacobians(self, x: Array, y: Array, theta: Array):
        """Jacobians of (G, H) w.r.t. (x, y), by forward-mode tracing.

        Returns (Gx, Gy, Hx, Hy) with shapes (n,n), (n,m), (m,n), (m,m).
        This plus the analytic rows [0 S Y] and [Hx Hy -I] assembles ∇F_z —
        the counterpart of the reference's traced sparse ∇F_z! (src/mcp.jl:97-120).
        """
        n = self.unconstrained_dimension

        def stacked(w):
            g, h = self.gh(w[:n], w[n:], theta)
            return jnp.concatenate([g, h])

        J = jax.jacfwd(stacked)(jnp.concatenate([x, y]))
        return J[:n, :n], J[:n, n:], J[n:, :n], J[n:, n:]

    def gh_affine_data(self, theta: Array, dtype=None):
        """Affine decomposition ``G = g0 + Gx·x + Gy·y``, ``H = h0 + Hx·x +
        Hy·y`` — valid only when ``affine=True`` (constant Jacobians).
        Evaluated at (x, y) = 0 so g0/h0 are the pure-θ offsets; one
        (n+m)-seed Jacobian extraction serves the whole solve."""
        n = self.unconstrained_dimension
        m = self.constrained_dimension
        dtype = dtype or jnp.asarray(theta).dtype
        x0 = jnp.zeros(n, dtype)
        y0 = jnp.zeros(m, dtype)
        g0, h0 = self.gh(x0, y0, theta)
        Gx, Gy, Hx, Hy = self.gh_jacobians(x0, y0, theta)
        return g0, h0, Gx, Gy, Hx, Hy

    def total_dimension(self) -> int:
        return self.unconstrained_dimension + 2 * self.constrained_dimension

    # -- constructors --------------------------------------------------------

    @staticmethod
    def from_gh(
        G: Callable[[Array, Array, Array], Array],
        H: Callable[[Array, Array, Array], Array],
        *,
        unconstrained_dimension: int,
        constrained_dimension: int,
        parameter_dimension: int,
        compute_sensitivities: bool = True,
        affine: bool = False,
    ) -> "PrimalDualMCP":
        """Construct from callables G(x, y, θ), H(x, y, θ).

        Counterpart of the reference's callable constructor (src/mcp.jl:27-52);
        the symbolic make_variables/tracing steps are subsumed by jit tracing.
        ``affine`` declares constant (x, y)-Jacobians (see the field doc).
        """
        return PrimalDualMCP(
            G=G,
            H=H,
            unconstrained_dimension=unconstrained_dimension,
            constrained_dimension=constrained_dimension,
            parameter_dimension=parameter_dimension,
            compute_sensitivities=compute_sensitivities,
            affine=affine,
        )

    @staticmethod
    def from_k(
        K: Callable[[Array, Array], Array],
        lower_bounds: Sequence[float],
        upper_bounds: Sequence[float],
        *,
        parameter_dimension: int,
        compute_sensitivities: bool = True,
        affine: bool = False,
    ) -> "PrimalDualMCP":
        """Construct from ``K(z, θ) ⟂ lb ≤ z ≤ ub``.

        Mirrors the reference's box-form constructor and its bounds rule: all
        upper bounds must be +Inf and lower bounds ∈ {-Inf, 0}
        (assertion at src/mcp.jl:191). Rows with lb = -Inf become G / x;
        rows with lb = 0 become H / y (src/mcp.jl:193-199).
        """
        lb = np.asarray(lower_bounds, dtype=np.float64)
        ub = np.asarray(upper_bounds, dtype=np.float64)
        if not np.all(np.isinf(ub)):
            raise ValueError("All upper bounds must be +Inf (reference src/mcp.jl:191).")
        if not np.all(np.isinf(lb) | (lb == 0)):
            raise ValueError(
                "All lower bounds must be -Inf or 0 (reference src/mcp.jl:191)."
            )

        unconstrained_idx = np.flatnonzero(np.isinf(lb))
        constrained_idx = np.flatnonzero(~np.isinf(lb))
        n, m = len(unconstrained_idx), len(constrained_idx)

        # Static scatter: z[unconstrained_idx] = x, z[constrained_idx] = y.
        perm = np.empty(len(lb), dtype=np.int64)
        perm[unconstrained_idx] = np.arange(n)
        perm[constrained_idx] = n + np.arange(m)
        perm = jnp.asarray(perm)
        unc = jnp.asarray(unconstrained_idx)
        con = jnp.asarray(constrained_idx)

        def gh(x, y, theta):
            z = jnp.concatenate([x, y])[perm]
            k = K(z, theta)
            return k[unc], k[con]

        def G(x, y, theta):
            return gh(x, y, theta)[0]

        def H(x, y, theta):
            return gh(x, y, theta)[1]

        return PrimalDualMCP(
            G=G,
            H=H,
            unconstrained_dimension=n,
            constrained_dimension=m,
            parameter_dimension=parameter_dimension,
            compute_sensitivities=compute_sensitivities,
            GH=gh,
            affine=affine,
        )


def verify_affine(
    mcp: PrimalDualMCP, theta: Array, *, key: Optional[Array] = None,
    atol: float = 1e-4,
) -> bool:
    """Numerically check that (G, H) are affine in (x, y) at this θ: the
    affine model from `gh_affine_data` must reproduce gh() at random probe
    points. Mirrors the trajectory builder's affine-bands verification
    pattern; call before constructing with ``affine=True`` on problems whose
    structure isn't known analytically."""
    key = jax.random.PRNGKey(7) if key is None else key
    n, m = mcp.unconstrained_dimension, mcp.constrained_dimension
    # Accuracy METRIC: must run at highest matmul precision — on TPU the
    # bf16 default would put ~1e-2 of measurement noise into the affine
    # reconstruction and falsely reject genuinely affine problems
    # (same trap as harness.true_kkt_errors).
    with jax.default_matmul_precision("highest"):
        g0, h0, Gx, Gy, Hx, Hy = mcp.gh_affine_data(theta)
        ok = True
        for i in range(2):
            kx, ky, key = jax.random.split(key, 3)
            x = jax.random.normal(kx, (n,), g0.dtype)
            y = jax.random.normal(ky, (m,), g0.dtype)
            g, h = mcp.gh(x, y, theta)
            ok = ok and bool(
                jnp.max(jnp.abs(g - (g0 + Gx @ x + Gy @ y)), initial=0.0) <= atol
            )
            ok = ok and bool(
                jnp.max(jnp.abs(h - (h0 + Hx @ x + Hy @ y)), initial=0.0) <= atol
            )
    return ok
