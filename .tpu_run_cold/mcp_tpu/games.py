"""N-player parametric games → MCP via stacked KKT conditions.

Capability parity with the reference game layer (src/game.jl):

  * ``OptimizationProblem`` — per-player objective + private equality /
    inequality constraints (src/game.jl:2-6).
  * ``ParametricGame`` — N coupled problems plus shared equality/inequality
    constraints, compiled to a ``PrimalDualMCP`` (src/game.jl:16-44).
  * ``game_to_mcp`` — builds each player's Lagrangian gradient ∇ₓᵢLᵢ and
    stacks  K = [∇L₁..∇L_N; g; g̃; h; h̃],  z = [x; λ; λ̃; μ; μ̃]  with free
    bounds on (x, λ, λ̃) and [0, ∞) bounds on (μ, μ̃) (src/game.jl:47-157).
  * ``dimensions`` — dual sizes inferred by evaluating constraints at a test
    point (src/game.jl:159-183); here via ``jax.eval_shape`` so no FLOPs run.
  * ``solve_game`` — forwards kwargs to the IP solver and splits primals
    per player (src/game.jl:186-205).

JAX-first conventions (instead of BlockArrays):
  * the joint primal is passed to user callables as a *tuple of per-player
    arrays* ``xs``; private callables receive their own parameter block
    ``theta_i``; shared callables receive the tuple ``thetas`` of all blocks.
  * signatures:  objective(xs, theta_i) -> scalar;
                 private_equality/inequality(xs, theta_i) -> vector;
                 shared_equality/inequality(xs, thetas) -> vector.

The stacked variable layout puts all unconstrained rows first, so the MCP's
G/H split is contiguous slicing — no index gathers on the hot path.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from .blocks import Blocking, concat_blocks
from .mcp import PrimalDualMCP
from .types import SolveResult
from . import diff as _diff
from .solver import SolverOptions

Array = jax.Array


@dataclasses.dataclass(frozen=True, eq=False)
class OptimizationProblem:
    """One player's parameterized problem (reference src/game.jl:2-6)."""

    objective: Callable
    private_equality: Optional[Callable] = None
    private_inequality: Optional[Callable] = None


class GameDimensions(NamedTuple):
    """Static per-player/shared dimensions (reference src/game.jl:159-183)."""

    x: tuple[int, ...]  # per-player primal sizes
    theta: tuple[int, ...]  # per-player parameter sizes
    lam: tuple[int, ...]  # per-player private-equality dual sizes (λ)
    mu: tuple[int, ...]  # per-player private-inequality dual sizes (μ)
    shared_lam: int  # shared-equality dual size (λ̃)
    shared_mu: int  # shared-inequality dual size (μ̃)


def _eval_len(fn, xs, arg) -> int:
    shape = jax.eval_shape(fn, xs, arg)
    # Host arithmetic on the static shape tuple — a jnp.prod here is an
    # EAGER device op, i.e. one tiny compiled program PER CONSTRAINT through
    # the axon tunnel (~12 s each; measured 126 s of ParametricGame.create
    # wall-clock in the round-4 build trace).
    import math

    return math.prod(shape.shape) if shape.shape else 1


def dimensions(
    test_point: Sequence[Array],
    test_parameter: Sequence[Array],
    problems: Sequence[OptimizationProblem],
    shared_equality: Optional[Callable],
    shared_inequality: Optional[Callable],
) -> GameDimensions:
    xs = tuple(jnp.asarray(b) for b in test_point)
    thetas = tuple(jnp.asarray(b) for b in test_parameter)
    lam = tuple(
        0 if p.private_equality is None else _eval_len(p.private_equality, xs, ti)
        for p, ti in zip(problems, thetas)
    )
    mu = tuple(
        0 if p.private_inequality is None else _eval_len(p.private_inequality, xs, ti)
        for p, ti in zip(problems, thetas)
    )
    shared_lam = 0 if shared_equality is None else _eval_len(shared_equality, xs, thetas)
    shared_mu = (
        0 if shared_inequality is None else _eval_len(shared_inequality, xs, thetas)
    )
    return GameDimensions(
        x=tuple(int(b.size) for b in xs),
        theta=tuple(int(b.size) for b in thetas),
        lam=lam,
        mu=mu,
        shared_lam=shared_lam,
        shared_mu=shared_mu,
    )


class GameMCPComponents(NamedTuple):
    G: Callable
    H: Callable
    GH: Callable
    dims: GameDimensions
    unconstrained_dimension: int
    constrained_dimension: int


def game_to_mcp(
    *,
    test_point: Sequence[Array],
    test_parameter: Sequence[Array],
    problems: Sequence[OptimizationProblem],
    shared_equality: Optional[Callable] = None,
    shared_inequality: Optional[Callable] = None,
) -> GameMCPComponents:
    """Stack KKT conditions of all players into MCP residuals.

    Variable layout (matches reference ordering, src/game.jl:107-147):
        unconstrained u = [x₁..x_N ; λ₁..λ_N ; λ̃]      (free)
        constrained   v = [μ₁..μ_N ; μ̃]                (≥ 0)
    Residual layout:
        G(u, v, θ) = [∇ₓ₁L₁..∇ₓ_NL_N ; g₁..g_N ; g̃]
        H(u, v, θ) = [h₁..h_N ; h̃]
    """
    problems = tuple(problems)
    N = len(problems)
    dims = dimensions(
        test_point, test_parameter, problems, shared_equality, shared_inequality
    )
    x_blocking = Blocking(dims.x)
    lam_blocking = Blocking(dims.lam)
    mu_blocking = Blocking(dims.mu)
    theta_blocking = Blocking(dims.theta)

    nx, nlam = x_blocking.total, lam_blocking.total
    n_unconstrained = nx + nlam + dims.shared_lam
    n_constrained = mu_blocking.total + dims.shared_mu

    def _split_u(u):
        xs = x_blocking.split(u[:nx])
        lams = lam_blocking.split(u[nx : nx + nlam])
        shared_lam = u[nx + nlam :]
        return xs, lams, shared_lam

    def _split_v(v):
        mus = mu_blocking.split(v[: mu_blocking.total])
        shared_mu = v[mu_blocking.total :]
        return mus, shared_mu

    def GH(u, v, theta):
        xs, lams, shared_lam = _split_u(u)
        mus, shared_mu = _split_v(v)
        thetas = theta_blocking.split(theta)

        # Each player's Lagrangian gradient w.r.t. its own block
        # (reference src/game.jl:98-103).
        def lagrangian(xi, i):
            xs_i = xs[:i] + (xi,) + xs[i + 1 :]
            p = problems[i]
            L = p.objective(xs_i, thetas[i])
            if p.private_equality is not None:
                L = L - lams[i] @ p.private_equality(xs_i, thetas[i])
            if p.private_inequality is not None:
                L = L - mus[i] @ p.private_inequality(xs_i, thetas[i])
            if shared_equality is not None:
                L = L - shared_lam @ shared_equality(xs_i, thetas)
            if shared_inequality is not None:
                L = L - shared_mu @ shared_inequality(xs_i, thetas)
            return L

        grad_Ls = [jax.grad(lagrangian)(xs[i], i) for i in range(N)]

        gs = [
            p.private_equality(xs, ti)
            for p, ti in zip(problems, thetas)
            if p.private_equality is not None
        ]
        hs = [
            p.private_inequality(xs, ti)
            for p, ti in zip(problems, thetas)
            if p.private_inequality is not None
        ]
        g_shared = [] if shared_equality is None else [shared_equality(xs, thetas)]
        h_shared = [] if shared_inequality is None else [shared_inequality(xs, thetas)]

        G_val = concat_blocks(grad_Ls + gs + g_shared, dtype=u.dtype)
        H_val = concat_blocks(hs + h_shared, dtype=u.dtype)
        return G_val, H_val

    def G(u, v, theta):
        return GH(u, v, theta)[0]

    def H(u, v, theta):
        return GH(u, v, theta)[1]

    return GameMCPComponents(
        G=G,
        H=H,
        GH=GH,
        dims=dims,
        unconstrained_dimension=n_unconstrained,
        constrained_dimension=n_constrained,
    )


@dataclasses.dataclass(frozen=True, eq=False)
class ParametricGame:
    """An N-player parametric game compiled to a PrimalDualMCP
    (reference src/game.jl:16-44)."""

    problems: tuple[OptimizationProblem, ...]
    shared_equality: Optional[Callable]
    shared_inequality: Optional[Callable]
    dims: GameDimensions
    mcp: PrimalDualMCP

    @staticmethod
    def create(
        *,
        test_point: Sequence[Array],
        test_parameter: Sequence[Array],
        problems: Sequence[OptimizationProblem],
        shared_equality: Optional[Callable] = None,
        shared_inequality: Optional[Callable] = None,
        compute_sensitivities: bool = True,
    ) -> "ParametricGame":
        comps = game_to_mcp(
            test_point=test_point,
            test_parameter=test_parameter,
            problems=problems,
            shared_equality=shared_equality,
            shared_inequality=shared_inequality,
        )
        mcp = PrimalDualMCP(
            G=comps.G,
            H=comps.H,
            GH=comps.GH,
            unconstrained_dimension=comps.unconstrained_dimension,
            constrained_dimension=comps.constrained_dimension,
            parameter_dimension=sum(comps.dims.theta),
            compute_sensitivities=compute_sensitivities,
            # Game h-rows are functions of the primal x only (Hy ≡ 0 by
            # construction) — see linalg.newton_step_schur.
            assume_hy_zero=True,
        )
        return ParametricGame(
            problems=tuple(problems),
            shared_equality=shared_equality,
            shared_inequality=shared_inequality,
            dims=comps.dims,
            mcp=mcp,
        )

    @property
    def num_players(self) -> int:
        return len(self.problems)

    @property
    def primal_blocking(self) -> Blocking:
        return Blocking(self.dims.x)

    @property
    def parameter_blocking(self) -> Blocking:
        return Blocking(self.dims.theta)


class GameSolveResult(NamedTuple):
    """Game solve output: per-player primals + raw MCP variables
    (reference src/game.jl:196-204)."""

    primals: tuple[Array, ...]
    x: Array
    y: Array
    s: Array
    kkt_error: Array
    epsilon: Array
    outer_iters: Array
    status: Array

    @property
    def variables(self):
        """Raw MCP variables as a named bundle — API parity with the
        reference's ``solution.variables = (; x, y, s)``
        (src/game.jl:204), used for warm starting."""
        from types import SimpleNamespace

        return SimpleNamespace(x=self.x, y=self.y, s=self.s)


def solve_game(
    game: ParametricGame,
    theta,
    *,
    x0=None,
    y0=None,
    s0=None,
    options: Optional[SolverOptions] = None,
    **option_overrides,
) -> GameSolveResult:
    """Solve a parametric game. ``theta`` may be a flat vector (per-player
    blocks concatenated, as the reference's mortar'd θ) or a sequence of
    per-player blocks."""
    if not isinstance(theta, jax.Array) and isinstance(theta, (list, tuple)):
        theta = concat_blocks(theta)
    else:
        theta = jnp.asarray(theta)
        if theta.ndim != 1:
            theta = theta.reshape(-1)
    # Game-stacked MCPs have Hy ≡ 0 by construction (H rows are private/shared
    # inequality constraints of the primal x only), so the doubly-condensed
    # "schur" Newton tier and condensed sensitivity solves (linalg.py,
    # diff.py) are exact and substantially faster.
    if options is None and "linear_solver" not in option_overrides:
        option_overrides["linear_solver"] = "schur"
    if options is None and "sensitivity_solver" not in option_overrides:
        option_overrides["sensitivity_solver"] = "condensed"
    sol = _diff.solve(
        game.mcp, theta, x0=x0, y0=y0, s0=s0, options=options, **option_overrides
    )
    primals = game.primal_blocking.split(sol.x[: sum(game.dims.x)])
    return GameSolveResult(
        primals=primals,
        x=sol.x,
        y=sol.y,
        s=sol.s,
        kkt_error=sol.kkt_error,
        epsilon=sol.epsilon,
        outer_iters=sol.outer_iters,
        status=sol.status,
    )


def num_players(game: ParametricGame) -> int:
    """Reference API parity (src/game.jl:208-210)."""
    return game.num_players
