"""mcp_tpu — TPU-native differentiable mixed-complementarity-problem solving.

A brand-new JAX/XLA/Pallas framework with the capability surface of the
reference `TianyuQ/MCP` (a fork of MixedComplementarityProblems.jl): a
primal-dual interior-point MCP solver with implicit-function-theorem
sensitivities, an N-player parametric-game → KKT → MCP compiler, trajectory
games with warm-started receding-horizon control, solver-in-the-loop learning,
and benchmark/analysis harnesses — redesigned TPU-first with fixed-shape
``lax.while_loop`` solves, ``vmap`` batching, and mesh-sharded multi-chip
execution.

Public interface parity: the reference exports ``PrimalDualMCP, solve,
ParametricGame, OptimizationProblem`` (src/MixedComplementarityProblems.jl:16).
"""

from .mcp import PrimalDualMCP, verify_affine
from .solver import SolverOptions, auto_tightening_rate
from .types import FAILED, SOLVED, SolveResult
from .diff import solve, solve_jacobian_theta
from .games import (
    OptimizationProblem,
    ParametricGame,
    GameSolveResult,
    game_to_mcp,
    solve_game,
)

__all__ = [
    "PrimalDualMCP",
    "SolverOptions",
    "SolveResult",
    "GameSolveResult",
    "SOLVED",
    "FAILED",
    "solve",
    "solve_jacobian_theta",
    "verify_affine",
    "auto_tightening_rate",
    "OptimizationProblem",
    "ParametricGame",
    "game_to_mcp",
    "solve_game",
]

__version__ = "0.1.0"
