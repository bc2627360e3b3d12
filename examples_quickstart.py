"""User-style quickstart: the reference README's 2-var QP-KKT MCP, a gradient
through the solve, and a 2-player game — through the public mcp_tpu API."""
import sys
import jax, jax.numpy as jnp

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
else:
    try:  # a cacheless TPU quickstart pays ~5 min of tunnel compiles
        # per program every run (utils/devices.configure_tpu_cache)
        from mcp_tpu.utils.devices import configure_tpu_cache

        configure_tpu_cache()
    except Exception:
        pass
print("backend:", jax.devices())

import mcp_tpu
from mcp_tpu import PrimalDualMCP, OptimizationProblem, ParametricGame
from mcp_tpu.games import solve_game

# --- README quickstart QP: min 0.5 x'Mx - θ'x  s.t. Ax >= b ---
M = jnp.array([[2.0, 1.0], [1.0, 2.0]])
A = jnp.eye(2)
b = jnp.array([1.0, 1.0])
theta = jnp.array([-0.5, 0.5])

mcp = PrimalDualMCP.from_gh(
    lambda x, y, t: M @ x - t - A.T @ y,
    lambda x, y, t: A @ x - b,
    unconstrained_dimension=2, constrained_dimension=2, parameter_dimension=2)
sol = mcp_tpu.solve(mcp, theta)
print("QP: x =", sol.x, "y =", sol.y, "status =", int(sol.status),
      "kkt =", float(sol.kkt_error), "outer =", int(sol.outer_iters))
assert int(sol.status) == mcp_tpu.SOLVED

# --- gradient of a loss through the solve ---
g = jax.grad(lambda t: jnp.sum(mcp_tpu.solve(mcp, t).x ** 2))(theta)
print("grad:", g)

# --- clamp game (2 players, box inequalities) ---
LIM = 0.5
problems = [
    OptimizationProblem(
        objective=lambda xs, ti, i=i: jnp.sum((xs[i] - ti) ** 2),
        private_inequality=lambda xs, ti, i=i: jnp.concatenate([-xs[i] + LIM, xs[i] + LIM]),
    )
    for i in range(2)
]
game = ParametricGame.create(
    test_point=[jnp.ones(2), jnp.ones(2)],
    test_parameter=[jnp.ones(2), jnp.ones(2)],
    problems=problems)
gsol = solve_game(game, [jnp.array([-1.0, 0.0]), jnp.array([1.0, 1.0])])
print("game primals:", [list(map(float, p)) for p in gsol.primals], "status:", int(gsol.status))
print("expected:     [[-0.5, 0.0], [0.5, 0.5]]")
print("OK")
