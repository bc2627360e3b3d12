"""Random convex-QP benchmark problems.

Mirror of the reference's QP benchmark generator
(benchmark/quadratic_program_benchmark.jl):

    min_x 0.5 xᵀMx - ϕᵀx   s.t.  Ax - b ≥ 0,
    θ = [vec(M); vec(A); b; ϕ],   M = (P∘mask)ᵀ(P∘mask) with Bernoulli
    sparsity masking (sparsity_rate 0.9), defaults 100 primals + 100
    inequalities. Problems may be infeasible by construction (:5).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..mcp import PrimalDualMCP

Array = jax.Array


class QPProblem(NamedTuple):
    mcp: PrimalDualMCP
    num_primals: int
    num_inequalities: int


def unpack_parameters(theta: Array, *, num_primals: int, num_inequalities: int):
    """θ → (M, A, b, ϕ) (quadratic_program_benchmark.jl:77-90)."""
    n, m = num_primals, num_inequalities
    M = theta[: n * n].reshape(n, n)
    A = theta[n * n : n * n + m * n].reshape(m, n)
    b = theta[n * n + m * n : n * n + m * (n + 1)]
    phi = theta[n * n + m * (n + 1) :]
    return M, A, b, phi


def parameter_dimension(num_primals: int, num_inequalities: int) -> int:
    return num_primals * num_primals + num_inequalities * (num_primals + 1) + num_primals


def generate_test_problem(
    *, num_primals: int = 100, num_inequalities: int = 100
) -> QPProblem:
    """Build the parameterized QP-KKT MCP
    (quadratic_program_benchmark.jl:7-48): G = Mx - ϕ - Aᵀy, H = Ax - b."""
    n, m = num_primals, num_inequalities

    def unpack(theta):
        return unpack_parameters(theta, num_primals=n, num_inequalities=m)

    def G(x, y, theta):
        M, A, b, phi = unpack(theta)
        return M @ x - phi - A.T @ y

    def H(x, y, theta):
        M, A, b, phi = unpack(theta)
        return A @ x - b

    mcp = PrimalDualMCP.from_gh(
        G,
        H,
        unconstrained_dimension=n,
        constrained_dimension=m,
        parameter_dimension=parameter_dimension(n, m),
        # G = Mx − ϕ − Aᵀy and H = Ax − b are affine in (x, y): the solver
        # extracts the constant Jacobian once per solve instead of running
        # the (n+m)-seed linearize every inner iteration (verified by
        # tests/test_solver.py::TestAffineFastPath against verify_affine).
        affine=True,
    )
    return QPProblem(mcp=mcp, num_primals=n, num_inequalities=m)


def generate_random_parameter(
    key: Array,
    *,
    num_primals: int = 100,
    num_inequalities: int = 100,
    sparsity_rate: float = 0.9,
    dtype=jnp.float32,
) -> Array:
    """Random sparse convex QP parameters
    (quadratic_program_benchmark.jl:51-74)."""
    n, m = num_primals, num_inequalities
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    keep = 1.0 - sparsity_rate
    P = jax.random.normal(k1, (n, n), dtype) * jax.random.bernoulli(
        k2, keep, (n, n)
    ).astype(dtype)
    M = P.T @ P
    A = jax.random.normal(k3, (m, n), dtype) * jax.random.bernoulli(
        k4, keep, (m, n)
    ).astype(dtype)
    b = jax.random.normal(k5, (m,), dtype)
    phi = jax.random.normal(k6, (n,), dtype)
    return jnp.concatenate([M.reshape(-1), A.reshape(-1), b, phi])


def generate_parameter_batch(key: Array, batch: int, **kwargs) -> Array:
    keys = jax.random.split(key, batch)
    return jax.vmap(lambda k: generate_random_parameter(k, **kwargs))(keys)
