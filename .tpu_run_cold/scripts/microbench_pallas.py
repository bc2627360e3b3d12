"""Kernel-only micro-benchmark: pallas QR solve vs XLA LU, timed inside a
jitted fori_loop. Small program = fast tunnel compile."""

import argparse
import time

import jax
import jax.numpy as jnp
from jax import lax

parser = argparse.ArgumentParser()
parser.add_argument("--batch", type=int, default=64)
parser.add_argument("--n", type=int, default=200)
parser.add_argument("--iters", type=int, default=20)
parser.add_argument("--cpu", action="store_true")
args = parser.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

from mcp_tpu.kernels.linear_solve import (
    pallas_gauss_solve,
    pallas_qr_solve_fused,
    pallas_wy_solve,
)

B, n, K = args.batch, args.n, args.iters
print("device:", jax.devices()[0], f"B={B} n={n} iters={K}")
key = jax.random.PRNGKey(0)
A = jax.random.normal(key, (B, n, n), jnp.float32) + n * jnp.eye(n, dtype=jnp.float32)
b = jax.random.normal(jax.random.PRNGKey(1), (B, n), jnp.float32)


def timeit(name, body):
    @jax.jit
    def run(c):
        return lax.fori_loop(0, K, body, c)

    out = jax.block_until_ready(run(b))
    t0 = time.perf_counter()
    out = jax.block_until_ready(run(b))
    print(f"{name:30s} {(time.perf_counter()-t0)/K*1e3:8.3f} ms/iter")
    return out


with jax.default_matmul_precision("highest"):
    timeit(
        "pallas QR (tile 16)",
        lambda i, c: pallas_gauss_solve(A + 0.0 * i, c * 0 + b, batch_tile=16) * 1e-12 + c,
    )
    timeit(
        "pallas fused aug QR (auto tile)",
        lambda i, c: pallas_qr_solve_fused(A + 0.0 * i, c * 0 + b) * 1e-12 + c,
    )
    for tile in (16,):
        for panel in (8,):
            timeit(
                f"pallas WY QR (tile {tile}, nb {panel})",
                lambda i, c, tile=tile, panel=panel: pallas_wy_solve(
                    A + 0.0 * i, c * 0 + b, batch_tile=tile, panel=panel
                )
                * 1e-12
                + c,
            )
    timeit(
        "xla linalg.solve",
        lambda i, c: jnp.linalg.solve(A + 0.0 * i, (c * 0 + b)[..., None])[..., 0] * 1e-12 + c,
    )

# correctness spot check on TPU
x = pallas_gauss_solve(A, b, batch_tile=16)
r = jnp.einsum("bij,bj->bi", A, x) - b
print("pallas residual:", float(jnp.max(jnp.abs(r))))
