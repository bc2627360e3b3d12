"""Residual-based correctness check of the two-way (BABE) Thomas kernel on
the real TPU backend.

The interpret-mode (CPU) parity test passes at ~1e-6, but a standalone TPU
sweep showed max|x_babe - x_oneway| ~ 1.8e-2 on a well-conditioned random
system. Residuals against the actual block-tridiagonal operator identify
which sweep is wrong (the IP solver self-corrects slightly-wrong Newton
directions, so this can hide as extra iterations rather than failures).
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--B", type=int, default=8)
parser.add_argument("--T", type=int, default=10)
parser.add_argument("--b", type=int, default=20)
parser.add_argument("--tile", type=int, default=8)
args = parser.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

from mcp_tpu.kernels.thomas_pallas import pallas_block_thomas

print("device:", jax.devices()[0])
B, T, b = args.B, args.T, args.b
k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
diag = jax.random.normal(k1, (B, T, b, b), jnp.float32) * 0.1 + 4.0 * jnp.eye(b)
lower = jax.random.normal(k2, (B, T - 1, b, b), jnp.float32) * 0.1
upper = jax.random.normal(k3, (B, T - 1, b, b), jnp.float32) * 0.1
rhs = jax.random.normal(k4, (B, T, b), jnp.float32)


def residual(x):
    r = jnp.einsum("btij,btj->bti", diag, x) - rhs
    r = r.at[:, 1:].add(jnp.einsum("btij,btj->bti", lower, x[:, :-1]))
    r = r.at[:, :-1].add(jnp.einsum("btij,btj->bti", upper, x[:, 1:]))
    return jnp.max(jnp.abs(r))


import functools


@functools.partial(jax.jit, static_argnums=(0, 1))
def run(two_way, highest):
    if highest:
        with jax.default_matmul_precision("highest"):
            return pallas_block_thomas(
                diag, lower, upper, rhs, batch_tile=args.tile, two_way=two_way
            )
    return pallas_block_thomas(
        diag, lower, upper, rhs, batch_tile=args.tile, two_way=two_way
    )


# f64 host reference via numpy
dn = np.asarray(diag, np.float64)
ln = np.asarray(lower, np.float64)
un = np.asarray(upper, np.float64)
rn = np.asarray(rhs, np.float64)
A = np.zeros((B, T * b, T * b))
for t in range(T):
    A[:, t * b : (t + 1) * b, t * b : (t + 1) * b] = dn[:, t]
    if t > 0:
        A[:, t * b : (t + 1) * b, (t - 1) * b : t * b] = ln[:, t - 1]
    if t < T - 1:
        A[:, t * b : (t + 1) * b, (t + 1) * b : (t + 2) * b] = un[:, t]
x_ref = np.linalg.solve(A, rn.reshape(B, -1, 1))[..., 0].reshape(B, T, b)

for highest in (False, True):
    print(f"--- matmul precision {'highest' if highest else 'default'} ---")
    x_one = jax.block_until_ready(run(False, highest))
    x_two = jax.block_until_ready(run(True, highest))

    print(f"one-way: resid {float(residual(x_one)):.3e}  err vs f64 {np.max(np.abs(np.asarray(x_one) - x_ref)):.3e}")
    print(f"two-way: resid {float(residual(x_two)):.3e}  err vs f64 {np.max(np.abs(np.asarray(x_two) - x_ref)):.3e}")
    print(f"one vs two: {float(jnp.max(jnp.abs(x_one - x_two))):.3e}")
    err_t = np.max(np.abs(np.asarray(x_two) - x_ref), axis=(0, 2))
    print("two-way err by t:", " ".join(f"{e:.1e}" for e in err_t))
