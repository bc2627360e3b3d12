"""Batch-tile sweep for the fused Pallas block-Thomas kernel.

The kernel's per-grid-step work is latency-bound (serial T x b chains of
tiny batched ops), so splitting a batch into G sequential grid steps costs
~G x one step's wall-clock. This sweep measures the standalone kernel at
lane-change shapes (T=10, b=20) across batch sizes and tiles, one-way vs
two-way (BABE), to pick the VMEM budget / tile policy on data.
"""

import argparse
import time

import jax
import jax.numpy as jnp

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--batches", nargs="*", type=int, default=[256])
parser.add_argument("--tiles", nargs="*", type=int, default=[64, 128, 256])
parser.add_argument("--T", type=int, default=10)
parser.add_argument("--b", type=int, default=20)
parser.add_argument("--repeats", type=int, default=20)
args = parser.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

from mcp_tpu.kernels.thomas_pallas import pallas_block_thomas

print("device:", jax.devices()[0])
T, b = args.T, args.b
key = jax.random.PRNGKey(0)


def make_system(B):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    diag = jax.random.normal(k1, (B, T, b, b), jnp.float32) * 0.1
    diag = diag + 4.0 * jnp.eye(b)[None, None]  # diagonally dominant
    lower = jax.random.normal(k2, (B, T - 1, b, b), jnp.float32) * 0.1
    upper = jax.random.normal(k3, (B, T - 1, b, b), jnp.float32) * 0.1
    rhs = jax.random.normal(k4, (B, T, b), jnp.float32)
    return diag, lower, upper, rhs


K = 20  # kernel invocations per jitted call: amortizes the per-dispatch
# host→device round-trip (the axon tunnel costs ~30 ms per call, which
# swamps a ms-scale kernel when timed one call at a time).


def timeit(fn, *xs):
    out = jax.block_until_ready(fn(*xs))
    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*xs))
        times.append(time.perf_counter() - t0)
    return min(times) / K * 1e3, out


for B in args.batches:
    sys_ = make_system(B)
    ref = None
    for two_way in (False, True):
        for tile in args.tiles:
            if tile > B:
                continue

            @jax.jit
            def run(d, l, u, r, tile=tile, two_way=two_way):
                def body(_, x):
                    # Data-dependent chaining (x feeds the next rhs) so XLA
                    # cannot elide or overlap the K solves.
                    return pallas_block_thomas(
                        d, l, u, r + 1e-20 * x, batch_tile=tile, two_way=two_way
                    )

                return jax.lax.fori_loop(0, K, body, r)

            try:
                ms, out = timeit(run, *sys_)
            except Exception as e:  # compile failures (VMEM) are data too
                print(f"B={B:5d} tile={tile:4d} two_way={int(two_way)}  FAILED: {type(e).__name__}: {str(e)[:120]}")
                continue
            if ref is None:
                ref = out
            err = float(jnp.max(jnp.abs(out - ref)))
            print(
                f"B={B:5d} tile={tile:4d} two_way={int(two_way)}  {ms:8.3f} ms/solve"
                f"  ({B / ms * 1e3:9.0f} systems/s)  max|dx vs ref|={err:.2e}"
            )
