#!/usr/bin/env python
"""SPIKE-slab ablation: fused multi-RHS Pallas sweep vs the XLA slab.

The horizon-sharded SPIKE local stage solves a (Tl, b, b) slab against
k = 2b+1 right-hand sides once per Newton iteration (parallel/horizon.py).
This measures the two implementations of that exact solve on-chip
(VERDICT r2 #5 'Done' clause: kernelized local solve ≥ 2x the XLA slab):

  * xla:    vmap(block_thomas_solve_multi) — Tl sequential b×b LU dispatches
  * pallas: pallas_block_thomas_multi      — one VMEM-resident sweep

In-graph fori_loop chaining (axon dispatch ≈ 30 ms would swamp a ms-scale
kernel timed call-by-call); median of repeats.

Usage: python scripts/microbench_spike_slab.py [--cpu] [--Tl 16] [--b 20]
       [--batches 1 8]
"""

import argparse
import os
import time

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--Tl", type=int, default=16, help="local slab length T/D")
parser.add_argument("--b", type=int, default=20)
# Production SPIKE shapes carry the full per-device instance batch into the
# local slab (each of B instances' Newton systems is horizon-sharded), so
# the ablation must cover large B — at B=8 both implementations are µs-scale
# and latency-equivalent in-graph.
parser.add_argument("--batches", nargs="*", type=int, default=[8, 64, 256])
parser.add_argument("--repeats", type=int, default=10)
parser.add_argument("--K", type=int, default=20, help="in-graph chain length")
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
else:
    from mcp_tpu.utils.devices import configure_tpu_cache

    configure_tpu_cache()  # shared cache + CPU-probe setup

import jax.numpy as jnp

from mcp_tpu.kernels.block_tridiag import block_thomas_solve_multi
from mcp_tpu.kernels.thomas_pallas import pallas_block_thomas_multi

print("device:", jax.devices()[0], flush=True)
Tl, b = args.Tl, args.b
k = 2 * b + 1
K = args.K


def make(B):
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    f32 = jnp.float32
    diag = 0.1 * jax.random.normal(k1, (B, Tl, b, b), f32) + 4.0 * jnp.eye(b, dtype=f32)
    lower = 0.1 * jax.random.normal(k2, (B, Tl - 1, b, b), f32)
    upper = 0.1 * jax.random.normal(k3, (B, Tl - 1, b, b), f32)
    R = jax.random.normal(k4, (B, Tl, b, k), f32)
    return diag, lower, upper, R


def timed(fn, xs):
    out = jax.block_until_ready(fn(*xs))
    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*xs))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / K * 1e3, out


for B in args.batches:
    xs = make(B)
    results = {}
    for name, solver in [
        ("xla", lambda d, l, u, r: jax.vmap(block_thomas_solve_multi)(d, l, u, r)),
        ("pallas", lambda d, l, u, r: pallas_block_thomas_multi(d, l, u, r)),
    ]:

        @jax.jit
        def run(d, l, u, r, solver=solver):
            def body(_, x):
                # Perturb the MATRIX too, not just the RHS: with loop-
                # invariant (d, l, u), XLA hoists the factorization out of
                # the fori_loop and only the back-substitution is timed,
                # while the monolithic Pallas call re-factorizes every
                # iteration — an unfair 0.88x "ablation" (round-3 queue
                # capture). The 1e-20 nudge keeps both paths factorizing
                # per iteration without changing the solution materially.
                d_v = d + 1e-20 * x[..., :b]
                return solver(d_v, l, u, r + 1e-20 * x)

            return jax.lax.fori_loop(0, K, body, r)

        try:
            ms, out = timed(run, xs)
            results[name] = (ms, out)
            print(f"B={B:3d} Tl={Tl} b={b} k={k}  {name:7s} {ms:8.3f} ms/slab-solve",
                  flush=True)
        except Exception as e:
            print(f"B={B:3d} {name}: FAILED {type(e).__name__}: {str(e)[:150]}",
                  flush=True)
    if len(results) == 2:
        err = float(jnp.max(jnp.abs(results["xla"][1] - results["pallas"][1])))
        print(f"  speedup xla/pallas = {results['xla'][0] / results['pallas'][0]:.2f}x"
              f"  max|dx| = {err:.2e}", flush=True)
