#!/usr/bin/env python
"""On-chip diagnostic for the QP-suite timing inconsistency (round-3 queue:
host median 0.8 ms/batch vs in-graph 1.52 s/batch at batch 256, tol 1e-5 —
1900x apart; the harness correctly reported the conservative number and
timing_consistent: false).

Separates the hypotheses:
  h1. block_until_ready on a device BUFFER under-waits on the axon tunnel
      (host number inflated)  -> host-scalar timing will match in-graph.
  h2. the in-graph fori_loop program is pathological for this shape
      (in-graph number deflated) -> host-scalar matches host-buffer, and
      K=1 in-graph is ~K=5/5.

Times four ways, fresh theta per repeat:
  a) host loop, block on result.x buffer           (harness's host path)
  b) host loop, block on jnp.sum(result.x) scalar  (forces full execution)
  c) in-graph fori_loop, K=1
  d) in-graph fori_loop, K=5
"""

import argparse
import os
import time

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--batch", type=int, default=256)
parser.add_argument("--repeats", type=int, default=5)
parser.add_argument("--tol", type=float, default=1e-5)
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
else:
    from mcp_tpu.utils.devices import configure_tpu_cache

    configure_tpu_cache()  # shared cache + CPU-probe setup

import jax.numpy as jnp

from mcp_tpu.bench import qp
from mcp_tpu.bench.harness import _ingraph_repeat_solver
from mcp_tpu.parallel.batch import solve_batch
from mcp_tpu.solver import SolverOptions

print("device:", jax.devices()[0], flush=True)
B = args.batch
options = SolverOptions(tol=args.tol, linear_solver="schur", polish=True)
problem = qp.generate_test_problem()
mcp = problem.mcp
key = jax.random.PRNGKey(1)


def theta(i):
    return qp.generate_parameter_batch(jax.random.fold_in(key, i), B)


def med(fn):
    fn(theta(0))  # compile/warm
    ts = []
    for r in range(1, args.repeats + 1):
        th = theta(r)
        th.block_until_ready()  # theta generation stays outside the clock
        t0 = time.perf_counter()
        fn(th)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


# a) host, block on buffer
a = med(lambda th: solve_batch(mcp, th, options=options).x.block_until_ready())
print(f"a) host buffer-block : {a*1e3:9.2f} ms/batch", flush=True)

# b) host, block on a reduced scalar (the value itself must exist)
b = med(
    lambda th: float(jnp.sum(solve_batch(mcp, th, options=options).x))
)
print(f"b) host scalar-block : {b*1e3:9.2f} ms/batch", flush=True)

# c/d) in-graph K repeats in one dispatch
n, m = mcp.unconstrained_dimension, mcp.constrained_dimension
x0 = jnp.zeros((B, n), jnp.float32)
y0 = jnp.ones((B, m), jnp.float32)
s0 = jnp.ones((B, m), jnp.float32)
for K in (1, 5):
    fn = _ingraph_repeat_solver(mcp, options, K)

    def run(i, K=K, fn=fn):
        stack = jnp.stack([theta(100 * K + i * K + k) for k in range(K)])
        stack.block_until_ready()
        t0 = time.perf_counter()
        fn(stack, x0, y0, s0).block_until_ready()
        return time.perf_counter() - t0

    run(0)
    ts = [run(r) for r in range(1, args.repeats + 1)]
    print(f"{'c' if K == 1 else 'd'}) in-graph K={K}     : "
          f"{float(np.median(ts))/K*1e3:9.2f} ms/batch", flush=True)

print("verdict: h1 (buffer under-wait) if b >> a and b ~ in-graph; "
      "h2 (in-graph pathology) if a ~ b << in-graph", flush=True)
