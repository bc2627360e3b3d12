#!/usr/bin/env python
"""Pre-stage the TPU compile cache for `python bench.py` (driver metric).

Round-3 lesson (VERDICT r3 item 1): the hardened bench compiles up to three
large programs through the axon tunnel (5-20+ min each cold); the driver's
capture window timed out (rc=124) and the official round record had NO
number. This script compiles exactly the programs `bench.py` (default args)
will run, populating `.jax_cache_tpu/` so a subsequent `python bench.py`
only pays cache loads + execution.

Run it as the FIRST command on any fresh machine:

    python scripts/precompile.py            # headline programs (~3 compiles)
    python bench.py                         # now fits the capture window

Programs staged (matching bench.py defaults: lane-change horizon 10,
batch 256, tier tridiag_pallas, polish on, tightening 0.02, tol 1e-4, f32):
  1. the vmapped polished solve (parallel.solve_batch)
  2. the in-graph fori-loop cross-check (harness._ingraph_repeat_solver, R=3)
  3. the true-KKT evaluator (harness.true_kkt_errors)
"""

import argparse
import os
import sys
import time

T0 = time.monotonic()


def phase(msg: str) -> None:
    print(f"[precompile +{time.monotonic() - T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--skip-ingraph", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from mcp_tpu.utils.devices import configure_tpu_cache

        configure_tpu_cache()  # shared cache + CPU-probe setup (utils/devices.py)
    import jax.numpy as jnp

    phase(f"jax ready, device {jax.devices()[0]}")

    from mcp_tpu.bench import harness
    from mcp_tpu.bench import lane_change as lc
    from mcp_tpu.parallel.batch import solve_batch
    from mcp_tpu.solver import SolverOptions

    bench = lc.generate_test_problem(horizon=10)
    mcp = bench.parametric_game.mcp
    phase("problem built")

    key = jax.random.PRNGKey(1)
    thetas = lc.generate_parameter_batch(key, args.batch, bench)
    options = SolverOptions(
        tol=1e-4, linear_solver="tridiag_pallas", polish=True, tightening_rate=0.02
    )

    result = solve_batch(mcp, thetas, options=options)
    float(jnp.sum(result.x))
    phase("1/3: batched polished solve compiled + executed")

    float(jnp.sum(harness.true_kkt_errors(mcp, result, thetas)))
    phase("2/3: true-KKT evaluator compiled + executed")

    if not args.skip_ingraph:
        B = args.batch
        n, m = mcp.unconstrained_dimension, mcp.constrained_dimension
        stack = jnp.stack(
            [
                lc.generate_parameter_batch(jax.random.fold_in(key, 1001 + r), B, bench)
                for r in range(3)
            ]
        )
        fn = harness._ingraph_repeat_solver(mcp, options, 3)
        fn(
            stack,
            jnp.zeros((B, n), thetas.dtype),
            jnp.ones((B, m), thetas.dtype),
            jnp.ones((B, m), thetas.dtype),
        ).block_until_ready()
        phase("3/3: in-graph cross-check compiled + executed")

    phase("done — bench.py should now hit the persistent cache")


if __name__ == "__main__":
    main()
