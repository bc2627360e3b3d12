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
    # What to stage (VERDICT r4 item 9). "headline" = the bench.py default
    # protocol (streamed scan + retry, the in-graph cross-check, true-KKT);
    # "train" = the N=4 h30 b8 training step (445 s compile against a
    # 0.214 s step — the worst amortization in the repo); "n4"/"n10" = the
    # flagship masked-game solve programs (scripts/bench_tridiag.py
    # shapes). Multiple suites run sequentially in THIS process (the TPU
    # claim is exclusive — never run them as parallel processes).
    parser.add_argument(
        "--suites",
        nargs="*",
        default=["headline"],
        choices=["headline", "train", "n4", "n10"],
    )
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from mcp_tpu.utils.devices import configure_tpu_cache

        configure_tpu_cache()  # shared cache + CPU-probe setup (utils/devices.py)
    import jax.numpy as jnp

    phase(f"jax ready, device {jax.devices()[0]}")

    if "headline" in args.suites:
        from mcp_tpu.bench import harness
        from mcp_tpu.bench import lane_change as lc
        from mcp_tpu.parallel import solve_batches_streamed
        from mcp_tpu.parallel.batch import solve_batch
        from mcp_tpu.solver import SolverOptions

        bench = lc.generate_test_problem(horizon=10)
        mcp = bench.parametric_game.mcp
        phase("headline problem built")

        key = jax.random.PRNGKey(1)
        thetas = lc.generate_parameter_batch(key, args.batch, bench)
        # bench.py defaults since round 5: streamed scan (K=32 — the
        # synchronous-tunnel slack amortizer) + retry=1.
        options = SolverOptions(
            tol=1e-4,
            linear_solver="tridiag_pallas",
            polish=True,
            tightening_rate=0.02,
            retry=1,
        )

        stack = jnp.stack(
            [
                lc.generate_parameter_batch(jax.random.fold_in(key, 1 + k),
                                            args.batch, bench)
                for k in range(32)
            ]
        )
        result = solve_batches_streamed(mcp, stack, options=options)
        float(jnp.sum(result.x))
        phase("headline 1/4: streamed scan (K=32, retry) compiled + executed")

        flat = jax.tree.map(lambda a: a.reshape((-1,) + a.shape[2:]), result)
        float(
            jnp.sum(
                harness.true_kkt_errors(
                    mcp, flat, stack.reshape(-1, stack.shape[-1])
                )
            )
        )
        phase("headline 2/4: true-KKT evaluator compiled + executed")

        result = solve_batch(mcp, thetas, options=options)
        float(jnp.sum(result.x))
        phase("headline 3/4: per-dispatch polished solve compiled + executed")

        if not args.skip_ingraph:
            B = args.batch
            n, m = mcp.unconstrained_dimension, mcp.constrained_dimension
            fn = harness._ingraph_repeat_solver(mcp, options, 3)
            fn(
                stack[:3],
                jnp.zeros((B, n), thetas.dtype),
                jnp.ones((B, m), thetas.dtype),
                jnp.ones((B, m), thetas.dtype),
            ).block_until_ready()
            phase("headline 4/4: in-graph cross-check compiled + executed")

    if "n4" in args.suites or "n10" in args.suites:
        from mcp_tpu.bench.flagships import masked_game_setup
        from mcp_tpu.parallel.batch import solve_batch
        from mcp_tpu.solver import SolverOptions, auto_tightening_rate

        for players, batch, algo, refine in (
            ("n4" in args.suites) * [(4, 8, "hybrid", 0)]
            + ("n10" in args.suites) * [(10, 8, "ip", 1)]
        ):
            s = masked_game_setup(batch, players, 30)
            opts = SolverOptions(
                linear_solver="tridiag_auto",
                polish=True,
                tightening_rate=auto_tightening_rate(s.mcp),
                algorithm=algo,
                refinement_steps=refine,
                hybrid_switch_tol=3e-2,
            )
            r = solve_batch(s.mcp, s.thetas, x0=s.x0, options=opts)
            float(jnp.sum(r.x))
            phase(f"N={players} flagship solve compiled + executed")

    if "train" in args.suites:
        from mcp_tpu.bench.flagships import stage_train_step

        # Builds the flagship, EXPORTS the traced program + input arrays
        # under the persistent cache (so a warm bench run skips the game
        # build and the trace, not just XLA — VERDICT r4 item 9), then
        # compiles + executes one step to prime the XLA cache too.
        s = stage_train_step(8, 4, 30)
        phase("train: problem staged + program exported")
        loss, aux, grads = s.train_step(
            s.params, s.trajectories, s.init, s.goals
        )
        float(loss)
        phase("train: N=4 h30 b8 training step compiled + executed")

    phase("done — the staged programs now hit the persistent cache")


if __name__ == "__main__":
    main()
