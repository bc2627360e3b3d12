"""Measure TPU compile + run time of the colored-seed tridiag program.

Context: through this environment's TPU tunnel the colored-seed banded
program used to take 35+ min to compile (XLA constant-folding of the
all-constant inverse-permutation scatters); kernels/block_tridiag.py now
embeds host-argsorted inverse permutations instead. This probe times the
lane-change tridiag solve end-to-end so the bench default tier can be
flipped if compiles are now tractable.

Run standalone (exclusive TPU claim — never concurrently with another TPU
process):  nohup python scripts/tpu_colored_compile_probe.py > log 2>&1 &
"""

import time

t_imp = time.time()
import jax
import jax.numpy as jnp

from mcp_tpu.bench import harness, lane_change as lc

print(f"imports: {time.time() - t_imp:.1f}s; devices: {jax.devices()}", flush=True)

for horizon, batch in [(10, 64)]:
    t0 = time.time()
    bench = lc.generate_test_problem(horizon=horizon)
    mcp = bench.parametric_game.mcp
    thetas = lc.generate_parameter_batch(
        jax.random.PRNGKey(1), batch, bench, dtype=jnp.float32
    )
    print(f"build horizon={horizon}: {time.time() - t0:.1f}s", flush=True)

    for tier in ["tridiag", "tridiag_cr"]:
        t0 = time.time()
        stats = harness.benchmark_batched(
            mcp, thetas, repeats=3, tol=1e-4, linear_solver=tier
        )
        total = time.time() - t0
        print(
            f"tier={tier} horizon={horizon} batch={batch}: "
            f"total={total:.1f}s (incl compile) "
            f"solves/s={stats['solves_per_sec']:.1f} "
            f"success={stats['success_rate']:.3f} "
            f"median_iters={stats['median_outer_iters']}",
            flush=True,
        )
