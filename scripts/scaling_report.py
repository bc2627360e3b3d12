#!/usr/bin/env python
"""Scaling report: batched lane-change solves/s + median IP iterations at
1 chip, 1 host (all local devices), and an emulated ≥2-host topology.

The BASELINE.md north star asks for 1-chip / 1-host / ≥2-host numbers. This
environment exposes ONE physical TPU chip, so: the 1-chip row runs on real
hardware; the host rows run on a virtual device mesh
(--xla_force_host_platform_device_count, the standard JAX topology-testing
trick — SURVEY.md §4) and measure *parallel efficiency of the sharded
program*, not absolute TPU throughput. On a real pod slice the same code
paths run unchanged (jax.distributed.initialize + the same shard_map).

Usage:
  python scripts/scaling_report.py --chip          # real-TPU 1-chip row
  python scripts/scaling_report.py --hosts         # virtual-mesh host rows
"""

import argparse
import json
import os
import sys
import time


def bench_sharded(mcp, thetas, mesh, repeats=3, **options):
    import jax

    from mcp_tpu.parallel.mesh import solve_batch_sharded

    result, n_ok = solve_batch_sharded(mcp, thetas, mesh=mesh, **options)
    jax.block_until_ready(result.x)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        result, n_ok = solve_batch_sharded(mcp, thetas, mesh=mesh, **options)
        jax.block_until_ready(result.x)
        times.append(time.perf_counter() - t0)
    import numpy as np

    return {
        "devices": int(mesh.devices.size),
        "batch": int(thetas.shape[0]),
        "solves_per_sec": thetas.shape[0] / min(times),
        "median_outer_iters": float(np.median(np.asarray(result.outer_iters))),
        "success_rate": float(np.mean(np.asarray(result.status) == 0)),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chip", action="store_true", help="real-TPU single-chip row")
    p.add_argument("--hosts", action="store_true", help="virtual host-mesh rows")
    p.add_argument("--batch-per-device", type=int, default=16)
    p.add_argument("--out", default="scaling_report.json")
    args = p.parse_args()

    if args.hosts and not os.environ.get("MCP_SCALING_REEXEC"):
        # Re-exec with a virtual 8-device CPU platform before JAX starts.
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["MCP_SCALING_REEXEC"] = "1"
        env["JAX_PLATFORMS"] = "cpu"
        flags = env.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
        os.execvpe(sys.executable, [sys.executable] + sys.argv, env)

    import jax

    if args.chip:
        from mcp_tpu.utils.devices import configure_tpu_cache

        configure_tpu_cache()  # shared cache + CPU-probe setup
    import jax.numpy as jnp

    from mcp_tpu.bench import lane_change as lc
    from mcp_tpu.parallel.mesh import make_batch_mesh
    from mcp_tpu.solver import SolverOptions

    bench = lc.generate_test_problem(horizon=10)
    mcp = bench.parametric_game.mcp
    key = jax.random.PRNGKey(1)

    # The bench.py DEFAULT configuration (round 3: certified headline —
    # polish + tuned schedule + lane-major auto-select inside
    # tridiag_pallas); keep in sync with bench.py's defaults.
    headline_options = SolverOptions(
        linear_solver="tridiag_pallas", polish=True, tightening_rate=0.02
    )

    rows = []
    if args.chip:
        # One device needs no shard_map (and compile through the tunnel is
        # slow) — time the plain batched solve, same program as bench.py.
        from mcp_tpu.bench.harness import benchmark_batched

        B = 256  # the bench.py headline batch (measured optimum)
        thetas = lc.generate_parameter_batch(key, B, bench, dtype=jnp.float32)
        sampler = lambda i: lc.generate_parameter_batch(
            jax.random.fold_in(key, 1 + i), B, bench, dtype=jnp.float32
        )
        stats = benchmark_batched(
            mcp, thetas, options=headline_options, theta_sampler=sampler
        )
        rows.append(
            {
                "devices": 1,
                "batch": B,
                "solves_per_sec": stats["solves_per_sec"],
                "median_outer_iters": stats["median_outer_iters"],
                "success_rate": stats["success_rate"],
                "true_kkt_max": stats["true_kkt_max"],
                "frac_true_kkt_at_tol": stats["frac_true_kkt_at_tol"],
                "certified": True,
                "timing_consistent": stats.get("timing_consistent"),
                "topology": "1 chip (real TPU v5e)",
            }
        )
    if args.hosts:
        all_devices = jax.devices()
        for label, ndev in [("1 host", min(4, len(all_devices))), ("2 hosts (emulated)", len(all_devices))]:
            mesh = make_batch_mesh(all_devices[:ndev])
            B = args.batch_per_device * ndev
            thetas = lc.generate_parameter_batch(key, B, bench, dtype=jnp.float32)
            row = bench_sharded(mcp, thetas, mesh, linear_solver="tridiag")
            row["topology"] = (
                f"{label} ({ndev} virtual CPU devices — correctness/parallel-"
                "efficiency of the sharded program only, NOT TPU throughput)"
            )
            rows.append(row)
        # Composed dp × sp (horizon) topology: 4 batch groups × 2-device
        # horizon teams on the same 8 virtual devices (BASELINE.md scaling
        # deliverable; the production shape for games too large per chip).
        import numpy as np

        from mcp_tpu.parallel.horizon import (
            make_dp_horizon_mesh,
            solve_batch_horizon_sharded,
        )

        dp, sp = 4, 2
        mesh2 = make_dp_horizon_mesh(dp, sp, all_devices)
        B = args.batch_per_device * dp
        thetas = lc.generate_parameter_batch(key, B, bench, dtype=jnp.float32)
        result = solve_batch_horizon_sharded(mcp, thetas, mesh=mesh2)
        jax.block_until_ready(result.x)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            result = solve_batch_horizon_sharded(mcp, thetas, mesh=mesh2)
            jax.block_until_ready(result.x)
            times.append(time.perf_counter() - t0)
        rows.append(
            {
                "devices": dp * sp,
                "batch": int(B),
                "solves_per_sec": B / float(np.median(times)),
                "median_outer_iters": float(np.median(np.asarray(result.outer_iters))),
                "success_rate": float(np.mean(np.asarray(result.status) == 0)),
                "topology": (
                    f"dp{dp} x sp{sp} 2-D mesh (8 virtual CPU devices — batch "
                    "groups of SPIKE horizon-sharded teams; correctness/"
                    "parallel-efficiency only, NOT TPU throughput)"
                ),
            }
        )

    report = {"rows": rows}
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
