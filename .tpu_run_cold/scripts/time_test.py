#!/usr/bin/env python
"""Solver wall-time vs player count N (reference examples/time_test.jl +
scripts/time_plot.py). Prints per-solve seconds per N and saves the O(N³)
comparison plot. The reference's own CPU numbers for this experiment are in
BASELINE.md (N=2: 0.23 s ... N=10: 73.1 s per step).

    python scripts/time_test.py --players 2 3 4 --horizon 30 --batch 8 --out time_plot.png
"""

import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--players", type=int, nargs="+", default=[2, 3, 4])
    p.add_argument("--horizon", type=int, default=30)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--out", default="time_plot.png")
    p.add_argument("--json-out", default=None)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from mcp_tpu.analysis import n_scaling_experiment, time_scaling_plot

    results = n_scaling_experiment(
        tuple(args.players),
        horizon=args.horizon,
        batch=args.batch,
        repeats=args.repeats,
    )
    ns = sorted(results)
    time_scaling_plot(ns, [results[n] for n in ns], args.out)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({str(k): v for k, v in results.items()}, f, indent=2)
    print(json.dumps({str(k): v for k, v in results.items()}))


if __name__ == "__main__":
    main()
