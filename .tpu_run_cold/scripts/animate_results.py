#!/usr/bin/env python
"""Animate evaluation trajectories (reference examples/visualize.py /
scripts/paper_vis.py): render closed-loop JSONs from evaluate_selection.py
into GIFs/MP4s, one per result file.

    python scripts/animate_results.py --results eval_out --players 4 --out anim_out
"""

import argparse
import glob
import json
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--results", required=True, help="dir of evaluation JSONs")
    p.add_argument("--players", type=int, required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--fmt", default="gif", choices=["gif", "mp4"])
    p.add_argument("--fps", type=int, default=10)
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args()

    from mcp_tpu.analysis import animate_result

    os.makedirs(args.out, exist_ok=True)
    files = sorted(glob.glob(os.path.join(args.results, "receding_horizon_*.json")))
    if args.limit:
        files = files[: args.limit]
    for path in files:
        with open(path) as f:
            result = json.load(f)
        name = os.path.splitext(os.path.basename(path))[0]
        out_path = os.path.join(args.out, f"{name}.{args.fmt}")
        animate_result(
            result,
            out_path,
            num_players=args.players,
            fps=args.fps,
            title=name,
        )
        print(out_path)


if __name__ == "__main__":
    main()
