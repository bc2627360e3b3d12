"""Generate small pedestrian-style scenario fixtures.

The reference evaluates 6 real pedestrian recordings (test_real_data.jl:135,
scenario CSVs + a hardcoded per-scenario duration table); the actual
recordings are not redistributable, so this script synthesizes recordings
matching the dataset's statistics — agents walking at ~1.3 m/s on crossing
straight-ish paths with small heading noise inside the reference's real-data
bounds (train_and_test_utils.jl:435-438) — in the raw ``frame, agent_id,
x, y`` layout, then converts them through the production converter
(selection/real_data.convert_raw_csv) into the scenario CSV schema.

Writes tests/fixtures/ped/raw/scenario{K}.csv + tests/fixtures/ped/
scenario{K}.csv. Deterministic (seeded).
"""

import csv
import os

import numpy as np

from mcp_tpu.selection.real_data import REAL_BOUNDS, convert_raw_csv

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "ped")
DT = 0.1
WALK_SPEED = 1.3  # m/s, typical pedestrian

rng = np.random.default_rng(7)
os.makedirs(os.path.join(OUT, "raw"), exist_ok=True)

# (num agents, recording steps) per scenario — deliberately different
# lengths to exercise the variable-length trimming path.
SCENARIOS = [(4, 30), (4, 22), (5, 18)]

cx = (REAL_BOUNDS["xmin"] + REAL_BOUNDS["xmax"]) / 2
cy = (REAL_BOUNDS["ymin"] + REAL_BOUNDS["ymax"]) / 2

for sid, (N, steps) in enumerate(SCENARIOS, start=1):
    # Start positions on a rough circle around the walkway center; headings
    # point across it so paths cross (the interesting selection regime).
    angles = rng.uniform(0, 2 * np.pi, N)
    radius = rng.uniform(1.5, 3.0, N)
    pos = np.stack(
        [cx + radius * np.cos(angles), cy + radius * np.sin(angles)], axis=1
    )
    heading = np.arctan2(cy - pos[:, 1], cx - pos[:, 0]) + rng.normal(0, 0.2, N)
    speed = WALK_SPEED * rng.uniform(0.8, 1.2, N)

    raw_path = os.path.join(OUT, "raw", f"scenario{sid}.csv")
    with open(raw_path, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["frame", "agent_id", "x", "y"])
        p = pos.copy()
        h = heading.copy()
        for frame in range(steps):
            for agent in range(N):
                writer.writerow(
                    [frame, agent, f"{p[agent, 0]:.4f}", f"{p[agent, 1]:.4f}"]
                )
            h = h + rng.normal(0, 0.05, N)  # heading jitter
            p = p + DT * speed[:, None] * np.stack([np.cos(h), np.sin(h)], axis=1)

    scenario = convert_raw_csv(
        raw_path, os.path.join(OUT, f"scenario{sid}.csv"), dt=DT
    )
    print(
        f"scenario{sid}: N={len(scenario.initial_states)} "
        f"sim_steps={scenario.sim_steps} "
        f"start={scenario.initial_states[0][:2]} goal={scenario.goals[0]}"
    )
