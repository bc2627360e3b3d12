#!/bin/bash
# Round-4 TPU queue stage 6: demo retrain on-chip + flagship sweeps.
set -u
SNAP=/root/repo/.tpu_run
LOGS=/root/repo/logs/tpu_queue_r4f
mkdir -p "$LOGS"
cd "$SNAP"
export PYTHONPATH="$SNAP:${PYTHONPATH:-}"

run_job() {
  local name="$1"; shift
  local tmo="$1"; shift
  if [ -f "$LOGS/$name.done" ]; then return 0; fi
  for attempt in 1 2; do
    echo "=== $name attempt $attempt: $* ($(date -u +%H:%M:%S)) ===" >> "$LOGS/$name.log"
    timeout "$tmo" "$@" >> "$LOGS/$name.log" 2>&1
    local rc=$?
    echo "=== exit $rc ($(date -u +%H:%M:%S)) ===" >> "$LOGS/$name.log"
    if [ $rc -eq 0 ]; then touch "$LOGS/$name.done"; return 0; fi
    sleep 60
  done
  touch "$LOGS/$name.failed"
  return 1
}

# 1. Demo retrain ON-CHIP with the round-4 solver (refreshes demo/run:
#    VERDICT item 5's second half). Uses the repo's demo data.
run_job 01_train_demo 7200 python scripts/train_selection.py --data /root/repo/demo/data --players 4 --horizon 30 --epochs 12 --batch-size 8 --lr 0.005 --log-dir "$LOGS/train_run"
# 2. N=4 batch-128 flagship with hybrid (r3 record 286.4/s annealed).
run_job 02_n4_b128_hybrid 5400 python scripts/bench_tridiag.py --batch 128 --players 4 --horizon 30 --tiers tridiag_auto --polish --skip-lane-change --algorithm hybrid --refinement-steps 0 --ingraph
# 3. N=10 hybrid probe (refinement kept at 1 — the crgjpr certification aid).
run_job 03_n10_hybrid 5400 python scripts/bench_tridiag.py --batch 8 --players 10 --horizon 30 --tiers tridiag_auto --polish --skip-lane-change --algorithm hybrid --ingraph
