#!/bin/bash
# Round-4 FINAL record queue: the full bench set on the final code.
set -u
SNAP=/root/repo/.tpu_run
LOGS=/root/repo/logs/tpu_queue_r4h
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

run_job 01_headline 3600 python bench.py
run_job 02_qp 3600 python bench.py --suite qp --tol 1e-5
run_job 03_n4_b8 3600 python scripts/bench_tridiag.py --batch 8 --players 4 --horizon 30 --tiers tridiag_auto --polish --skip-lane-change --algorithm hybrid --refinement-steps 0 --ingraph
run_job 04_n10_b8 5400 python scripts/bench_tridiag.py --batch 8 --players 10 --horizon 30 --tiers tridiag_auto --polish --skip-lane-change
run_job 05_stream 3600 python bench.py --stream 8
run_job 06_warm_mehrotra 3600 python bench.py --suite warm --algorithm mehrotra
run_job 07_smoke 7200 python scripts/tpu_smoke.py --out "$LOGS/TPU_SMOKE.json"
