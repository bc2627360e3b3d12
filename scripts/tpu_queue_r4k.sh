#!/bin/bash
# Round-4 stage 9: GJ / 256-lane kernel variants on-chip + QP bench A/B.
set -u
SNAP=/root/repo/.tpu_run
LOGS=/root/repo/logs/tpu_queue_r4k
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

run_job 01_qp_phases4 3600 python scripts/profile_qp_phases.py --iters 10
run_job 02_qp_gj 3600 python bench.py --suite qp --tol 1e-5 --tier schur_pallas_gj
run_job 03_qp_qr256 3600 python bench.py --suite qp --tol 1e-5
run_job 04_smoke 7200 python scripts/tpu_smoke.py --out "$LOGS/TPU_SMOKE.json"
