#!/bin/bash
# Round-4 TPU queue stage 4: lane-major QP kernel on-chip, f64 row retry,
# fresh-clone (cold-cache) bench rehearsal, smoke regression.
set -u
SNAP=/root/repo/.tpu_run
COLD=/root/repo/.tpu_run_cold
LOGS=/root/repo/logs/tpu_queue_r4d
mkdir -p "$LOGS"

run_job() {
  local dir="$1"; shift
  local name="$1"; shift
  local tmo="$1"; shift
  if [ -f "$LOGS/$name.done" ]; then return 0; fi
  for attempt in 1 2; do
    echo "=== $name attempt $attempt: $* ($(date -u +%H:%M:%S)) ===" >> "$LOGS/$name.log"
    (cd "$dir" && PYTHONPATH="$dir:${PYTHONPATH:-}" timeout "$tmo" "$@") >> "$LOGS/$name.log" 2>&1
    local rc=$?
    echo "=== exit $rc ($(date -u +%H:%M:%S)) ===" >> "$LOGS/$name.log"
    if [ $rc -eq 0 ]; then touch "$LOGS/$name.done"; return 0; fi
    sleep 60
  done
  touch "$LOGS/$name.failed"
  return 1
}

# 1. QP kernel variants incl. the new lane-major QR.
run_job "$SNAP" 01_qp_phases3 3600 python scripts/profile_qp_phases.py --iters 10
# 2. QP suite with the lane-major dispatch (B=256 routes to qr_lanes).
run_job "$SNAP" 02_qp_lanes 3600 python bench.py --suite qp --tol 1e-5
# 3. f64 reference-protocol row (gated to the XLA schur tier).
run_job "$SNAP" 03_qp_f64 5400 python bench.py --suite qp --tol 1e-6 --x64 --batch 64 --repeats 3
# 4. FRESH-CLONE rehearsal: cold snapshot with NO compile-cache symlink —
#    the wall-clock a fresh driver machine would pay end to end.
run_job "$COLD" 04_cold_bench 3600 python bench.py
# 5. Smoke regression after the kernel/dispatch changes.
run_job "$SNAP" 05_smoke 7200 python scripts/tpu_smoke.py --out "$LOGS/TPU_SMOKE.json"
