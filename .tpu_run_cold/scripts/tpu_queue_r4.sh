#!/bin/bash
# Round-4 TPU measurement queue (stage 1): phase-instrumented headline +
# current QP baseline. Runs from the .tpu_run HEAD snapshot so the working
# tree can be edited without racing queued re-imports (CLAUDE.md trap).
# Serialized: ONE TPU process at a time (the axon claim is exclusive).
set -u
SNAP=/root/repo/.tpu_run
LOGS=/root/repo/logs/tpu_queue_r4
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

# 1. Driver metric with the new two-stage emission + phase breadcrumbs:
#    the stderr timestamps tell us where the 12.5-minute judge run went.
run_job 01_headline 3600 python bench.py
# 2. Second run back-to-back: the steady-state (all-caches-warm) wall-clock
#    the driver would see after scripts/precompile.py.
run_job 02_headline_warm 1800 python bench.py
# 3. Current QP baseline at 1e-5 under the new harness (pre-affine-fastpath).
run_job 03_qp_before 3600 python bench.py --suite qp --tol 1e-5
