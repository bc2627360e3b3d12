#!/bin/bash
# Round-5 TPU queue stage 3: FINAL captures with the shipped protocol
# (scan depth 32, polish margin, gjpr+tile2 wide blocks, dw certification
# on measured residuals). Stages the K=32 programs first so the driver's
# own `python bench.py` at round end hits a warm cache.
set -u
SNAP=/root/repo/.tpu_run
LOGS=/root/repo/logs/tpu_queue_r5c
mkdir -p "$LOGS" "$SNAP"
cd /root/repo && git archive HEAD | tar -x -C "$SNAP"
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

# 1. Stage the K=32 scan + cross-check programs into the persistent cache.
run_job 00_precompile 7200 python scripts/precompile.py
# 2. The driver metric, twice (cold-ish then steady-state).
run_job 01_headline 1800 python bench.py
run_job 02_headline_2 1200 python bench.py
# 3. QP suite at K=32.
run_job 03_qp 3600 python bench.py --suite qp --tol 1e-5
# 4. The tol-1e-6 double-word row with measured-residual certification.
run_job 04_qp_dw 3600 python bench.py --suite qp --tol 1e-6 --dw
# 5. Warm sweep regression (value-forced host loop now).
run_job 05_warm 1800 python bench.py --suite warm
# 6. Roofline refresh (N=10 row now runs gjpr + tile2).
run_job 06_roofline 5400 python scripts/roofline.py --measure --json "$LOGS/roofline_r5.json"
echo "queue r5c complete $(date -u +%H:%M:%S)" >> "$LOGS/queue.log"
