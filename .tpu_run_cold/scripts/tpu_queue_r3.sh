#!/bin/bash
# Round-3 TPU measurement queue. Runs from the .tpu_run HEAD snapshot so the
# working tree can be edited without racing queued re-imports (CLAUDE.md trap).
# Serialized: ONE TPU process at a time (the axon claim is exclusive).
# Each job: timeout-bounded, logged, one retry on the transient
# FAILED_PRECONDITION waves. Results land in logs/tpu_queue_r3/.
set -u
SNAP=/root/repo/.tpu_run
LOGS=/root/repo/logs/tpu_queue_r3
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
    # transient backend waves: wait then retry once
    sleep 60
  done
  touch "$LOGS/$name.failed"
  return 1
}

# 1. Driver metric: certified headline (bench.py default = polish on, b256)
run_job 01_headline_certified 7200 python bench.py
# 2. Uncertified headline (reference-parity epsilon-exit)
run_job 02_headline_uncert 5400 python bench.py --no-polish
# 3. Smoke gate (re-run after the T>=64 CR routing commits)
run_job 03_tpu_smoke 7200 python scripts/tpu_smoke.py --out "$LOGS/TPU_SMOKE.json"
# 4. Warm receding-horizon suite (now with honest fields)
run_job 04_warm 5400 python bench.py --suite warm
# 5. QP suite certified at 1e-5
run_job 05_qp 5400 python bench.py --suite qp --tol 1e-5
# 6. Scaling report chip row at the certified default
run_job 06_scaling_chip 5400 python scripts/scaling_report.py --chip --out "$LOGS/scaling_report_chip.json"
# 7/8. Flagship masked games, small batch: kernel tier ladder incl. new gjpr
run_job 07_flagship_n4 7200 python scripts/bench_tridiag.py --batch 8 --players 4 --horizon 30 \
  --tiers tridiag tridiag_pallas_crgjp tridiag_pallas_crgjpr tridiag_auto --skip-lane-change
run_job 08_flagship_n10 7200 python scripts/bench_tridiag.py --batch 8 --players 10 --horizon 30 \
  --tiers tridiag tridiag_pallas_crgjp tridiag_pallas_crgjpr --skip-lane-change
# 9. SPIKE slab kernel-vs-XLA ablation (VERDICT #5 'done' criterion)
run_job 09_spike_slab 5400 python scripts/microbench_spike_slab.py
# 10. Lane-major batch sweep B=128..1024 (VERDICT #3 sweep)
run_job 10_b128 5400 python bench.py --batch 128
run_job 11_b512 5400 python bench.py --batch 512
run_job 12_b1024 7200 python bench.py --batch 1024

echo "QUEUE COMPLETE $(date -u)" >> "$LOGS/queue.log"
