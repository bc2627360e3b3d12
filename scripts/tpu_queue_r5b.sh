#!/bin/bash
# Round-5 TPU queue stage 2: the round-5 kernel + protocol work, on-chip.
#   1. smoke gate (now incl. cr+gjbpr at b=100 and the twofloat dw oracle)
#   2. TPU quickstart (the /verify on-chip leg)
#   3. N=10 phase profile + blocked-elimination A/B (VERDICT item 1)
#   4. N=10 end-to-end tier A/B at the flagship shape
#   5. headline with the PIPELINED streamed protocol (item 2)
#   6. QP suite with the polish exit margin (item 3: frac must hit 1.0)
#   7. QP tol-1e-6 double-word protocol row (item 6)
#   8. hard-draw retry verification on-chip (item 4)
#
# Same discipline as stage 1: runs from a fresh HEAD snapshot, one TPU
# process at a time, .done markers, timeout + one retry.
set -u
SNAP=/root/repo/.tpu_run
LOGS=/root/repo/logs/tpu_queue_r5b
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

run_job 00_smoke 5400 python scripts/tpu_smoke.py
run_job 01_quickstart 600 python examples_quickstart.py
run_job 02_n10_profile 7200 python scripts/phase_profile_n10.py --json "$LOGS/phase_n10.json"
run_job 03_n10_ab 7200 python scripts/bench_tridiag.py --batch 8 --players 10 --horizon 30 --tiers tridiag_auto tridiag_pallas_crgjbpr --polish --skip-lane-change --refinement-steps 1 --ingraph --repeats 3
run_job 04_headline 1800 python bench.py
run_job 05_headline_warm 1200 python bench.py
run_job 06_qp 3600 python bench.py --suite qp --tol 1e-5
run_job 07_qp_dw 3600 python bench.py --suite qp --tol 1e-6 --dw
run_job 08_hard_retry 1200 python scripts/hard_retry_check.py
# Train-step artifact staging (exported program + inputs) then the warm
# first-step timing (VERDICT item 9: < 60 s on a primed machine).
run_job 09_train_stage 3600 python scripts/precompile.py --suites train
run_job 10_train_warm 1800 python scripts/bench_train_step.py --batch 8
echo "queue r5b complete $(date -u +%H:%M:%S)" >> "$LOGS/queue.log"
