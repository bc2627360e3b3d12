#!/bin/bash
# Round-4 TPU queue stage 2: probe-fix headline, affine+mehrotra QP, hybrid
# N=4, auto-rate N=10, roofline measurement, QP phase profile, training step,
# smoke gate. Runs from the refreshed .tpu_run snapshot; ONE process at a time.
set -u
SNAP=/root/repo/.tpu_run
LOGS=/root/repo/logs/tpu_queue_r4b
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

# 0. Library verify drive (new-program compiles land in the shared cache).
run_job 00_quickstart 3600 python examples_quickstart.py
# 1. Headline with the CPU-probe fix: expect problem build in seconds, and
#    the in-graph cross-check back inside the budget.
run_job 01_headline 3600 python bench.py
# 2. QP after: affine fast path + mehrotra default, certified 1e-5.
run_job 02_qp_after 3600 python bench.py --suite qp --tol 1e-5
# 3. N=4 flagship: hybrid (the measured CPU winner) vs annealed baseline.
run_job 03_n4_hybrid 3600 python scripts/bench_tridiag.py --batch 8 --players 4 --horizon 30 --tiers tridiag_auto --polish --skip-lane-change --algorithm hybrid --refinement-steps 0
run_job 04_n4_ip 3600 python scripts/bench_tridiag.py --batch 8 --players 4 --horizon 30 --tiers tridiag_auto --polish --skip-lane-change
# 5. N=10 with the auto rate (no per-shape flag).
run_job 05_n10_auto 5400 python scripts/bench_tridiag.py --batch 8 --players 10 --horizon 30 --tiers tridiag_auto --polish --skip-lane-change
# 6. Roofline measurement rows (headline + N=4 + N=10 + QP).
run_job 06_roofline 5400 python scripts/roofline.py --measure --iters 10 --json "$LOGS/roofline.json"
# 7. QP per-phase profile on chip.
run_job 07_qp_phases 3600 python scripts/profile_qp_phases.py --iters 10
# 8. Solver-in-the-loop training step (N=4 h=30 b=8, banded IFT, certified).
run_job 09_train_step 5400 python scripts/bench_train_step.py --batch 8
# 9. Smoke gate (kernel regression check under the round-4 solver changes).
run_job 10_smoke 7200 python scripts/tpu_smoke.py --out "$LOGS/TPU_SMOKE.json"
