#!/bin/bash
# Round-5 TPU queue stage 1: smoke gate (new dense-lane + streamed-retry
# checks), full precompile staging, the NEW streamed headline protocol, the
# GJ-tier QP suite, the N=4 streamed row, the CR-at-T=10 A/B, warm sweep,
# and the cache-primed training-step timing (VERDICT r4 items 2-5, 7, 9).
#
# Runs from the .tpu_run HEAD snapshot so the working tree can be edited
# without racing queued re-imports (CLAUDE.md trap). Serialized: ONE TPU
# process at a time (the axon claim is exclusive and sticky).
set -u
SNAP=/root/repo/.tpu_run
LOGS=/root/repo/logs/tpu_queue_r5
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

# 1. Mosaic gate: the static-slice GJ/QR kernels + gji inverse + streamed
#    retry are new lowerings — nothing on CPU exercised real Mosaic.
run_job 00_smoke 5400 python scripts/tpu_smoke.py
# 2. Stage every flagship program into the persistent cache (item 9).
run_job 01_precompile 7200 python scripts/precompile.py --suites headline n4 n10 train
# 3. The NEW default headline: streamed scan K=8 + retry, certified.
run_job 02_headline 1800 python bench.py
# 4. Steady-state second run (what the driver sees on a warm machine).
run_job 03_headline_warm 1200 python bench.py
# 5. Old per-dispatch protocol for the A/B record.
run_job 04_per_dispatch 1800 python bench.py --stream 0
# 6. QP suite: static-slice GJ tier + QR-retry containment.
run_job 05_qp 3600 python bench.py --suite qp --tol 1e-5
# 7. N=4 flagship streamed row (item 5): target >= 280/s certified.
run_job 06_n4_streamed 3600 python scripts/bench_tridiag.py --batch 8 --players 4 --horizon 30 --tiers tridiag_auto --polish --skip-lane-change --algorithm hybrid --refinement-steps 0 --stream 8 --ingraph --repeats 3
# 8. CR-at-T=10 A/B (item 7): thomas vs CR chain at the headline shape.
run_job 07_cr_t10 3600 python scripts/bench_tridiag.py --batch 256 --tiers tridiag_pallas tridiag_pallas_cr --polish --repeats 3 --skip-masked --ingraph
# 9. Warm sweep regression.
run_job 08_warm 1800 python bench.py --suite warm
# 10. Training step on the primed cache: first step must come < 60 s in.
run_job 09_train_warm 1800 python scripts/bench_train_step.py --batch 8
echo "queue r5 stage 1 complete $(date -u +%H:%M:%S)" >> "$LOGS/queue.log"
