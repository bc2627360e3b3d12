#!/bin/bash
# Stage-2 TPU jobs: flagship-shape lanes-tiled measurements + certified
# flagship runs + gjpr headline + Mehrotra warm row. Launched by the watcher
# only after the stage-1 queue runner exits (TPU claim is exclusive).
# Re-syncs the snapshot first so it picks up the bench_tridiag --polish flag.
set -u
SNAP=/root/repo/.tpu_run
LOGS=/root/repo/logs/tpu_queue_r3
mkdir -p "$LOGS"
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

# Flagship N=4 at B=128: T-tiled lane-major (tier tridiag_pallas auto-gate)
# vs the round-2 winner crgjp and the refined crgjpr — VERDICT #3 + #4.
run_job 20_flagship_n4_lanes 7200 python scripts/bench_tridiag.py --batch 128 --players 4 --horizon 30 \
  --tiers tridiag_pallas tridiag_pallas_crgjp tridiag_pallas_crgjpr --skip-lane-change
# Certified flagship rows (VERDICT #4 done criterion: N=10 certified >= 6/s).
run_job 21_flagship_n4_cert 5400 python scripts/bench_tridiag.py --batch 128 --players 4 --horizon 30 \
  --tiers tridiag_pallas --polish --skip-lane-change
run_job 22_flagship_n10_cert 7200 python scripts/bench_tridiag.py --batch 8 --players 10 --horizon 30 \
  --tiers tridiag_auto tridiag_pallas_crgjpr --polish --skip-lane-change
# Refined-GJ at the headline shape (success must be 1.0 where gjp dropped 3%).
run_job 23_headline_gjpr 5400 python bench.py --tier tridiag_pallas_gjpr
# Mehrotra warm-start headline with certification (VERDICT #7).
run_job 24_warm_mehrotra 5400 python bench.py --suite warm --algorithm mehrotra
# Batch sweep with the certified default (deferred from stage 1; run if
# chip time remains).
rm -f "$LOGS/10_b128.done" "$LOGS/11_b512.done" "$LOGS/12_b1024.done"
run_job 10_b128 5400 python bench.py --batch 128
run_job 11_b512 5400 python bench.py --batch 512
run_job 12_b1024 7200 python bench.py --batch 1024

echo "STAGE2 COMPLETE $(date -u)" >> "$LOGS/queue.log"
