#!/bin/bash
# Stage-8 TPU jobs: push the N=10 certified rate toward the >=6/s criterion.
set -u
SNAP=/root/repo/.tpu_run
LOGS=/root/repo/logs/tpu_queue_r3
mkdir -p "$LOGS"
for i in $(seq 1 480); do
  grep -q "STAGE7 COMPLETE" "$LOGS/queue.log" 2>/dev/null && break
  sleep 30
done
git archive HEAD | tar -x -C "$SNAP"
ln -sfn /root/repo/.jax_cache_tpu "$SNAP/.jax_cache_tpu"
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
# Batch amortization at the wide-block shape.
run_job 70_n10_b16_cert 7200 python scripts/bench_tridiag.py --batch 16 --players 10 --horizon 30 \
  --tiers tridiag_auto --polish --skip-lane-change
run_job 71_n10_b32_cert 7200 python scripts/bench_tridiag.py --batch 32 --players 10 --horizon 30 \
  --tiers tridiag_auto --polish --skip-lane-change
# Intermediate annealing (0.02 drops success to 0.75; 0.1 is the safe ref).
run_job 72_n10_t005 7200 python scripts/bench_tridiag.py --batch 8 --players 10 --horizon 30 \
  --tiers tridiag_auto --polish --tightening-rate 0.05 --skip-lane-change
echo "STAGE8 COMPLETE $(date -u)" >> "$LOGS/queue.log"
