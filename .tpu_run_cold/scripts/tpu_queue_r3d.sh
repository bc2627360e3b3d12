#!/bin/bash
# Stage-4 TPU jobs: value-forced streamed row, large-batch SPIKE ablation,
# warm suites with the in-graph chain timing. Waits for stage 3, re-syncs.
set -u
SNAP=/root/repo/.tpu_run
LOGS=/root/repo/logs/tpu_queue_r3
mkdir -p "$LOGS"
for i in $(seq 1 480); do
  grep -q "STAGE3 COMPLETE" "$LOGS/queue.log" 2>/dev/null && break
  sleep 30
done
cd /root/repo && git archive HEAD | tar -x -C "$SNAP"
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

# 1. Streamed serving row, value-forced timing (supersedes 32_stream8).
run_job 40_stream8_forced 5400 python bench.py --stream 8 --repeats 3
# 2. SPIKE slab ablation at production batch sizes.
run_job 41_spike_slab_big 7200 python scripts/microbench_spike_slab.py
# 3/4. Warm suites with in-graph chain timing + consistency flag.
run_job 42_warm_ingraph 5400 python bench.py --suite warm
run_job 43_warm_mehrotra_ingraph 5400 python bench.py --suite warm --algorithm mehrotra
# 5. Flagship N=4 batch 8 through the batch-aware auto tier (should now
#    match crgjp's 139.2, was 77.7 pre-fix).
run_job 44_n4_auto_fixed 5400 python scripts/bench_tridiag.py --batch 8 --players 4 --horizon 30 \
  --tiers tridiag_auto --skip-lane-change
# 6. N=10 certified through the batch-aware auto tier (should match crgjpr).
run_job 45_n10_auto_fixed 7200 python scripts/bench_tridiag.py --batch 8 --players 10 --horizon 30 \
  --tiers tridiag_auto --polish --skip-lane-change
echo "STAGE4 COMPLETE $(date -u)" >> "$LOGS/queue.log"
