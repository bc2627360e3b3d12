#!/bin/bash
# Stage-3 TPU jobs: QP-timing diagnostic, fair SPIKE ablation, streamed
# serving row, warm suites with the fixed (compile-outside-the-clock)
# harness. Waits for the r3b queue to finish (TPU claim is exclusive),
# then re-syncs the snapshot from HEAD.
set -u
SNAP=/root/repo/.tpu_run
LOGS=/root/repo/logs/tpu_queue_r3
mkdir -p "$LOGS"

# Wait (up to 4 h) for stage r3b to complete.
for i in $(seq 1 480); do
  grep -q "QUEUE COMPLETE" "$LOGS/queue.log" 2>/dev/null && break
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

# 1. QP timing inconsistency diagnostic (host-buffer vs host-scalar vs in-graph).
run_job 30_diag_qp 5400 python scripts/diag_qp_timing.py
# 2. SPIKE slab ablation with the loop-variant-matrix fix.
run_job 31_spike_slab_fair 5400 python scripts/microbench_spike_slab.py
# 3. Streamed serving row at the headline shape.
run_job 32_stream8 5400 python bench.py --stream 8 --repeats 3
# 4/5. Warm suites with the fixed harness (compile outside the clock).
run_job 33_warm_fixed 5400 python bench.py --suite warm
run_job 34_warm_mehrotra_fixed 5400 python bench.py --suite warm --algorithm mehrotra
echo "STAGE3 COMPLETE $(date -u)" >> "$LOGS/queue.log"
