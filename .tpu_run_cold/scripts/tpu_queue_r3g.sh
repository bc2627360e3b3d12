#!/bin/bash
# Stage-6 TPU jobs: schur_pallas QP retry with the VMEM-budget fix.
set -u
SNAP=/root/repo/.tpu_run
LOGS=/root/repo/logs/tpu_queue_r3
mkdir -p "$LOGS"
for i in $(seq 1 480); do
  grep -q "STAGE6 COMPLETE" "$LOGS/queue.log" 2>/dev/null && break
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

# schur_pallas QP tier with the padded-VMEM budget + 64 MiB kernel limit
# (OOM'd at batch 256 before the fix).
run_job 61_qp_schur_pallas_tile8 5400 python bench.py --suite qp --tol 1e-5 --tier schur_pallas
echo "STAGE7 COMPLETE $(date -u)" >> "$LOGS/queue.log"
