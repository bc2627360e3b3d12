#!/bin/bash
# Stage-5 TPU jobs: tuned-annealing flagship rows + QP tier ladder.
# Waits for stage 4, re-syncs the snapshot.
set -u
SNAP=/root/repo/.tpu_run
LOGS=/root/repo/logs/tpu_queue_r3
mkdir -p "$LOGS"
for i in $(seq 1 480); do
  grep -q "STAGE4 COMPLETE" "$LOGS/queue.log" 2>/dev/null && break
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

# 1/2. Tuned-annealing certified flagship rows (headline uses 0.02; the
#      flagship benches have been running the reference 0.1 schedule).
run_job 50_n4_tuned 5400 python scripts/bench_tridiag.py --batch 8 --players 4 --horizon 30 \
  --tiers tridiag_auto --polish --tightening-rate 0.02 --skip-lane-change
run_job 51_n10_tuned 7200 python scripts/bench_tridiag.py --batch 8 --players 10 --horizon 30 \
  --tiers tridiag_auto --polish --tightening-rate 0.02 --skip-lane-change
# 3. QP tier ladder: is schur the right QP default on-chip?
run_job 52_qp_schur_pallas 5400 python bench.py --suite qp --tol 1e-5 --tier schur_pallas
run_job 53_qp_condensed 5400 python bench.py --suite qp --tol 1e-5 --tier condensed
# 4. N=4 B=128 tuned (lane-major + tuned schedule).
run_job 54_n4_b128_tuned 5400 python scripts/bench_tridiag.py --batch 128 --players 4 --horizon 30 \
  --tiers tridiag_pallas --polish --tightening-rate 0.02 --skip-lane-change
echo "STAGE5 COMPLETE $(date -u)" >> "$LOGS/queue.log"
