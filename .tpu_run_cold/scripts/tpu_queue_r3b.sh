#!/bin/bash
# Round-3b TPU measurement queue (fresh machine; compile cache cold).
# Runs from the .tpu_run HEAD snapshot so the working tree can be edited
# without racing queued re-imports (CLAUDE.md trap). Serialized: ONE TPU
# process at a time (the axon claim is exclusive). Each job is
# timeout-bounded, logged, retried once on transient backend waves.
# Results land in logs/tpu_queue_r3/. Ordered by verdict priority:
# driver metric + smoke gate first, then the VERDICT #3/#4/#5/#7 'done'
# criteria rows, then sweeps.
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
    sleep 60
  done
  touch "$LOGS/$name.failed"
  return 1
}

# 1. Driver metric: certified headline (bench.py default = polish on, b256).
#    Also warms the shared compile cache for the driver's end-of-round run.
run_job 01_headline_certified 7200 python bench.py
# 2. Smoke gate: 13 on-chip Mosaic checks.
run_job 02_tpu_smoke 7200 python scripts/tpu_smoke.py --out "$LOGS/TPU_SMOKE.json"
# 3/4. Certified flagship rows (VERDICT #4 done criterion: N=10 cert >= 6/s).
run_job 22_flagship_n10_cert 7200 python scripts/bench_tridiag.py --batch 8 --players 10 --horizon 30 \
  --tiers tridiag_auto tridiag_pallas_crgjpr --polish --skip-lane-change
run_job 21_flagship_n4_cert 5400 python scripts/bench_tridiag.py --batch 128 --players 4 --horizon 30 \
  --tiers tridiag_pallas --polish --skip-lane-change
# 5. Flagship N=4 at B=128: T-tiled lane-major vs crgjp/crgjpr (VERDICT #3+#4).
run_job 20_flagship_n4_lanes 7200 python scripts/bench_tridiag.py --batch 128 --players 4 --horizon 30 \
  --tiers tridiag_pallas tridiag_pallas_crgjp tridiag_pallas_crgjpr --skip-lane-change
# 6. Refined-GJ at the headline shape (success must be 1.0 where gjp dropped 3%).
run_job 23_headline_gjpr 5400 python bench.py --tier tridiag_pallas_gjpr
# 7/8. Warm receding-horizon suite (honest fields) + Mehrotra variant (VERDICT #7).
run_job 04_warm 5400 python bench.py --suite warm
run_job 24_warm_mehrotra 5400 python bench.py --suite warm --algorithm mehrotra
# 9. QP suite certified at 1e-5 (f32 honest artifact).
run_job 05_qp 5400 python bench.py --suite qp --tol 1e-5
# 10. SPIKE slab kernel-vs-XLA ablation (VERDICT #5 done criterion).
run_job 09_spike_slab 5400 python scripts/microbench_spike_slab.py
# 11. Scaling report chip row at the certified default (VERDICT #6).
run_job 06_scaling_chip 5400 python scripts/scaling_report.py --chip --out "$LOGS/scaling_report_chip.json"
# 12. Lane-major batch sweep B=128..1024 (VERDICT #3 sweep).
run_job 10_b128 5400 python bench.py --batch 128
run_job 11_b512 5400 python bench.py --batch 512
run_job 12_b1024 7200 python bench.py --batch 1024
# 13/14. Flagship masked games, small batch: kernel tier ladder incl. gjpr.
run_job 07_flagship_n4 7200 python scripts/bench_tridiag.py --batch 8 --players 4 --horizon 30 \
  --tiers tridiag tridiag_pallas_crgjp tridiag_pallas_crgjpr tridiag_auto --skip-lane-change
run_job 08_flagship_n10 7200 python scripts/bench_tridiag.py --batch 8 --players 10 --horizon 30 \
  --tiers tridiag tridiag_pallas_crgjp --skip-lane-change
echo "QUEUE COMPLETE $(date -u)" >> "$LOGS/queue.log"
