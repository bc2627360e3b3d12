#!/bin/bash
# Round-4 TPU queue stage 3: traced headline (where does the 6-min problem
# build go), N=4 device rate, QP refinement-0, f64 reference-protocol row,
# streamed + warm suites.
set -u
SNAP=/root/repo/.tpu_run
LOGS=/root/repo/logs/tpu_queue_r4c
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

# 1. Headline with MCPTPU_BUILD_TRACE: pinpoint the ~370 s problem build.
run_job 01_headline_traced 3600 python bench.py
# 2. N=4 flagship: hybrid + device rate (in-graph fori amortizes dispatch).
run_job 02_n4_hybrid_ingraph 3600 python scripts/bench_tridiag.py --batch 8 --players 4 --horizon 30 --tiers tridiag_auto --polish --skip-lane-change --algorithm hybrid --refinement-steps 0 --ingraph
# 3. QP with refinement 0 (the new suite default).
run_job 03_qp_ref0 3600 python bench.py --suite qp --tol 1e-5
# 4. Reference-protocol f64 QP row on-chip (tol 1e-6, path.jl:8); smaller
#    batch — f64 is emulated on TPU.
run_job 04_qp_f64 5400 python bench.py --suite qp --tol 1e-6 --x64 --batch 64 --repeats 3
# 5. Streamed serving row (with failure standalone verification).
run_job 05_stream 3600 python bench.py --stream 8
# 6. Warm receding-horizon suite.
run_job 06_warm 3600 python bench.py --suite warm
# 7. QP phase profile incl. the big-tile and WY kernel variants.
run_job 07_qp_phases2 3600 python scripts/profile_qp_phases.py --iters 10
# 8. Roofline rerun with the PRODUCTION Pallas dispatcher (first pass timed
#    the XLA scan by mistake).
run_job 08_roofline2 5400 python scripts/roofline.py --measure --iters 10 --json "$LOGS/roofline.json"
