#!/bin/bash
# Round-4 stage 8: refresh the demo closed-loop evaluation on-chip with the
# round-4 retrained model.
set -u
SNAP=/root/repo/.tpu_run
LOGS=/root/repo/logs/tpu_queue_r4j
mkdir -p "$LOGS"
cd "$SNAP"
export PYTHONPATH="$SNAP:${PYTHONPATH:-}"
name=01_eval_demo
if [ ! -f "$LOGS/$name.done" ]; then
  for attempt in 1 2; do
    echo "=== $name attempt $attempt ($(date -u +%H:%M:%S)) ===" >> "$LOGS/$name.log"
    timeout 7200 python scripts/evaluate_selection.py --data /root/repo/demo/data \
      --players 3 --horizon 10 --input-horizon 4 --steps 20 --scenarios 4 \
      --model /root/repo/demo/run/best_model.pkl --out "$LOGS/eval_out" >> "$LOGS/$name.log" 2>&1
    rc=$?
    echo "=== exit $rc ($(date -u +%H:%M:%S)) ===" >> "$LOGS/$name.log"
    if [ $rc -eq 0 ]; then touch "$LOGS/$name.done"; break; fi
    sleep 60
  done
fi
