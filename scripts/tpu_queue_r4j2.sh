#!/bin/bash
# Round-4 stage 8b: demo eval with the demo README's mode list (Partial NN
# modes match the trained model's input size), then the stage-9 kernels.
set -u
SNAP=/root/repo/.tpu_run
mkdir -p /root/repo/logs/tpu_queue_r4j
cd "$SNAP"
export PYTHONPATH="$SNAP:${PYTHONPATH:-}"
LOGS=/root/repo/logs/tpu_queue_r4j
name=02_eval_demo_modes
if [ ! -f "$LOGS/$name.done" ]; then
  for attempt in 1 2; do
    echo "=== $name attempt $attempt ($(date -u +%H:%M:%S)) ===" >> "$LOGS/$name.log"
    timeout 7200 python scripts/evaluate_selection.py --data /root/repo/demo/data \
      --players 3 --horizon 10 --input-horizon 4 --steps 20 --scenarios 4 \
      --model /root/repo/demo/run/best_model.pkl \
      --modes "All" "Distance Threshold" "Nearest Neighbor" "Neural Network Partial Rank" "Neural Network Partial Threshold" "Barrier Function" \
      --out "$LOGS/eval_out" >> "$LOGS/$name.log" 2>&1
    rc=$?
    echo "=== exit $rc ($(date -u +%H:%M:%S)) ===" >> "$LOGS/$name.log"
    if [ $rc -eq 0 ]; then touch "$LOGS/$name.done"; break; fi
    sleep 60
  done
fi
# chain into stage 9 kernel measurements
bash /root/repo/scripts/tpu_queue_r4k.sh
