#!/bin/bash
# Round-4 stage 6b: demo retrain with the DEMO config (N=3, h=10, ih=4).
set -u
SNAP=/root/repo/.tpu_run
LOGS=/root/repo/logs/tpu_queue_r4f
mkdir -p "$LOGS"
cd "$SNAP"
export PYTHONPATH="$SNAP:${PYTHONPATH:-}"
name=04_train_demo_n3
if [ ! -f "$LOGS/$name.done" ]; then
  for attempt in 1 2; do
    echo "=== $name attempt $attempt ($(date -u +%H:%M:%S)) ===" >> "$LOGS/$name.log"
    timeout 7200 python scripts/train_selection.py --data /root/repo/demo/data \
      --players 3 --horizon 10 --input-horizon 4 --epochs 12 --batch-size 8 \
      --lr 0.01 --log-dir "$LOGS/train_run_n3" >> "$LOGS/$name.log" 2>&1
    rc=$?
    echo "=== exit $rc ($(date -u +%H:%M:%S)) ===" >> "$LOGS/$name.log"
    if [ $rc -eq 0 ]; then touch "$LOGS/$name.done"; break; fi
    sleep 60
  done
fi
