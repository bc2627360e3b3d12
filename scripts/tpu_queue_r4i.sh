#!/bin/bash
set -u
SNAP=/root/repo/.tpu_run
LOGS=/root/repo/logs/tpu_queue_r4i
mkdir -p "$LOGS"
cd "$SNAP"
export PYTHONPATH="$SNAP:${PYTHONPATH:-}"
name=01_sweep_n4
if [ ! -f "$LOGS/$name.done" ]; then
  for attempt in 1 2; do
    echo "=== $name attempt $attempt ($(date -u +%H:%M:%S)) ===" >> "$LOGS/$name.log"
    timeout 5400 python scripts/sweep_n4.py >> "$LOGS/$name.log" 2>&1
    rc=$?
    echo "=== exit $rc ($(date -u +%H:%M:%S)) ===" >> "$LOGS/$name.log"
    if [ $rc -eq 0 ]; then touch "$LOGS/$name.done"; break; fi
    sleep 60
  done
fi
