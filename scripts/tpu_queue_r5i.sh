#!/bin/bash
# Round-5 TPU queue stage 3d: recapture headline + QP with the corrected
# timing protocol (theta uploads VALUE-forced outside the clock — the
# round-5 "dispatch slack" was the h2d upload riding inside the timed
# span; see bench.py). Everything is compile-cached by stage 3.
set -u
SNAP=/root/repo/.tpu_run
LOGS=/root/repo/logs/tpu_queue_r5i
mkdir -p "$LOGS" "$SNAP"
cd /root/repo && git archive HEAD | tar -x -C "$SNAP"
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

run_job 00_headline 1800 python bench.py
echo "queue r5d complete $(date -u +%H:%M:%S)" >> "$LOGS/queue.log"
