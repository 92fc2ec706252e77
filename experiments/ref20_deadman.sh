#!/bin/sh
# Deadman for long TPU runs: kills the ref20 harness process GROUP at a
# deadline so the chip is free before the driver's end-of-round bench
# (bench.py contends the single tunneled device into multi-minute stalls
# otherwise).  The deadline lives in a FILE so it can be extended while the
# run is in flight without restarting the deadman.
#
# Usage: sh experiments/ref20_deadman.sh <pgid_file> <deadline_file>
#   pgid_file:     file holding the harness's process-group id (setsid)
#   deadline_file: file holding a unix epoch; re-write it to extend
set -u
PGF=$1
DLF=$2
while :; do
  now=$(date +%s)
  dl=$(cat "$DLF" 2>/dev/null || echo 0)
  if [ "$now" -ge "$dl" ]; then
    if [ -f "$PGF" ]; then
      pg=$(cat "$PGF")
      # kill the whole group: harness + its train.py/pretrain.py children
      kill -TERM -- "-$pg" 2>/dev/null
      sleep 20
      kill -KILL -- "-$pg" 2>/dev/null
    fi
    echo "deadman fired at $(date -u +%FT%TZ)"
    exit 0
  fi
  sleep 15
done
