#!/bin/sh
# Live evidence sync for the protocol-complete 20-round run (ref20).
#
# The dev rig has now been WIPED twice mid-run (FULLSCALE20_STATUS.md):
# first /tmp, then the full VM image including gitignored repo files.  The
# only storage that provably survives is git history.  This loop copies the
# run's measurement artifacts (training.log, harness log, summary) into the
# git-tracked experiments/ref20_live/ every SYNC_S seconds and commits when
# they changed, so every completed round's evidence is durable the moment
# it is logged — a wipe can cost resumability, never measurements.
#
# Usage: sh experiments/ref20_sync.sh [work_dir] [sync_seconds] [dest] [hlog]
set -u
WORK=${1:-/root/repo/artifacts/ref20}
SYNC=${2:-300}
DEST=${3:-/root/repo/experiments/ref20_live}
HLOG=${4:-/root/repo/artifacts/ref20.log}
mkdir -p "$DEST"
cd /root/repo
while :; do
  changed=0
  for f in run/training.log run/local_log.txt summary.json \
           pre/pretrain.log; do
    src="$WORK/$f"
    out="$DEST/$(basename "$f")"
    if [ -f "$src" ] && ! cmp -s "$src" "$out" 2>/dev/null; then
      cp "$src" "$out" && changed=1
    fi
  done
  if [ -f "$HLOG" ] && \
     ! cmp -s "$HLOG" "$DEST/harness.log"; then
    cp "$HLOG" "$DEST/harness.log" && changed=1
  fi
  if [ "$changed" = 1 ]; then
    # tolerate index-lock races with interactive commits: skip this tick,
    # the next one retries
    git add "$DEST" 2>/dev/null && \
      git commit -q -m "ref20 live evidence sync" -- "$DEST" 2>/dev/null
  fi
  sleep "$SYNC"
done
