#!/bin/sh
# Auto-chain the post-training eval ritual onto the ref20 run: poll for the
# training harness's end-of-run summary.json, then launch
# posttrain_eval_tpu.py against the run artifact (VERDICT task #2 — the
# reference's README.md:20-56 ritual: local_all --backbone multi 1:1 AND
# 1:n over all 40 clients + ijbc_all both jobs on the final checkpoint).
# The chip frees the moment train.py exits, so chaining here wastes none of
# the session's remaining accelerator time.
#
# The chain runs under its OWN setsid pgid with its OWN deadman against the
# same deadline file: whenever the deadline passes, the chip is freed no
# matter which phase (train harness or posttrain eval) currently owns it —
# the driver's end-of-round bench must never contend the single tunneled
# device.  Evidence (posttrain log + ijbc log tables + summary JSONs) is
# committed as it lands, so a rig wipe mid-chain loses nothing measured.
#
# Usage: sh experiments/ref20_posttrain_watch.sh [work_dir] [deadline_file] \
#            [evidence_dest] [tag]
set -u
W=${1:-/root/repo/artifacts/ref20}
DLF=${2:-/root/repo/artifacts/ref20.deadline}
REPO=/root/repo
DEST=${3:-$REPO/experiments/ref20_live}
TAG=${4:-ref20}
cd "$REPO"
while [ ! -f "$W/summary.json" ]; do
  # stop waiting if the deadman's deadline has passed (the run was killed;
  # a partial run has no complete artifact to evaluate automatically)
  now=$(date +%s); dl=$(cat "$DLF" 2>/dev/null || echo 0)
  [ "$now" -ge "$dl" ] && { echo "deadline passed, no summary; exiting"; exit 1; }
  sleep 30
done
echo "summary.json found at $(date -u +%FT%TZ); launching posttrain chain"
python experiments/harvest_fullscale.py --run_dir "$W/run" \
  --out "experiments/${TAG}_summary.json" || true
git add "experiments/${TAG}_summary.json" 2>/dev/null && \
  git commit -q -m "$TAG: harvest run summary" \
    -- "experiments/${TAG}_summary.json" 2>/dev/null

setsid python experiments/posttrain_eval_tpu.py \
  --run_dir "$W/run" --ijbc_root "$W/ijbc" \
  --out "experiments/${TAG}_posttrain_summary.json" \
  >> "$REPO/artifacts/posttrain.log" 2>&1 &
pid=$!
pg=$(ps -o pgid= -p "$pid" | tr -d ' ')
echo "${pg:-$pid}" > "$REPO/artifacts/posttrain.pid"
nohup sh experiments/ref20_deadman.sh "$REPO/artifacts/posttrain.pid" \
  "$DLF" >> "$REPO/artifacts/deadman_posttrain.log" 2>&1 &

# mini evidence sync for the posttrain phase (the main sync loop tracks the
# training work dir's fixed file list, not the ijbc log tables)
while kill -0 "$pid" 2>/dev/null; do
  sleep 120
  changed=0
  for f in "$REPO/artifacts/posttrain.log" \
           "$W/run/ijbc-1:1/log.txt" "$W/run/ijbc-1:n/log.txt"; do
    [ -f "$f" ] || continue
    case "$f" in
      */ijbc-1:1/*) out="$DEST/ijbc_11_log.txt" ;;
      */ijbc-1:n/*) out="$DEST/ijbc_1n_log.txt" ;;
      *) out="$DEST/posttrain.log" ;;
    esac
    cmp -s "$f" "$out" 2>/dev/null || { cp "$f" "$out" && changed=1; }
  done
  # the chain flushes its summary incrementally (phase granularity) —
  # commit each phase's results the moment they land
  git add "$DEST" 2>/dev/null
  [ -f "experiments/${TAG}_posttrain_summary.json" ] && \
    git add "experiments/${TAG}_posttrain_summary.json" 2>/dev/null
  git diff --cached --quiet 2>/dev/null || \
    git commit -q -m "$TAG posttrain evidence sync" 2>/dev/null
done
wait "$pid"
rc=$?
echo "posttrain chain exited rc=$rc at $(date -u +%FT%TZ)"
git add "experiments/${TAG}_posttrain_summary.json" 2>/dev/null && \
  git commit -q -m "$TAG: post-training eval summary (local_all 1:1+1:n, ijbc both jobs)" \
    -- "experiments/${TAG}_posttrain_summary.json" 2>/dev/null
exit "$rc"
