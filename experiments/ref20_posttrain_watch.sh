#!/bin/sh
# Auto-chain the post-training eval ritual onto the ref20 run: poll for the
# training harness's end-of-run summary.json, then launch
# posttrain_eval_tpu.py against the run artifact (VERDICT task #2 — the
# reference's README.md:20-56 ritual: local_all --backbone multi 1:1 AND
# 1:n over all 40 clients + ijbc_all both jobs on the final checkpoint).
# The chip frees the moment train.py exits, so chaining here wastes none of
# the session's remaining accelerator time.
#
# Usage: sh experiments/ref20_posttrain_watch.sh [work_dir] [deadline_file]
set -u
W=${1:-/root/repo/artifacts/ref20}
DLF=${2:-/root/repo/artifacts/ref20.deadline}
REPO=/root/repo
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
  --out experiments/ref20_summary.json || true
exec python experiments/posttrain_eval_tpu.py \
  --run_dir "$W/run" --ijbc_root "$W/ijbc" \
  --out experiments/ref20_posttrain_summary.json
