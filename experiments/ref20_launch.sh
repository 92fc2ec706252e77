#!/bin/sh
# One-shot launcher for the protocol-complete 20-round run (ref20), fresh
# or resumed, with the full survival kit: setsid + pgid file (kill without
# pkill patterns), deadman (frees the chip before driver bench), and the
# git evidence sync loop (wipes can't erase measurements).
#
# Usage: sh experiments/ref20_launch.sh [fresh|resume] [deadline_epoch]
set -eu
MODE=${1:-fresh}
DL=${2:-$(($(date +%s) + 3000))}
REPO=/root/repo
W=$REPO/artifacts/ref20
# veri_ids MUST equal clients*ids_per_client: the synthetic veri split's
# gids are 0..veri_ids-1 (data/synthetic.py:329, same identities as the FL
# pool), so a smaller draw leaves the tail clients with NO veri presence
# and their personalized 1:1/1:n tables degenerate to TPR=FPR (observed
# live 2026-08-20: candidates 11+ at veri_ids=1000 read [10.0, 1.0, ...]
# while clients 1/5 read real improving TPR).
SPEC_EXTRA='expr=0.6,noise=25,imgs_min=20,imgs_max=24,public_ids=1000,public_imgs=70000,veri_ids=4000,veri_imgs=8'
mkdir -p "$REPO/artifacts"
echo "$DL" > "$REPO/artifacts/ref20.deadline"

cd "$REPO"
if [ "$MODE" = resume ]; then
  EXTRA="--skip_pretrain --resume"
else
  EXTRA="--pretrain_epochs 12"
fi
# log APPENDS across relaunches: the sync loop snapshots it into git, and a
# truncating relaunch would overwrite the committed evidence of earlier
# attempts with an empty file
# NO --ckpt_bg_fetch: measured OOM 2026-08-20 08:05 — the background
# fetch keeps a full resume-state snapshot (~7.6 GB of client+global
# states) alive on device through the NEXT round, and on one 15.75 GB
# chip with 40 resident client states (~8.6 GB, BENCH r4 telemetry) that
# tips HBM over (RESOURCE_EXHAUSTED mid-fetch, round 1).  The flag is a
# multi-chip knob (states shard over the client axis); single-chip runs
# pay the synchronous fetch (~3.6 min per checkpointed round here).
setsid python experiments/fullscale_tpu.py --work_dir "$W" \
  --rounds 20 $EXTRA --cache_contrastive --ckpt_async \
  --round_ckpt_every 3 \
  --spec_extra "$SPEC_EXTRA" \
  --hn_threshold 0.40 \
  --stall_timeout 1800 --max_restarts 30 \
  --pgid_file "$REPO/artifacts/fullscale20.pid" \
  >> "$REPO/artifacts/ref20.log" 2>&1 &
# provisional (harness overwrites with its real pgid via --pgid_file; $! is
# only correct when this launcher runs without job control)
echo $! > "$REPO/artifacts/fullscale20.pid"
echo "harness pgid $(cat "$REPO/artifacts/fullscale20.pid")"

nohup sh experiments/ref20_deadman.sh "$REPO/artifacts/fullscale20.pid" \
  "$REPO/artifacts/ref20.deadline" > "$REPO/artifacts/deadman.log" 2>&1 &
echo $! > "$REPO/artifacts/deadman.pid"
nohup sh experiments/ref20_sync.sh "$W" 240 \
  > "$REPO/artifacts/sync.log" 2>&1 &
echo $! > "$REPO/artifacts/sync.pid"
echo "deadman $(cat "$REPO/artifacts/deadman.pid"), sync $(cat "$REPO/artifacts/sync.pid"), deadline $DL"
