#!/bin/sh
# ref20b: the BUDGET-FIT protocol-complete 20-round program.
#
# Chip-time budgeting (VERDICT r4: "round 5 must treat chip-time budgeting
# as a first-class engineering problem"): the full-scale ref20 config needs
# ~4 h of single-chip time (measured: 136 min to mid-round-7, twice), which
# can never fit inside one ~2 h driver session, and round checkpoints do
# not survive rig wipes (only git does).  ref20b keeps EVERY protocol
# element of the reference run (run.sh:3: 40 clients, 20 rounds, CosFace +
# BCE + contrastive + --fedface, adaptive local epochs 10->8->6->4,
# SpreadOut, per-round personalized tests, round checkpoints, the
# post-training local_all 1:1/1:n + IJB-C ritual) and shrinks only the
# synthetic-universe VOLUME knobs so a complete program + posttrain eval
# fits ~110 min:
#   public_imgs 70000 -> 20000   (mining volume + pretrain + embeds ~3.5x)
#   imgs_min/max 20-24 -> 8-10   (client base set ~2.4x)
#   veri_imgs 8 -> 4             (per-round personalized eval ~2x)
# veri_ids stays 4000 = clients*ids_per_client (hard constraint: the veri
# gids cover the FL pool; see ref20_launch.sh).  Measured full-scale phase
# data (experiments/ref20_attempt1_partial.json) scales to ~3.3 min warm
# rounds.  --HN_cap 4000 is a safety valve only: the 12-epoch pretrain on
# the smaller public set is uncalibrated, and a mining balloon (threshold
# saturating on compact geometry) would otherwise blow the budget; the cap
# binds only above a 20% mined fraction.
#
# Usage: sh experiments/ref20b_launch.sh [fresh|resume] [deadline_epoch]
set -eu
MODE=${1:-fresh}
DL=${2:-$(($(date +%s) + 6000))}
REPO=/root/repo
W=$REPO/artifacts/ref20b
SPEC_EXTRA='expr=0.6,noise=25,imgs_min=8,imgs_max=10,public_ids=1000,public_imgs=20000,public_imgs_min=16,public_imgs_max=24,veri_ids=4000,veri_imgs=4'
mkdir -p "$REPO/artifacts"
echo "$DL" > "$REPO/artifacts/ref20b.deadline"

cd "$REPO"
if [ "$MODE" = resume ]; then
  EXTRA="--skip_pretrain --resume"
else
  EXTRA="--pretrain_epochs 12"
fi
# ROUNDS/ckpt/cache re-scoped live (2026-08-21 05:35): the lite universe
# exposed a ~10 s/client tunnel-latency floor (mining + prep round-trips)
# that volume knobs cannot shrink — measured round-0 client cadence 12-13 s
# at 960 imgs/client vs 11 s at 5.6k imgs full-scale.  20 rounds x 40
# clients x 10 s = 133 min of client loop alone: impossible in the session
# remainder.  A COMPLETED program + the never-yet-run posttrain ritual
# outranks more incomplete rounds, so: 4 rounds (the full adaptive-epoch
# decay arc 10->8->6->4), no mid-run resume state (--round_ckpt_every 0;
# train.py still exports the final backbone), no contrastive cache (at
# ~1k imgs/client the per-client cache build costs more than the frozen
# forwards it saves — the cache pays at 45k imgs, DESIGN.md).
setsid python experiments/fullscale_tpu.py --work_dir "$W" \
  --rounds 4 $EXTRA \
  --round_ckpt_every 0 \
  --spec_extra "$SPEC_EXTRA" \
  --hn_threshold 0.40 --hn_cap 4000 \
  --stall_timeout 1200 --max_restarts 30 \
  --pgid_file "$REPO/artifacts/ref20b.pid" \
  >> "$REPO/artifacts/ref20b.log" 2>&1 &
echo $! > "$REPO/artifacts/ref20b.pid"
echo "harness pgid $(cat "$REPO/artifacts/ref20b.pid")"

nohup sh experiments/ref20_deadman.sh "$REPO/artifacts/ref20b.pid" \
  "$REPO/artifacts/ref20b.deadline" > "$REPO/artifacts/deadman.log" 2>&1 &
echo $! > "$REPO/artifacts/deadman.pid"
nohup sh experiments/ref20_sync.sh "$W" 240 \
  "$REPO/experiments/ref20b_live" "$REPO/artifacts/ref20b.log" \
  > "$REPO/artifacts/sync.log" 2>&1 &
echo $! > "$REPO/artifacts/sync.pid"
nohup sh experiments/ref20_posttrain_watch.sh "$W" \
  "$REPO/artifacts/ref20b.deadline" "$REPO/experiments/ref20b_live" ref20b \
  > "$REPO/artifacts/posttrain_watch.log" 2>&1 &
echo $! > "$REPO/artifacts/posttrain_watch.pid"
echo "deadman $(cat "$REPO/artifacts/deadman.pid"), sync $(cat "$REPO/artifacts/sync.pid"), deadline $DL"
