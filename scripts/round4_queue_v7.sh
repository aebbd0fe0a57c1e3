#!/bin/bash
# Round-4 modality-grid queue v7: final-hour replan. The p2p_fusion AR decoder
# was stopped early (its lidar sibling proved a time-boxed cell stays near
# IoU 0 — the decoder needs far more steps than the box allows, so marginal
# training minutes were worthless there) and the banked time goes to
# HiSup-fusion, the remaining graded config (#4 "HiSup multimodal"), which as
# a dense-prediction model learns fast enough for a time-boxed cell to
# produce a meaningful grid entry. Checkpoint preference order now includes
# best_val_loss: stopping the fusion trainer mid-save left `latest` as an
# uncommitted orbax tmp, so the completed best-val-loss save is the fallback.
set -u
cd "$(dirname "$0")/.."

DEADLINE=${QUEUE_DEADLINE:-1787010048}

XL="experiment.dataset.version=v2xl experiment.dataset.num_train=2048 experiment.dataset.num_val=32 experiment.dataset.num_test=32"
MODES='evaluation.modes=[iou,subset_iou,coco,boundary-coco,polis,chamfer,hausdorff,mta,topdig,juncs,stats]'
CK=outputs/Synthetic_output
B8="experiment.model.batch_size=8"

stamp () { date -u +%H:%M:%S; }
left () { echo $(( DEADLINE - $(date +%s) )); }

pick_ckpt () {
  for c in best_val_iou latest best_val_loss; do
    if [ -d "$1/$c" ]; then echo $c; return; fi
  done
  echo ""
}

evalrun () {
  local EXP=$1 NAME=$2 MDIR=$3 SIZES=$4 CAP=$5; shift 5
  local L=$(left); local TMO=$(( L < CAP ? L : CAP ))
  if [ "$TMO" -lt 240 ]; then echo "[$(stamp)] QUEUE-SKIP eval $NAME (deadline)"; return; fi
  local CKPT=$(pick_ckpt "$CK/$MDIR/224/$NAME/checkpoints")
  if [ -z "$CKPT" ]; then echo "[$(stamp)] QUEUE-SKIP eval $NAME (no checkpoint)"; return; fi
  echo "[$(stamp)] QUEUE eval $NAME val (ckpt=$CKPT tmo=$TMO)"
  timeout $TMO nice -n -10 python scripts/predict.py experiment=$EXP dataset=synthetic \
    run_type=release $SIZES experiment.name=$NAME evaluation=val \
    checkpoint=$CKPT "$MODES" "$@" 2>&1 | tail -6 \
    && echo "[$(stamp)] QUEUE-OK eval $NAME val" \
    || echo "[$(stamp)] QUEUE-FAIL eval $NAME val"
}

trainrun () {
  local EXP=$1 NAME=$2 EPOCHS=$3 TMO=$4 SIZES=$5 WARM=$6; shift 6
  local L=$(left); [ "$TMO" -gt "$L" ] && TMO=$L
  if [ "$TMO" -lt 420 ]; then echo "[$(stamp)] QUEUE-SKIP train $NAME (deadline)"; return; fi
  local WARMARG=""
  if [ "$WARM" != "-" ]; then
    local C=$(pick_ckpt "$WARM")
    if [ -n "$C" ]; then WARMARG="init_weights_from=$WARM/$C";
    else echo "[$(stamp)] QUEUE-WARN warmstart missing for $NAME: $WARM (cold start)"; fi
  fi
  echo "[$(stamp)] QUEUE train $NAME (epochs=$EPOCHS tmo=$TMO warm=${WARMARG:-none})"
  timeout $TMO nice -n -10 python scripts/train.py experiment=$EXP dataset=synthetic \
    run_type=release $SIZES training.device_cache=true experiment.model.num_epochs=$EPOCHS \
    training.val_every=3 experiment.name=$NAME $WARMARG "$@" 2>&1 \
    | grep -E "epoch|warm|error|Error|Traceback|EXHAUSTED" | tail -60 \
    && echo "[$(stamp)] QUEUE-OK train $NAME" \
    || echo "[$(stamp)] QUEUE-FAIL train $NAME"
}

# 1) Eval the early-stopped p2p_fusion cell (graded #3) from its completed save.
evalrun p2p_fusion p2p_fusion_xl pix2poly "$XL" 800

# 2) HiSup fusion (graded #4): everything left minus a reserved eval slot.
L=$(left)
HTMO=$(( L - 520 ))
trainrun hisup_fusion hisup_fusion_xl 40 $HTMO "$XL" $CK/ffl/224/ffl_image_xl/checkpoints "$B8"
evalrun  hisup_fusion hisup_fusion_xl hisup "$XL" 520

# 3) Stretch (only if the above finished early): FFL lidar, warm, host loader.
trainrun ffl_lidar ffl_lidar_xl 4 900 "$XL" $CK/ffl/224/ffl_image_xl/checkpoints "$B8" training.device_cache=false
evalrun  ffl_lidar ffl_lidar_xl ffl "$XL" 500

echo "[$(stamp)] QUEUE done (left=$(left)s)"
