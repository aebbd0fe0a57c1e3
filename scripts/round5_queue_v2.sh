#!/bin/bash
# Round-5 queue v2 (replaces round5_queue.sh from the p2p_lidar cell on).
# Changes vs v1, planned while cell 1 trained:
#   - p2p_fusion warm-starts from the freshly-trained p2p_lidar_xl (shared
#     ViT trunk + AR decoder + pillar nets via the fuzzy suffix matcher)
#     instead of resuming its own round-4 epoch-0 state;
#   - ffl_lidar moved BEFORE hisup_lidar so hisup_lidar can warm from its
#     trained pointpillars_vit_cnn trunk (the v1 FFLW→HiSup warm-starts were
#     no-ops: vit_cnn donor vs hrnet/fusion_hrnet targets share no suffixes);
#   - hisup_image_xl warms from hisup_fusion_xl's HRNet trunk;
#   - ends by running scripts/round5_harvest.sh so the dated perf table +
#     grid refresh are guaranteed chip time before the driver deadline.
# Waits for the surviving v1 p2p_lidar trainer (WAIT_PID) to finish first.
set -u
cd "$(dirname "$0")/.."

# stop cells early enough to leave the harvest ~1h of chip
DEADLINE=${QUEUE_DEADLINE:-1787054500}
WAIT_PID=${WAIT_PID:-}

XL="experiment.dataset.version=v2xl experiment.dataset.num_train=2048 experiment.dataset.num_val=32 experiment.dataset.num_test=32"
MODES='evaluation.modes=[iou,subset_iou,coco,boundary-coco,polis,chamfer,hausdorff,mta,topdig,juncs,stats]'
CK=outputs/Synthetic_output
LOGD=outputs/round5_logs
mkdir -p "$LOGD"

stamp () { date -u +%H:%M:%S; }
left () { echo $(( DEADLINE - $(date +%s) )); }

pick_ckpt () {
  local D=$1; shift
  for c in "$@"; do
    if [ -d "$D/$c" ]; then echo $c; return; fi
  done
  echo ""
}

evalrun () {
  local EXP=$1 NAME=$2 MDIR=$3 SPLIT=$4 CAP=$5; shift 5
  local L=$(left); local TMO=$(( L < CAP ? L : CAP ))
  if [ "$TMO" -lt 240 ]; then echo "[$(stamp)] QUEUE-SKIP eval $NAME $SPLIT (deadline)"; return; fi
  if [ ! -f "$LOGD/trained_${NAME}.ok" ]; then
    echo "[$(stamp)] QUEUE-SKIP eval $NAME $SPLIT (train did not run this round)"; return
  fi
  local ORDER="best_val_iou latest best_val_loss"
  [ "$MDIR" = pix2poly ] && ORDER="latest best_val_iou best_val_loss"
  local CKPT=$(pick_ckpt "$CK/$MDIR/224/$NAME/checkpoints" $ORDER)
  if [ -z "$CKPT" ]; then echo "[$(stamp)] QUEUE-SKIP eval $NAME $SPLIT (no checkpoint)"; return; fi
  echo "[$(stamp)] QUEUE eval $NAME $SPLIT (ckpt=$CKPT tmo=$TMO)"
  timeout $TMO nice -n -10 python scripts/predict.py experiment=$EXP dataset=synthetic \
    run_type=release $XL experiment.name=$NAME evaluation=$SPLIT evaluation.batch_size=32 \
    checkpoint=$CKPT "$MODES" "$@" >"$LOGD/eval_${NAME}_${SPLIT}.log" 2>&1 \
    && echo "[$(stamp)] QUEUE-OK eval $NAME $SPLIT" \
    || echo "[$(stamp)] QUEUE-FAIL eval $NAME $SPLIT (see $LOGD/eval_${NAME}_${SPLIT}.log)"
}

trainrun () {
  local EXP=$1 NAME=$2 EPOCHS=$3 CAP=$4 VE=$5 INIT=$6; shift 6
  local L=$(left); local TMO=$(( L < CAP ? L : CAP ))
  if [ "$TMO" -lt 420 ]; then echo "[$(stamp)] QUEUE-SKIP train $NAME (deadline)"; return; fi
  local INITARG=""
  case "$INIT" in
    resume:*)
      local RN=${INIT#resume:}
      local C=$(pick_ckpt "$CK"/*/224/$NAME/checkpoints $RN latest best_val_loss best_val_iou)
      if [ -n "$C" ]; then INITARG="checkpoint=$C";
      else echo "[$(stamp)] QUEUE-WARN resume ckpt missing for $NAME (cold start)"; fi ;;
    warm:*)
      local WD=${INIT#warm:}
      local C=$(pick_ckpt "$WD" best_val_iou latest best_val_loss)
      if [ -n "$C" ]; then INITARG="init_weights_from=$WD/$C";
      else echo "[$(stamp)] QUEUE-WARN warmstart missing for $NAME: $WD (cold start)"; fi ;;
  esac
  echo "[$(stamp)] QUEUE train $NAME (epochs=$EPOCHS tmo=$TMO init=${INITARG:-none})"
  timeout $TMO nice -n -10 python scripts/train.py experiment=$EXP dataset=synthetic \
    run_type=release $XL experiment.model.num_epochs=$EPOCHS \
    training.val_every=$VE evaluation.batch_size=32 experiment.name=$NAME $INITARG "$@" \
    >"$LOGD/train_${NAME}.log" 2>&1
  local RC=$?
  if [ "$RC" -eq 0 ] || [ "$RC" -eq 124 ] || [ "$RC" -eq 143 ]; then
    touch "$LOGD/trained_${NAME}.ok"
    echo "[$(stamp)] QUEUE-OK train $NAME (rc=$RC)"
  else
    echo "[$(stamp)] QUEUE-FAIL train $NAME (rc=$RC; see $LOGD/train_${NAME}.log)"
  fi
}

B8="experiment.model.batch_size=8"
B4="experiment.model.batch_size=4"
FFLW=$CK/ffl/224/ffl_image_xl/checkpoints

# ---- 0) wait for the surviving v1 p2p_lidar trainer, then eval it --------
if [ -n "$WAIT_PID" ]; then
  echo "[$(stamp)] QUEUE-WAIT for v1 trainer pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "[$(stamp)] QUEUE-WAIT done"
fi
# the v1 cell demonstrably trained (checkpoints advanced past epoch 40)
touch "$LOGD/trained_p2p_lidar_xl.ok"
evalrun  p2p_lidar p2p_lidar_xl pix2poly val  1100
evalrun  p2p_lidar p2p_lidar_xl pix2poly test 1100

# ---- 1) Pix2Poly fusion (graded #3): warm from the trained lidar model.
trainrun p2p_fusion p2p_fusion_xl 85 8700 45 warm:$CK/pix2poly/224/p2p_lidar_xl/checkpoints "$B8" training.device_cache=true
evalrun  p2p_fusion p2p_fusion_xl pix2poly val  1100
evalrun  p2p_fusion p2p_fusion_xl pix2poly test 1100

# ---- 2) HiSup fusion (graded #4): batch 4 = the round-4 OOM mitigation.
trainrun hisup_fusion hisup_fusion_xl 40 2700 3 - "$B4" training.device_cache=true
evalrun  hisup_fusion hisup_fusion_xl hisup val  900
evalrun  hisup_fusion hisup_fusion_xl hisup test 900

# ---- 3) FFL lidar first (donates its pointpillars_vit_cnn trunk).
trainrun ffl_lidar ffl_lidar_xl 14 2400 3 resume:latest "$B8" training.device_cache=auto
evalrun  ffl_lidar ffl_lidar_xl ffl val  800
evalrun  ffl_lidar ffl_lidar_xl ffl test 800

# ---- 4) HiSup lidar warm from FFL lidar (same encoder family).
trainrun hisup_lidar hisup_lidar_xl 40 2700 3 warm:$CK/ffl/224/ffl_lidar_xl/checkpoints "$B4" training.device_cache=true
evalrun  hisup_lidar hisup_lidar_xl hisup val  900
evalrun  hisup_lidar hisup_lidar_xl hisup test 900

# ---- 5) FFL fusion (ViT trunk from FFL image).
trainrun ffl_fusion ffl_fusion_xl 14 2400 3 warm:$FFLW "$B8" training.device_cache=auto
evalrun  ffl_fusion ffl_fusion_xl ffl val  800
evalrun  ffl_fusion ffl_fusion_xl ffl test 800

# ---- 6) Stretch: HiSup image on the xl split, HRNet trunk from hisup_fusion.
trainrun hisup_image hisup_image_xl 40 2400 3 warm:$CK/hisup/224/hisup_fusion_xl/checkpoints "$B8" training.device_cache=true
evalrun  hisup_image hisup_image_xl hisup val  900
evalrun  hisup_image hisup_image_xl hisup test 900

echo "[$(stamp)] QUEUE v2 done (left=$(left)s) — starting harvest"
bash scripts/round5_harvest.sh
