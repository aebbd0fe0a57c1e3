#!/bin/bash
# Round-5 queue v6 — the fixed-lidar retrain. v1-v5 trained every lidar and
# fusion cell on data whose loader collapsed ALL lidar points to row==height
# (synthetic top_left stamp bug, fixed in commit 6571fb4): those cells could
# never learn. With the georeference repaired and the poisoned cache packs
# deleted, retrain the six lidar/fusion grid cells warm-chained:
#   ffl_lidar (canary, fast learner, donates pillar trunk)
#   -> p2p_lidar (graded #2, biggest box)
#   -> p2p_fusion (graded #3, warm from the NEW p2p_lidar)
#   -> hisup_lidar (graded #4, warm from ffl_lidar trunk)
#   -> ffl_fusion -> hisup_fusion (host loader; cache OOMs) -> hisup_image
# Old run dirs keep their names (harvest/grid globs) but the broken-data
# checkpoints/results are moved aside first.
set -u
cd "$(dirname "$0")/.."

DEADLINE=${QUEUE_DEADLINE:-1787054500}

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

# Move broken-data artifacts aside so evals/harvest can never pick them up.
archive () {
  local D=$1
  for sub in checkpoints results; do
    if [ -d "$D/$sub" ] && [ ! -d "$D/${sub}_brokenlidar" ]; then
      mv "$D/$sub" "$D/${sub}_brokenlidar"
      echo "[$(stamp)] ARCHIVED $D/$sub -> ${sub}_brokenlidar"
    fi
  done
}

evalrun () {
  local EXP=$1 NAME=$2 MDIR=$3 SPLIT=$4 CAP=$5; shift 5
  local L=$(left); local TMO=$(( L < CAP ? L : CAP ))
  if [ "$TMO" -lt 240 ]; then echo "[$(stamp)] QUEUE-SKIP eval $NAME $SPLIT (deadline)"; return; fi
  if [ ! -f "$LOGD/trained_${NAME}_v6.ok" ]; then
    echo "[$(stamp)] QUEUE-SKIP eval $NAME $SPLIT (train did not run on fixed data)"; return
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
  archive "$CK"/*/224/$NAME
  local INITARG=""
  case "$INIT" in
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
    touch "$LOGD/trained_${NAME}_v6.ok"
    echo "[$(stamp)] QUEUE-OK train $NAME (rc=$RC)"
  else
    echo "[$(stamp)] QUEUE-FAIL train $NAME (rc=$RC; see $LOGD/train_${NAME}.log)"
  fi
}

B8="experiment.model.batch_size=8"
B4="experiment.model.batch_size=4"

# ---- 1) FFL lidar: canary for the georeference fix + pillar-trunk donor.
trainrun ffl_lidar ffl_lidar_xl 16 2000 3 warm:$CK/ffl/224/ffl_image_xl/checkpoints "$B8" training.device_cache=auto
evalrun  ffl_lidar ffl_lidar_xl ffl val  800
evalrun  ffl_lidar ffl_lidar_xl ffl test 800

# ---- 2) Pix2Poly lidar (graded #2): biggest box. Warm from the broken-data
# run's decoder (it learned polygon token structure; encoder re-learns).
trainrun p2p_lidar p2p_lidar_xl 90 5400 5 warm:$CK/pix2poly/224/p2p_lidar_xl/checkpoints_brokenlidar "$B8" training.device_cache=true
evalrun  p2p_lidar p2p_lidar_xl pix2poly val  1200
evalrun  p2p_lidar p2p_lidar_xl pix2poly test 1200

# ---- 3) Pix2Poly fusion (graded #3): warm from the NEW lidar run.
trainrun p2p_fusion p2p_fusion_xl 60 3900 5 warm:$CK/pix2poly/224/p2p_lidar_xl/checkpoints "$B8" training.device_cache=true
evalrun  p2p_fusion p2p_fusion_xl pix2poly val  1200
evalrun  p2p_fusion p2p_fusion_xl pix2poly test 1200

# ---- 4) HiSup lidar (graded #4): pillar trunk from the new FFL lidar.
trainrun hisup_lidar hisup_lidar_xl 20 2000 3 warm:$CK/ffl/224/ffl_lidar_xl/checkpoints "$B4" training.device_cache=true
evalrun  hisup_lidar hisup_lidar_xl hisup val 1200
evalrun hisup_lidar hisup_lidar_xl hisup test 1200

# ---- 5) FFL fusion: ViT trunk from FFL image.
trainrun ffl_fusion ffl_fusion_xl 14 1800 3 warm:$CK/ffl/224/ffl_image_xl/checkpoints "$B8" training.device_cache=auto
evalrun  ffl_fusion ffl_fusion_xl ffl val 1200
evalrun ffl_fusion ffl_fusion_xl ffl test 1200

# ---- 6) HiSup fusion: host loader (the il cache OOMs the 16GB v5e even at
# batch 4); heads warm from hisup_lidar if it trained.
trainrun hisup_fusion hisup_fusion_xl 10 2400 2 warm:$CK/hisup/224/hisup_lidar_xl/checkpoints "$B8" training.device_cache=false
evalrun  hisup_fusion hisup_fusion_xl hisup val 1200
evalrun hisup_fusion hisup_fusion_xl hisup test 1200

# ---- 7) Bonus (VERDICT r4 weak #3): HiSup image on xl data.
trainrun hisup_image hisup_image_xl 20 1800 3 warm:$CK/hisup/224/hisup_fusion_xl/checkpoints "$B8" training.device_cache=true
evalrun  hisup_image hisup_image_xl hisup val 1200
evalrun hisup_image hisup_image_xl hisup test 1200

echo "[$(stamp)] QUEUE v6 done (left=$(left)s) — starting harvest"
bash scripts/round5_harvest.sh
