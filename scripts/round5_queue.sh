#!/bin/bash
# Round-5 training queue: close the 3x3 modality grid with real chip time
# (VERDICT r4 "Next round" #1-#3, #6). Order = graded configs first:
#   1. p2p_lidar  (graded #2)  — resume the round-4 epoch-13 checkpoint, multi-hour box
#   2. p2p_fusion (graded #3)  — resume round-4 best_val_loss (epoch 0), multi-hour box
#   3. hisup_fusion (graded #4) — batch 4 (the round-4 OOM mitigation)
#   4. hisup_lidar              — batch 4
#   5. ffl_lidar / ffl_fusion   — device_cache=auto (FFL cache lands mid-round;
#                                 falls back to the host loader otherwise)
#   7. hisup_image_xl (stretch, VERDICT weak #3)
# Every train box is followed by val+test eval boxes so each cell's grid entry
# is banked before the next cell starts. All boxes shrink to the deadline.
set -u
cd "$(dirname "$0")/.."

# round-5 driver budget: first PROGRESS entry ts 1787015954 + 43200, minus a
# ~27 min reserve for final harvest/bench/commit.
DEADLINE=${QUEUE_DEADLINE:-1787057500}

XL="experiment.dataset.version=v2xl experiment.dataset.num_train=2048 experiment.dataset.num_val=32 experiment.dataset.num_test=32"
MODES='evaluation.modes=[iou,subset_iou,coco,boundary-coco,polis,chamfer,hausdorff,mta,topdig,juncs,stats]'
CK=outputs/Synthetic_output
LOGD=outputs/round5_logs
mkdir -p "$LOGD"

stamp () { date -u +%H:%M:%S; }
left () { echo $(( DEADLINE - $(date +%s) )); }

# pick_ckpt <ckpt-dir> <name1> <name2> ... : first existing completed save
pick_ckpt () {
  local D=$1; shift
  for c in "$@"; do
    if [ -d "$D/$c" ]; then echo $c; return; fi
  done
  echo ""
}

# evalrun EXP NAME MDIR SPLIT CAP extra...
evalrun () {
  local EXP=$1 NAME=$2 MDIR=$3 SPLIT=$4 CAP=$5; shift 5
  local L=$(left); local TMO=$(( L < CAP ? L : CAP ))
  if [ "$TMO" -lt 240 ]; then echo "[$(stamp)] QUEUE-SKIP eval $NAME $SPLIT (deadline)"; return; fi
  # only evaluate cells whose round-5 train box ran (completed or hit its
  # timeout); a crashed train leaves stale garbage checkpoints not worth
  # 10+ min of part-trained decode
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

# trainrun EXP NAME EPOCHS CAP VAL_EVERY INIT extra...
#   INIT: "resume:<ckpt-name>" | "warm:<ckpt-dir>" | "-"
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
  # rc 0 = schedule completed; rc 124/143 = box timeout (normal for the long
  # AR cells — training progressed, checkpoints are fresh). Anything else is
  # a crash: no ok-marker, downstream eval skipped.
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

# ---- 1) Pix2Poly LiDAR (graded #2): resume round-4 epoch-13 state, ~3h box.
# batch 8: the batch-16 resume OOM'd on the first step (resume transients on
# top of the resident cache; round 4's cold start at 16 fit, the resume does
# not) — see outputs/round5_logs/train_p2p_lidar_xl.log from the first launch.
trainrun p2p_lidar p2p_lidar_xl 120 10500 45 resume:latest "$B8" training.device_cache=true
evalrun  p2p_lidar p2p_lidar_xl pix2poly val  1100
evalrun  p2p_lidar p2p_lidar_xl pix2poly test 1100

# ---- 2) Pix2Poly fusion (graded #3): resume round-4 epoch-0 save, ~2.4h box.
trainrun p2p_fusion p2p_fusion_xl 85 8700 45 resume:best_val_loss "$B8" training.device_cache=true
evalrun  p2p_fusion p2p_fusion_xl pix2poly val  1100
evalrun  p2p_fusion p2p_fusion_xl pix2poly test 1100

# ---- 3) HiSup fusion (graded #4): batch 4 = the round-4 OOM mitigation.
trainrun hisup_fusion hisup_fusion_xl 40 2700 3 warm:$FFLW "$B4" training.device_cache=true
evalrun  hisup_fusion hisup_fusion_xl hisup val  900
evalrun  hisup_fusion hisup_fusion_xl hisup test 900

# ---- 4) HiSup lidar: batch 4 (pillar encoder).
trainrun hisup_lidar hisup_lidar_xl 40 2700 3 warm:$FFLW "$B4" training.device_cache=true
evalrun  hisup_lidar hisup_lidar_xl hisup val  900
evalrun  hisup_lidar hisup_lidar_xl hisup test 900

# ---- 5) FFL lidar: real epochs this time (VERDICT weak #4).
trainrun ffl_lidar ffl_lidar_xl 14 2400 3 resume:latest "$B8" training.device_cache=auto
evalrun  ffl_lidar ffl_lidar_xl ffl val  800
evalrun  ffl_lidar ffl_lidar_xl ffl test 800

# ---- 6) FFL fusion.
trainrun ffl_fusion ffl_fusion_xl 14 2400 3 warm:$FFLW "$B8" training.device_cache=auto
evalrun  ffl_fusion ffl_fusion_xl ffl val  800
evalrun  ffl_fusion ffl_fusion_xl ffl test 800

# ---- 7) Stretch: HiSup image on the xl split (VERDICT weak #3).
trainrun hisup_image hisup_image_xl 40 2400 3 warm:$FFLW "$B8" training.device_cache=true
evalrun  hisup_image hisup_image_xl hisup val  900
evalrun  hisup_image hisup_image_xl hisup test 900

echo "[$(stamp)] QUEUE done (left=$(left)s)"
