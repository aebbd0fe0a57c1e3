#!/bin/bash
# Round-4 modality-grid queue v6: continuation of v5 from the p2p_fusion cell
# (waits for the still-running p2p_lidar trainer first).  One fix over v5:
# time-boxed AR-decoder cells can finish with val IoU pinned at 0.0, in which
# case `best_val_iou` is never written (the save condition is a strict
# improvement over the 0.0 init) — every checkpoint reference now falls back
# to `latest`, so the warm-start chain and the evals survive part-trained
# cells.
set -u
cd "$(dirname "$0")/.."

DEADLINE=${QUEUE_DEADLINE:-$(( $(date +%s) + 4450 ))}

XL="experiment.dataset.version=v2xl experiment.dataset.num_train=2048 experiment.dataset.num_val=32 experiment.dataset.num_test=32"
MODES='evaluation.modes=[iou,subset_iou,coco,boundary-coco,polis,chamfer,hausdorff,mta,topdig,juncs,stats]'
CK=outputs/Synthetic_output
B8="experiment.model.batch_size=8"

stamp () { date -u +%H:%M:%S; }
left () { echo $(( DEADLINE - $(date +%s) )); }

# pick_ckpt <run ckpt root> -> echoes best_val_iou|latest (whichever exists)
pick_ckpt () {
  if [ -d "$1/best_val_iou" ]; then echo best_val_iou;
  elif [ -d "$1/latest" ]; then echo latest;
  else echo ""; fi
}

evalrun () {
  local EXP=$1 NAME=$2 MDIR=$3 SIZES=$4; shift 4
  local L=$(left); local TMO=$(( L < 1000 ? L : 1000 ))
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

# 0) Wait for the v5 p2p_lidar cell (standalone after the v5 shell was
#    replaced) to finish — its own `timeout 1700` bounds it. The trainer PID
#    is passed via WAIT_PID (signal-0 probe, no pattern matching).
if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 15; done
fi
echo "[$(stamp)] p2p_lidar cell finished; continuing"

evalrun p2p_lidar p2p_lidar_xl pix2poly "$XL"

# 1) Pix2Poly fusion (graded #3): chain trunk+decoder from p2p_lidar.
trainrun p2p_fusion p2p_fusion_xl 24 1500 "$XL" $CK/pix2poly/224/p2p_lidar_xl/checkpoints "$B8"
evalrun  p2p_fusion p2p_fusion_xl pix2poly "$XL"

# 2) HiSup fusion (graded #4): cold, batch 8, 16 epochs = 4096 steps.
trainrun hisup_fusion hisup_fusion_xl 16 1900 "$XL" - "$B8"
evalrun  hisup_fusion hisup_fusion_xl hisup "$XL"

# 3-4) FFL lidar + fusion: host loader (no device cache), warm, 4 epochs.
FFLWARM=$CK/ffl/224/ffl_image_xl/checkpoints
trainrun ffl_lidar  ffl_lidar_xl  4 1300 "$XL" $FFLWARM "$B8" training.device_cache=false
evalrun  ffl_lidar  ffl_lidar_xl  ffl "$XL"
trainrun ffl_fusion ffl_fusion_xl 4 1300 "$XL" $FFLWARM "$B8" training.device_cache=false
evalrun  ffl_fusion ffl_fusion_xl ffl "$XL"

# 5) HiSup lidar (stretch): warm from fusion.
trainrun hisup_lidar hisup_lidar_xl 10 1200 "$XL" $CK/hisup/224/hisup_fusion_xl/checkpoints "$B8"
evalrun  hisup_lidar hisup_lidar_xl hisup "$XL"

echo "[$(stamp)] QUEUE done (left=$(left)s)"
