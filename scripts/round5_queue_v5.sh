#!/bin/bash
# Round-5 queue v5 (replaces v4 after hisup_fusion OOM'd AGAIN at batch 4
# with the 1.9 GB il cache resident). hisup_fusion retries on the HOST
# loader (no cache residency, batch 8 — the known-good image activations
# shape): ~1 s/step through the tunnel buys ~9 epochs in the box, about the
# round-3 hisup-image step budget that reached IoU 0.87. Waits for the v4
# p2p_fusion_xxl6 trainer, evals it, then continues the remaining cells.
set -u
cd "$(dirname "$0")/.."

DEADLINE=${QUEUE_DEADLINE:-1787054500}
WAIT_PID=${WAIT_PID:-}

XL="experiment.dataset.version=v2xl experiment.dataset.num_train=2048 experiment.dataset.num_val=32 experiment.dataset.num_test=32"
XXL6="experiment.dataset.version=v2xxl experiment.dataset.num_train=8192 experiment.dataset.num_val=32 experiment.dataset.num_test=32 experiment.dataset.train_subset=6144"
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
  local EXP=$1 NAME=$2 MDIR=$3 SPLIT=$4 CAP=$5 SPLITCFG=$6; shift 6
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
    run_type=release $SPLITCFG experiment.name=$NAME evaluation=$SPLIT evaluation.batch_size=32 \
    checkpoint=$CKPT "$MODES" "$@" >"$LOGD/eval_${NAME}_${SPLIT}.log" 2>&1 \
    && echo "[$(stamp)] QUEUE-OK eval $NAME $SPLIT" \
    || echo "[$(stamp)] QUEUE-FAIL eval $NAME $SPLIT (see $LOGD/eval_${NAME}_${SPLIT}.log)"
}

trainrun () {
  local EXP=$1 NAME=$2 EPOCHS=$3 CAP=$4 VE=$5 INIT=$6 SPLITCFG=$7; shift 7
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
    run_type=release $SPLITCFG experiment.model.num_epochs=$EPOCHS \
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
P2PLW=$CK/pix2poly/224/p2p_lidar_xl/checkpoints

# ---- 0) wait for the v4 p2p_fusion_xxl6 trainer, then eval it ------------
if [ -n "$WAIT_PID" ]; then
  echo "[$(stamp)] QUEUE-WAIT for v4 p2p_fusion trainer pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
  echo "[$(stamp)] QUEUE-WAIT done"
fi
touch "$LOGD/trained_p2p_fusion_xxl6.ok"
evalrun  p2p_fusion p2p_fusion_xxl6 pix2poly val  1400 "$XXL6"
evalrun  p2p_fusion p2p_fusion_xxl6 pix2poly test 1400 "$XXL6"

# ---- 1) HiSup fusion retry: host loader, batch 8, no cache residency.
trainrun hisup_fusion hisup_fusion_xl 10 2700 2 - "$XL" "$B8" training.device_cache=false
evalrun  hisup_fusion hisup_fusion_xl hisup val  900 "$XL"
evalrun  hisup_fusion hisup_fusion_xl hisup test 900 "$XL"

# ---- 2) FFL lidar (donates its pointpillars_vit_cnn trunk to HiSup lidar).
trainrun ffl_lidar ffl_lidar_xl 14 2400 3 resume:latest "$XL" "$B8" training.device_cache=auto
evalrun  ffl_lidar ffl_lidar_xl ffl val  800 "$XL"
evalrun  ffl_lidar ffl_lidar_xl ffl test 800 "$XL"

# ---- 3) HiSup lidar warm from FFL lidar (same encoder family); the lidar
# cache is 1.6 GB and the pillar encoder is lighter than fusion_hrnet, but
# after two fusion OOMs play it safe: batch 4 + cache.
trainrun hisup_lidar hisup_lidar_xl 40 2400 3 warm:$CK/ffl/224/ffl_lidar_xl/checkpoints "$XL" "$B4" training.device_cache=true
evalrun  hisup_lidar hisup_lidar_xl hisup val  900 "$XL"
evalrun  hisup_lidar hisup_lidar_xl hisup test 900 "$XL"

# ---- 4) FFL fusion (ViT trunk from FFL image).
trainrun ffl_fusion ffl_fusion_xl 14 2400 3 warm:$FFLW "$XL" "$B8" training.device_cache=auto
evalrun  ffl_fusion ffl_fusion_xl ffl val  800 "$XL"
evalrun  ffl_fusion ffl_fusion_xl ffl test 800 "$XL"

# ---- 5) Optional: honest re-eval of the overfit p2p_lidar_xl cell with
# boxes sized for garbage-sequence assembly (the 1100s v2 boxes timed out).
if [ "$(left)" -gt 3400 ]; then
  evalrun  p2p_lidar p2p_lidar_xl pix2poly val  1600 "$XL"
  evalrun  p2p_lidar p2p_lidar_xl pix2poly test 1600 "$XL"
fi

echo "[$(stamp)] QUEUE v5 done (left=$(left)s) — starting harvest"
bash scripts/round5_harvest.sh
