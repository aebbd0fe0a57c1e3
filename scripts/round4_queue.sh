#!/bin/bash
# Round-4 modality-grid queue: train + full-battery-evaluate every remaining
# (model x modality) cell on the synthetic xl split (2048 train / 32 val / 32
# test tiles), warm-starting each run from the strongest same-family checkpoint
# — the in-env substitute for the reference's pretrained-encoder downloads
# (reference: scripts/modality_ablation.py trains/evals the same 3x3 grid from
# HF-downloaded weights).
#
# Sequential on purpose: one TPU chip + one host core; `nice -n -10` keeps the
# dispatch-bound trainer ahead of any stray host work. `timeout` guards every
# step (a tunnel device-sync has been seen to hang >15 min); a timed-out or
# failed step logs QUEUE-FAIL and the queue moves on — every train step leaves
# a usable best_val_iou checkpoint behind regardless.
#
# Usage: nohup bash scripts/round4_queue.sh > /tmp/round4_queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

XL="experiment.dataset.version=v2xl experiment.dataset.num_train=2048 experiment.dataset.num_val=32 experiment.dataset.num_test=32"
XXL="experiment.dataset.version=v2xxl experiment.dataset.num_train=16384 experiment.dataset.num_val=128 experiment.dataset.num_test=128"
MODES='evaluation.modes=[iou,subset_iou,coco,boundary-coco,polis,chamfer,hausdorff,mta,topdig,juncs,stats]'
CK=outputs/Synthetic_output

stamp () { date -u +%H:%M:%S; }

# evalrun <experiment> <name> <sizes> [extra overrides...]
evalrun () {
  local EXP=$1 NAME=$2 SIZES=$3; shift 3
  for SPLIT in val test; do
    echo "[$(stamp)] QUEUE eval $NAME $SPLIT"
    timeout 2400 nice -n -10 python scripts/predict.py experiment=$EXP dataset=synthetic \
      run_type=release $SIZES experiment.name=$NAME evaluation=$SPLIT \
      checkpoint=best_val_iou "$MODES" "$@" 2>&1 | tail -6 \
      && echo "[$(stamp)] QUEUE-OK eval $NAME $SPLIT" \
      || echo "[$(stamp)] QUEUE-FAIL eval $NAME $SPLIT"
  done
}

# trainrun <experiment> <name> <epochs> <timeout_s> <warmstart_dir|-> [extra...]
trainrun () {
  local EXP=$1 NAME=$2 EPOCHS=$3 TMO=$4 WARM=$5; shift 5
  local WARMARG=""
  if [ "$WARM" != "-" ]; then
    if [ -d "$WARM" ]; then WARMARG="init_weights_from=$WARM";
    else echo "[$(stamp)] QUEUE-WARN warmstart missing for $NAME: $WARM (cold start)"; fi
  fi
  echo "[$(stamp)] QUEUE train $NAME (epochs=$EPOCHS warm=${WARMARG:-none})"
  timeout $TMO nice -n -10 python scripts/train.py experiment=$EXP dataset=synthetic \
    run_type=release $XL training.device_cache=true experiment.model.num_epochs=$EPOCHS \
    experiment.name=$NAME $WARMARG "$@" 2>&1 | grep -E "epoch|warm|error|Error|Traceback" | tail -80 \
    && echo "[$(stamp)] QUEUE-OK train $NAME" \
    || echo "[$(stamp)] QUEUE-FAIL train $NAME"
}

CH=experiment.dataset.country=CH

# 0) Final eval of the xxl image flagship (graded config #1) on the 128-tile splits.
evalrun p2p_image p2p_image_xxl "$XXL"

# 1-2) Pix2Poly lidar + fusion (graded configs #2/#3); decoder + ViT trunk warm
#      from the strong image run.
trainrun p2p_lidar  p2p_lidar_xl  120 7200 $CK/pix2poly/224/p2p_image_xxl/checkpoints/best_val_iou
evalrun  p2p_lidar  p2p_lidar_xl  "$XL"
trainrun p2p_fusion p2p_fusion_xl 120 7200 $CK/pix2poly/224/p2p_image_xxl/checkpoints/best_val_iou $CH
evalrun  p2p_fusion p2p_fusion_xl "$XL" $CH

# 3) HiSup image at xl scale (the data lever round 3 left on the table).
trainrun hisup_image hisup_image_xl 60 7200 $CK/hisup/224/hisup_image/checkpoints/best_val_iou
evalrun  hisup_image hisup_image_xl "$XL"

# 4) HiSup fusion (graded config #4, "multimodal"): HRNet trunk + heads warm
#    from the xl image run (falls back to the 256-tile run if #3 failed).
HWARM=$CK/hisup/224/hisup_image_xl/checkpoints/best_val_iou
[ -d "$HWARM" ] || HWARM=$CK/hisup/224/hisup_image/checkpoints/best_val_iou
trainrun hisup_fusion hisup_fusion_xl 50 7200 "$HWARM" $CH
evalrun  hisup_fusion hisup_fusion_xl "$XL" $CH

# 5-6) FFL lidar + fusion: ViT trunk + FFL head warm from ffl_image_xl.
trainrun ffl_lidar  ffl_lidar_xl  40 6000 $CK/ffl/224/ffl_image_xl/checkpoints/best_val_iou
evalrun  ffl_lidar  ffl_lidar_xl  "$XL"
trainrun ffl_fusion ffl_fusion_xl 40 6000 $CK/ffl/224/ffl_image_xl/checkpoints/best_val_iou $CH
evalrun  ffl_fusion ffl_fusion_xl "$XL" $CH

# 7) HiSup lidar (last 3x3 cell): pillar branch + heads warm from fusion.
LWARM=$CK/hisup/224/hisup_fusion_xl/checkpoints/best_val_iou
[ -d "$LWARM" ] || LWARM=$CK/hisup/224/hisup_image_xl/checkpoints/best_val_iou
trainrun hisup_lidar hisup_lidar_xl 50 7200 "$LWARM"
evalrun  hisup_lidar hisup_lidar_xl "$XL"

echo "[$(stamp)] QUEUE done"
