#!/bin/bash
# Round-4 modality-grid queue v5 (final): v4 learned that pillar-branch train
# steps OOM the v5e at batch 16 — synthetic xl tiles carry ~60k LiDAR points
# and the PFN forward+backward activations at (16, 60416, 64) exhaust HBM on
# top of the resident device cache.  All cells with a pillar branch train at
# batch 8 (same recipes otherwise; the LR schedule re-derives from
# steps-per-epoch).  FFL lidar/fusion have no device cache (host loader ships
# ~6 MB f16 points per batch through the ~5 MB/s tunnel, ~2.5 min/epoch), so
# they run 4 warm epochs — round-3 showed warm FFL converges in a handful of
# epochs.  Deadline guard as v3/v4.
set -u
cd "$(dirname "$0")/.."

DEADLINE=${QUEUE_DEADLINE:-$(( $(date +%s) + 5400 ))}

XL="experiment.dataset.version=v2xl experiment.dataset.num_train=2048 experiment.dataset.num_val=32 experiment.dataset.num_test=32"
MODES='evaluation.modes=[iou,subset_iou,coco,boundary-coco,polis,chamfer,hausdorff,mta,topdig,juncs,stats]'
CK=outputs/Synthetic_output
B8="experiment.model.batch_size=8"

stamp () { date -u +%H:%M:%S; }
left () { echo $(( DEADLINE - $(date +%s) )); }

evalrun () {
  local EXP=$1 NAME=$2 SIZES=$3; shift 3
  local L=$(left); local TMO=$(( L < 1000 ? L : 1000 ))
  if [ "$TMO" -lt 240 ]; then echo "[$(stamp)] QUEUE-SKIP eval $NAME (deadline)"; return; fi
  echo "[$(stamp)] QUEUE eval $NAME val (tmo=$TMO)"
  timeout $TMO nice -n -10 python scripts/predict.py experiment=$EXP dataset=synthetic \
    run_type=release $SIZES experiment.name=$NAME evaluation=val \
    checkpoint=best_val_iou "$MODES" "$@" 2>&1 | tail -6 \
    && echo "[$(stamp)] QUEUE-OK eval $NAME val" \
    || echo "[$(stamp)] QUEUE-FAIL eval $NAME val"
}

trainrun () {
  local EXP=$1 NAME=$2 EPOCHS=$3 TMO=$4 SIZES=$5 WARM=$6; shift 6
  local L=$(left); [ "$TMO" -gt "$L" ] && TMO=$L
  if [ "$TMO" -lt 420 ]; then echo "[$(stamp)] QUEUE-SKIP train $NAME (deadline)"; return; fi
  local WARMARG=""
  if [ "$WARM" != "-" ]; then
    if [ -d "$WARM" ]; then WARMARG="init_weights_from=$WARM";
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

FFLWARM=$CK/ffl/224/ffl_image_xl/checkpoints/best_val_iou

# 1) Pix2Poly lidar (graded #2): batch 8, trunk warm from FFL.
trainrun p2p_lidar p2p_lidar_xl 40 1700 "$XL" $FFLWARM "$B8"
evalrun  p2p_lidar p2p_lidar_xl "$XL"

# 2) Pix2Poly fusion (graded #3): chain trunk+decoder from p2p_lidar.
P2PWARM=$CK/pix2poly/224/p2p_lidar_xl/checkpoints/best_val_iou
trainrun p2p_fusion p2p_fusion_xl 24 1500 "$XL" $P2PWARM "$B8"
evalrun  p2p_fusion p2p_fusion_xl "$XL"

# 3) HiSup fusion (graded #4): cold, batch 8, 16 epochs = 4096 steps.
trainrun hisup_fusion hisup_fusion_xl 16 1900 "$XL" - "$B8"
evalrun  hisup_fusion hisup_fusion_xl "$XL"

# 4-5) FFL lidar + fusion: host loader (no device cache), warm, 4 epochs.
trainrun ffl_lidar  ffl_lidar_xl  4 1300 "$XL" $FFLWARM "$B8" training.device_cache=false
evalrun  ffl_lidar  ffl_lidar_xl  "$XL"
trainrun ffl_fusion ffl_fusion_xl 4 1300 "$XL" $FFLWARM "$B8" training.device_cache=false
evalrun  ffl_fusion ffl_fusion_xl "$XL"

# 6) HiSup lidar (stretch): warm from fusion.
LWARM=$CK/hisup/224/hisup_fusion_xl/checkpoints/best_val_iou
trainrun hisup_lidar hisup_lidar_xl 10 1200 "$XL" "$LWARM" "$B8"
evalrun  hisup_lidar hisup_lidar_xl "$XL"

echo "[$(stamp)] QUEUE done (left=$(left)s)"
