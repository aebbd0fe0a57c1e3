#!/bin/bash
# Round-4 modality-grid queue v4: v3 with the Pix2Poly lidar/fusion cells
# moved from the 16k xxl split to the 2048-tile xl split.  Measured reason:
# the xxl LiDAR device cache is ~10 GB of point clouds and the axon tunnel
# uploads a few MB/s, so the one-time upload alone ate the v3 cell's whole
# 35-minute box before the first epoch; at xl the upload is ~1.2 GB and a
# Pix2Poly epoch is ~16 s (128 steps @ 8.1 steps/s, BENCH_TABLE), so the same
# wall clock buys MORE decoder steps (5k+ vs ~3k) on the graded cells.
# Everything else (warm-start chain, deadline guard, val-only evals) as v3.
#
# Usage: nohup bash scripts/round4_queue_v4.sh > /tmp/round4_queue_v4.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

DEADLINE=${QUEUE_DEADLINE:-$(( $(date +%s) + 6300 ))}

XL="experiment.dataset.version=v2xl experiment.dataset.num_train=2048 experiment.dataset.num_val=32 experiment.dataset.num_test=32"
MODES='evaluation.modes=[iou,subset_iou,coco,boundary-coco,polis,chamfer,hausdorff,mta,topdig,juncs,stats]'
CK=outputs/Synthetic_output

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
    | grep -E "epoch|warm|error|Error|Traceback" | tail -60 \
    && echo "[$(stamp)] QUEUE-OK train $NAME" \
    || echo "[$(stamp)] QUEUE-FAIL train $NAME"
}

FFLWARM=$CK/ffl/224/ffl_image_xl/checkpoints/best_val_iou

# 1) Pix2Poly lidar (graded config #2): ViT trunk warm from FFL, decoder cold.
trainrun p2p_lidar p2p_lidar_xl 40 1500 "$XL" $FFLWARM
evalrun  p2p_lidar p2p_lidar_xl "$XL"

# 2) Pix2Poly fusion (graded config #3): chain trunk+decoder from p2p_lidar.
P2PWARM=$CK/pix2poly/224/p2p_lidar_xl/checkpoints/best_val_iou
trainrun p2p_fusion p2p_fusion_xl 32 1400 "$XL" $P2PWARM
evalrun  p2p_fusion p2p_fusion_xl "$XL"

# 3) HiSup fusion (graded config #4): cold, 24 xl epochs = 3072 steps
#    (~2x the steps of the round-3 image run that hit IoU 0.87).
trainrun hisup_fusion hisup_fusion_xl 24 1900 "$XL" -
evalrun  hisup_fusion hisup_fusion_xl "$XL"

# 4-5) FFL lidar + fusion: trunk + FFL head warm -> fast convergence.
trainrun ffl_lidar  ffl_lidar_xl  10 1300 "$XL" $FFLWARM
evalrun  ffl_lidar  ffl_lidar_xl  "$XL"
trainrun ffl_fusion ffl_fusion_xl 10 1300 "$XL" $FFLWARM
evalrun  ffl_fusion ffl_fusion_xl "$XL"

# 6) HiSup lidar (last 3x3 cell): pillar branch + heads warm from fusion.
LWARM=$CK/hisup/224/hisup_fusion_xl/checkpoints/best_val_iou
trainrun hisup_lidar hisup_lidar_xl 12 1300 "$XL" "$LWARM"
evalrun  hisup_lidar hisup_lidar_xl "$XL"

echo "[$(stamp)] QUEUE done (left=$(left)s)"
