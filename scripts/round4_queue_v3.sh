#!/bin/bash
# Round-4 modality-grid queue v3: deadline-aware rewrite of round4_queue.sh.
# The v2 chain (full FFL->P2P-xxl warm rebuild) cannot fit the remaining round
# wall clock, so v3 time-boxes every cell and orders them by graded value
# (BASELINE.json configs #2 p2p-lidar, #3 p2p-fusion, #4 hisup-multimodal
# first, then the remaining 3x3 grid cells).  Warm-start chain:
#   ffl_image_xl (already trained this round, val IoU 0.965)
#     -> p2p_lidar (ViT trunk via fuzzy suffix matcher; decoder cold)
#       -> p2p_fusion (trunk + part-trained decoder chain)
#     -> ffl_lidar / ffl_fusion (trunk + FFL head)
#   hisup_fusion (cold; 24 xl epochs > the 1600 steps that gave IoU 0.87 in r3)
#     -> hisup_lidar
# Every trainrun leaves a best_val_iou checkpoint even when the timeout cuts
# it; evals run val-only (the grid table needs val cells; p2p_image val+test
# is already committed in docs/results_round4).
# Reference: scripts/modality_ablation.py trains/evals the same 3x3 grid.
#
# Usage: nohup bash scripts/round4_queue_v3.sh > /tmp/round4_queue_v3.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

# Hard deadline (unix ts): stop launching work when past it. Caller may
# override via QUEUE_DEADLINE env; default = now + 115 min (leaves ~25 min of
# round for harvest/STATUS/bench before the ~23:55 UTC cutoff).
DEADLINE=${QUEUE_DEADLINE:-$(( $(date +%s) + 6900 ))}

XL="experiment.dataset.version=v2xl experiment.dataset.num_train=2048 experiment.dataset.num_val=32 experiment.dataset.num_test=32"
XXL="experiment.dataset.version=v2xxl experiment.dataset.num_train=16384 experiment.dataset.num_val=128 experiment.dataset.num_test=128"
MODES='evaluation.modes=[iou,subset_iou,coco,boundary-coco,polis,chamfer,hausdorff,mta,topdig,juncs,stats]'
CK=outputs/Synthetic_output

stamp () { date -u +%H:%M:%S; }
left () { echo $(( DEADLINE - $(date +%s) )); }

# evalrun <experiment> <name> <sizes> [extra overrides...]  (val only)
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

# trainrun <experiment> <name> <epochs> <timeout_s> <sizes> <warmstart_dir|-> [extra...]
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

# 1) Pix2Poly lidar (graded config #2): ViT trunk warm from FFL, decoder cold,
#    xxl data for the data-hungry AR decoder. ~130 tiles/s -> ~130 s/epoch.
trainrun p2p_lidar p2p_lidar_xxl 10 2100 "$XXL" $FFLWARM
evalrun  p2p_lidar p2p_lidar_xxl "$XXL"

# 2) Pix2Poly fusion (graded config #3): chain from p2p_lidar so the decoder
#    keeps training across cells.
P2PWARM=$CK/pix2poly/224/p2p_lidar_xxl/checkpoints/best_val_iou
trainrun p2p_fusion p2p_fusion_xxl 8 1800 "$XXL" $P2PWARM
evalrun  p2p_fusion p2p_fusion_xxl "$XXL"

# 3) HiSup fusion (graded config #4, "multimodal"): cold, xl; 24 epochs =
#    3072 steps (~2x the steps of the round-3 image run that hit IoU 0.87).
trainrun hisup_fusion hisup_fusion_xl 24 1900 "$XL" -
evalrun  hisup_fusion hisup_fusion_xl "$XL"

# 4-5) FFL lidar + fusion: trunk + FFL head warm -> fast convergence.
trainrun ffl_lidar  ffl_lidar_xl  10 1300 "$XL" $FFLWARM
evalrun  ffl_lidar  ffl_lidar_xl  "$XL"
trainrun ffl_fusion ffl_fusion_xl 10 1300 "$XL" $FFLWARM
evalrun  ffl_fusion ffl_fusion_xl "$XL"

# 6) HiSup lidar (last 3x3 cell, stretch): pillar branch + heads warm from fusion.
LWARM=$CK/hisup/224/hisup_fusion_xl/checkpoints/best_val_iou
trainrun hisup_lidar hisup_lidar_xl 12 1300 "$XL" "$LWARM"
evalrun  hisup_lidar hisup_lidar_xl "$XL"

echo "[$(stamp)] QUEUE done (left=$(left)s)"
