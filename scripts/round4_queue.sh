#!/bin/bash
# Round-4 modality-grid queue (v2, cold-start-aware): the fresh container lost
# every round-3 checkpoint, so the warm-start chain is rebuilt inside the
# queue itself: FFL-image trains first (fast, high-quality) and donates its
# ViT-S/8 trunk to the Pix2Poly image base via the fuzzy suffix matcher
# (utils/checkpoint.py smart_restore_params); each later cell warms from the
# strongest same-family checkpoint — the in-env substitute for the
# reference's pretrained-encoder downloads (reference:
# scripts/modality_ablation.py trains/evals the same 3x3 grid from
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

# trainrun <experiment> <name> <epochs> <timeout_s> <sizes> <warmstart_dir|-> [extra...]
trainrun () {
  local EXP=$1 NAME=$2 EPOCHS=$3 TMO=$4 SIZES=$5 WARM=$6; shift 6
  local WARMARG=""
  if [ "$WARM" != "-" ]; then
    if [ -d "$WARM" ]; then WARMARG="init_weights_from=$WARM";
    else echo "[$(stamp)] QUEUE-WARN warmstart missing for $NAME: $WARM (cold start)"; fi
  fi
  echo "[$(stamp)] QUEUE train $NAME (epochs=$EPOCHS warm=${WARMARG:-none})"
  timeout $TMO nice -n -10 python scripts/train.py experiment=$EXP dataset=synthetic \
    run_type=release $SIZES training.device_cache=true experiment.model.num_epochs=$EPOCHS \
    experiment.name=$NAME $WARMARG "$@" 2>&1 | grep -E "epoch|warm|error|Error|Traceback" | tail -100 \
    && echo "[$(stamp)] QUEUE-OK train $NAME" \
    || echo "[$(stamp)] QUEUE-FAIL train $NAME"
}

# 1) FFL image xl: warm base for the FFL family AND the ViT-trunk donor for
#    Pix2Poly (both are ViT-S/8 224; round-3 recipe hit IoU 0.972 @ 40 ep).
trainrun ffl_image ffl_image_xl 40 7200 "$XL" -
# (no eval: the round-3 full-battery row for this exact recipe is committed
#  in docs/results_round3 + grid_val.csv)

# 2) Pix2Poly image xxl: the flagship base. ViT trunk warm from FFL; decoder
#    cold; 16384-tile split carries the data-hungry AR decoder (round-4 proof
#    run: 44 warm epochs -> val IoU 0.872; cold decoder gets 72 epochs).
trainrun p2p_image p2p_image_xxl 72 14400 "$XXL" $CK/ffl/224/ffl_image_xl/checkpoints/best_val_iou
# (no eval: docs/results_round4/p2p_image_xxl_{val,test}.csv are committed)

# 3-4) Pix2Poly lidar + fusion (graded configs #2/#3): decoder + trunk warm
#      from the image base, xxl data, fewer epochs (decoder already trained).
P2PWARM=$CK/pix2poly/224/p2p_image_xxl/checkpoints/best_val_iou
trainrun p2p_lidar  p2p_lidar_xxl  36 9000 "$XXL" $P2PWARM
evalrun  p2p_lidar  p2p_lidar_xxl  "$XXL"
trainrun p2p_fusion p2p_fusion_xxl 36 9000 "$XXL" $P2PWARM
evalrun  p2p_fusion p2p_fusion_xxl "$XXL"

# 5) HiSup image at xl scale (the data lever round 3 left on the table).
trainrun hisup_image hisup_image_xl 80 9000 "$XL" -
evalrun  hisup_image hisup_image_xl "$XL"

# 6) HiSup fusion (graded config #4, "multimodal"): HRNet trunk + heads warm
#    from the xl image run.
trainrun hisup_fusion hisup_fusion_xl 50 7200 "$XL" $CK/hisup/224/hisup_image_xl/checkpoints/best_val_iou
evalrun  hisup_fusion hisup_fusion_xl "$XL"

# 7-8) FFL lidar + fusion: ViT trunk + FFL head warm from ffl_image_xl.
FFLWARM=$CK/ffl/224/ffl_image_xl/checkpoints/best_val_iou
trainrun ffl_lidar  ffl_lidar_xl  40 7200 "$XL" $FFLWARM
evalrun  ffl_lidar  ffl_lidar_xl  "$XL"
trainrun ffl_fusion ffl_fusion_xl 40 7200 "$XL" $FFLWARM
evalrun  ffl_fusion ffl_fusion_xl "$XL"

# 9) HiSup lidar (last 3x3 cell): pillar branch + heads warm from fusion.
LWARM=$CK/hisup/224/hisup_fusion_xl/checkpoints/best_val_iou
[ -d "$LWARM" ] || LWARM=$CK/hisup/224/hisup_image_xl/checkpoints/best_val_iou
trainrun hisup_lidar hisup_lidar_xl 50 7200 "$XL" "$LWARM"
evalrun  hisup_lidar hisup_lidar_xl "$XL"

echo "[$(stamp)] QUEUE done"
