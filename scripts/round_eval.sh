#!/bin/bash
# End-of-round proof loop: predict + full metric battery for every trained
# family on the synthetic-v2 val split (and optionally test), using the
# best-val-IoU checkpoints. Runs on whatever backend jax selects (TPU when
# free). Results land in each run dir's results/ CSV; a combined summary is
# printed at the end.
#
# Usage: bash scripts/round_eval.sh [val|test]
set -u
SPLIT=${1:-val}
MODES='evaluation.modes=[iou,subset_iou,coco,boundary-coco,polis,chamfer,hausdorff,mta,topdig,juncs,stats]'
cd "$(dirname "$0")/.."

for EXP in ffl_image hisup_image p2p_image; do
  echo "=== $EXP ($SPLIT) ==="
  python scripts/predict.py experiment=$EXP dataset=synthetic run_type=release \
    evaluation=$SPLIT checkpoint=best_val_iou "$MODES" 2>&1 | tail -4
done

echo "=== summary CSVs ==="
for EXP in ffl/224/ffl_image hisup/224/hisup_image pix2poly/224/p2p_image; do
  f="outputs/Synthetic_output/$EXP/results/metrics_${SPLIT}.csv"
  [ -f "$f" ] && echo "--- $f" && cat "$f"
done
