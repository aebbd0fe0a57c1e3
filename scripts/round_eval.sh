#!/bin/bash
# End-of-round proof loop: predict + full metric battery for every trained
# family on the synthetic val split (and optionally test), using the
# best-val-IoU checkpoints from the round-3 runs. Results land in each run
# dir's results/ CSV (snapshots committed under docs/results_round3/).
#
# Usage: bash scripts/round_eval.sh [val|test]
set -u
SPLIT=${1:-val}
MODES='evaluation.modes=[iou,subset_iou,coco,boundary-coco,polis,chamfer,hausdorff,mta,topdig,juncs,stats]'
XL="experiment.dataset.version=v2xl experiment.dataset.num_train=2048"
cd "$(dirname "$0")/.."

echo "=== ffl_image_xl ($SPLIT, 2048-tile run) ==="
python scripts/predict.py experiment=ffl_image dataset=synthetic run_type=release \
  $XL experiment.name=ffl_image_xl evaluation=$SPLIT checkpoint=best_val_iou "$MODES" 2>&1 | tail -4

echo "=== hisup_image ($SPLIT, 256-tile run) ==="
python scripts/predict.py experiment=hisup_image dataset=synthetic run_type=release \
  evaluation=$SPLIT checkpoint=best_val_iou "$MODES" 2>&1 | tail -4

echo "=== p2p_image ($SPLIT, 2048-tile run) ==="
python scripts/predict.py experiment=p2p_image dataset=synthetic run_type=release \
  $XL evaluation=$SPLIT checkpoint=best_val_iou "$MODES" 2>&1 | tail -4

echo "=== summary CSVs ==="
for EXP in ffl/224/ffl_image_xl hisup/224/hisup_image pix2poly/224/p2p_image; do
  f="outputs/Synthetic_output/$EXP/results/metrics_${SPLIT}.csv"
  [ -f "$f" ] && echo "--- $f" && cat "$f"
done
