#!/bin/bash
# Round-5 makeup pass — run AFTER round5_queue_v6.sh (and its harvest) exit.
# Re-runs any eval whose metrics CSV is missing for a run that (a) trained on
# the FIXED georeference this round (trained_*_v6.ok stamp) and (b) has a
# checkpoint; then re-banks CSVs into docs/results_round5 and re-splices the
# grid table. Every step shrinks to the round deadline and is skippable.
set -u
cd "$(dirname "$0")/.."

DEADLINE=${MAKEUP_DEADLINE:-1787058600}
LOGD=outputs/round5_logs
CK=outputs/Synthetic_output
mkdir -p "$LOGD"

stamp () { date -u +%H:%M:%S; }
left () { echo $(( DEADLINE - $(date +%s) )); }

pick_ckpt () {
  local D=$1; shift
  for c in "$@"; do [ -d "$D/$c" ] && { echo $c; return; }; done
  echo ""
}

XL="experiment.dataset.version=v2xl experiment.dataset.num_train=2048 experiment.dataset.num_val=32 experiment.dataset.num_test=32"
MODES='evaluation.modes=[iou,subset_iou,coco,boundary-coco,polis,chamfer,hausdorff,mta,topdig,juncs,stats]'

makeup_eval () {
  local EXP=$1 NAME=$2 MDIR=$3 SPLIT=$4 CAP=$5; shift 5
  [ -f "$CK/$MDIR/224/$NAME/results/metrics_${SPLIT}.csv" ] && return
  [ -f "$LOGD/trained_${NAME}_v6.ok" ] || return
  local L=$(left); local TMO=$(( L < CAP ? L : CAP ))
  if [ "$TMO" -lt 300 ]; then echo "[$(stamp)] MAKEUP-SKIP $NAME $SPLIT (deadline)"; return; fi
  local ORDER="best_val_iou latest best_val_loss"
  [ "$MDIR" = pix2poly ] && ORDER="latest best_val_iou best_val_loss"
  local CKPT=$(pick_ckpt "$CK/$MDIR/224/$NAME/checkpoints" $ORDER)
  [ -z "$CKPT" ] && { echo "[$(stamp)] MAKEUP-SKIP $NAME $SPLIT (no ckpt)"; return; }
  echo "[$(stamp)] MAKEUP eval $NAME $SPLIT (ckpt=$CKPT tmo=$TMO)"
  timeout $TMO nice -n -10 python scripts/predict.py experiment=$EXP dataset=synthetic \
    run_type=release $XL experiment.name=$NAME evaluation=$SPLIT evaluation.batch_size=32 \
    checkpoint=$CKPT "$MODES" "$@" >"$LOGD/eval_${NAME}_${SPLIT}.log" 2>&1 \
    && echo "[$(stamp)] MAKEUP-OK $NAME $SPLIT" \
    || echo "[$(stamp)] MAKEUP-FAIL $NAME $SPLIT (see $LOGD/eval_${NAME}_${SPLIT}.log)"
}

makeup_eval ffl_lidar    ffl_lidar_xl    ffl      test 1500
makeup_eval ffl_lidar    ffl_lidar_xl    ffl      val  1500
makeup_eval p2p_lidar    p2p_lidar_xl    pix2poly val  1500
makeup_eval p2p_lidar    p2p_lidar_xl    pix2poly test 1500
makeup_eval p2p_fusion   p2p_fusion_xl   pix2poly val  1500
makeup_eval p2p_fusion   p2p_fusion_xl   pix2poly test 1500
makeup_eval hisup_lidar  hisup_lidar_xl  hisup    val  1500
makeup_eval hisup_lidar  hisup_lidar_xl  hisup    test 1500
makeup_eval ffl_fusion   ffl_fusion_xl   ffl      val  1500
makeup_eval ffl_fusion   ffl_fusion_xl   ffl      test 1500
makeup_eval hisup_fusion hisup_fusion_xl hisup    val  1500
makeup_eval hisup_fusion hisup_fusion_xl hisup    test 1500
makeup_eval hisup_image  hisup_image_xl  hisup    val  1500
makeup_eval hisup_image  hisup_image_xl  hisup    test 1500

# re-bank CSVs + refresh grid (cheap, CPU-only)
mkdir -p docs/results_round5
for d in "$CK"/*/224/*_xl; do
  n=$(basename "$d")
  for s in val test; do
    [ -f "$d/results/metrics_${s}.csv" ] && cp "$d/results/metrics_${s}.csv" "docs/results_round5/${n}_${s}.csv"
  done
done
python scripts/collect_grid.py --split val  --out docs/results_round5 --splice STATUS.md || true
python scripts/collect_grid.py --split test --out docs/results_round5 || true
echo "[$(stamp)] MAKEUP done (left=$(left)s)"
