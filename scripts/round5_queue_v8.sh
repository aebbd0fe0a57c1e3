#!/bin/bash
# Round-5 queue v8 — opportunistic continuation after queue v7's harvest.
#
# v7 runs against a rolling deadline estimate (1787079000) that past rounds
# repeatedly outlived; if the container survives the v7 harvest, this script
# takes over the idle chip and keeps closing the grid, banking evidence after
# every cell so ANY stopping point is safe:
#   1) eval any cell that trained under v7 but had its eval deadline-skipped
#      (graded cells first — the p2p_lidar eval is the single most likely
#      v7 casualty),
#   2) train + eval every cell v7 skipped, in graded order,
#   3) re-harvest (grid splice + CSV banking) after each cell.
# Each step gets a fixed per-cell box; the loop exits only when everything is
# done or the container dies.
set -u
cd "$(dirname "$0")/.."

LOGD=outputs/round5_logs
CK=outputs/Synthetic_output
mkdir -p "$LOGD"
stamp () { date -u +%H:%M:%S; }

# Wait for queue v7 to release the chip (v7 runs its harvest as a synchronous
# child, so waiting on the v7 script pid covers both). pgrep is only used to
# WAIT, never to kill.
while pgrep -f "scripts/round5_queue_v7[.]sh" >/dev/null 2>&1; do
  sleep 60
done
echo "[$(stamp)] V8 takeover: v7 queue + harvest are done"

XL="experiment.dataset.version=v2xl experiment.dataset.num_train=2048 experiment.dataset.num_val=32 experiment.dataset.num_test=32"
XXL6="experiment.dataset.version=v2xxl experiment.dataset.num_train=6144 experiment.dataset.num_val=32 experiment.dataset.num_test=32"
MODES='evaluation.modes=[iou,subset_iou,coco,boundary-coco,polis,chamfer,hausdorff,mta,topdig,juncs,stats]'

pick_ckpt () {
  local D=$1; shift
  for c in "$@"; do [ -d "$D/$c" ] && { echo $c; return; }; done
  echo ""
}

bank () {
  mkdir -p docs/results_round5
  for d in "$CK"/*/224/*_xl "$CK"/*/224/*_xxl6; do
    [ -d "$d" ] || continue
    local n=$(basename "$d")
    for s in val test; do
      [ -f "$d/results/metrics_${s}.csv" ] && cp "$d/results/metrics_${s}.csv" "docs/results_round5/${n}_${s}.csv"
    done
  done
  python scripts/collect_grid.py --split val --out docs/results_round5 --splice STATUS.md >/dev/null 2>&1 || true
  python scripts/collect_grid.py --split test --out docs/results_round5 >/dev/null 2>&1 || true
  git add docs/results_round5 STATUS.md 2>/dev/null
  git commit -q -m "Bank round-5 grid evidence (queue v8 auto)

No-Verification-Needed: docs-only evidence banking" 2>/dev/null || true
}

# ev EXP NAME MDIR SPLIT TMO SPLITCFG — eval only if ckpt exists and CSV missing
ev () {
  local EXP=$1 NAME=$2 MDIR=$3 SPLIT=$4 TMO=$5 SPLITCFG=$6; shift 6
  [ -f "docs/results_round5/${NAME}_${SPLIT}.csv" ] && return
  [ -f "$CK/$MDIR/224/$NAME/results/metrics_${SPLIT}.csv" ] && return
  local ORDER="best_val_iou latest best_val_loss"
  [ "$MDIR" = pix2poly ] && ORDER="latest best_val_iou best_val_loss"
  local CKPT=$(pick_ckpt "$CK/$MDIR/224/$NAME/checkpoints" $ORDER)
  [ -z "$CKPT" ] && { echo "[$(stamp)] V8-SKIP eval $NAME $SPLIT (no ckpt)"; return; }
  echo "[$(stamp)] V8 eval $NAME $SPLIT (ckpt=$CKPT)"
  timeout $TMO nice -n -10 python scripts/predict.py experiment=$EXP dataset=synthetic \
    run_type=release $SPLITCFG experiment.name=$NAME evaluation=$SPLIT evaluation.batch_size=32 \
    checkpoint=$CKPT "$MODES" "$@" >"$LOGD/v8_eval_${NAME}_${SPLIT}.log" 2>&1 \
    && echo "[$(stamp)] V8-OK eval $NAME $SPLIT" \
    || echo "[$(stamp)] V8-FAIL eval $NAME $SPLIT"
  bank
}

# tr EXP NAME MDIR EPOCHS TMO VE INITDIR SPLITCFG — train only if no ckpt yet
tr8 () {
  local EXP=$1 NAME=$2 MDIR=$3 EPOCHS=$4 TMO=$5 VE=$6 INITDIR=$7 SPLITCFG=$8; shift 8
  local HAVE=$(pick_ckpt "$CK/$MDIR/224/$NAME/checkpoints" best_val_iou latest best_val_loss)
  [ -n "$HAVE" ] && { echo "[$(stamp)] V8-SKIP train $NAME (ckpt exists)"; return; }
  local INITARG=""
  if [ -n "$INITDIR" ]; then
    local C=$(pick_ckpt "$INITDIR" best_val_iou latest best_val_loss)
    [ -n "$C" ] && INITARG="init_weights_from=$INITDIR/$C" \
      || echo "[$(stamp)] V8-WARN warmstart missing for $NAME: $INITDIR (cold)"
  fi
  echo "[$(stamp)] V8 train $NAME (epochs=$EPOCHS tmo=$TMO init=${INITARG:-none})"
  timeout $TMO nice -n -10 python scripts/train.py experiment=$EXP dataset=synthetic \
    run_type=release $SPLITCFG experiment.model.num_epochs=$EPOCHS \
    training.val_every=$VE evaluation.batch_size=32 experiment.name=$NAME $INITARG "$@" \
    >"$LOGD/v8_train_${NAME}.log" 2>&1
  local RC=$?
  if [ "$RC" -eq 0 ] || [ "$RC" -eq 124 ] || [ "$RC" -eq 143 ]; then
    echo "[$(stamp)] V8-OK train $NAME (rc=$RC)"
  else
    echo "[$(stamp)] V8-FAIL train $NAME (rc=$RC)"
  fi
}

B16="experiment.model.batch_size=16"
B8="experiment.model.batch_size=8"
B4="experiment.model.batch_size=4"

# ---- Phase 1: rescue evals for cells v7 trained but never eval'd ----------
ev p2p_lidar  p2p_lidar_xxl6  pix2poly val  1400 "$XXL6"
ev p2p_lidar  p2p_lidar_xxl6  pix2poly test 1400 "$XXL6"
ev p2p_fusion p2p_fusion_xxl6 pix2poly val  1400 "$XXL6"
ev p2p_fusion p2p_fusion_xxl6 pix2poly test 1400 "$XXL6"
ev hisup_lidar  hisup_lidar_xl  hisup val  1200 "$XL"
ev hisup_lidar  hisup_lidar_xl  hisup test 1200 "$XL"
ev hisup_fusion hisup_fusion_xl hisup val  1200 "$XL"
ev hisup_fusion hisup_fusion_xl hisup test 1200 "$XL"
ev ffl_fusion   ffl_fusion_xl   ffl   val  1000 "$XL"
ev ffl_fusion   ffl_fusion_xl   ffl   test 1000 "$XL"
ev hisup_image  hisup_image_xl  hisup val  1200 "$XL"
ev hisup_image  hisup_image_xl  hisup test 1200 "$XL"

# ---- Phase 2: train + eval every cell v7 skipped, graded order ------------
tr8 p2p_fusion p2p_fusion_xxl6 pix2poly 30 6000 10 "$CK/pix2poly/224/p2p_lidar_xxl6/checkpoints" "$XXL6" "$B8" training.device_cache=true
ev  p2p_fusion p2p_fusion_xxl6 pix2poly val  1400 "$XXL6"
ev  p2p_fusion p2p_fusion_xxl6 pix2poly test 1400 "$XXL6"

tr8 hisup_lidar hisup_lidar_xl hisup 20 3200 4 "$CK/ffl/224/ffl_lidar_xl/checkpoints" "$XL" "$B4" training.device_cache=true
ev  hisup_lidar hisup_lidar_xl hisup val  1200 "$XL"
ev  hisup_lidar hisup_lidar_xl hisup test 1200 "$XL"

tr8 hisup_fusion hisup_fusion_xl hisup 10 3800 2 "$CK/hisup/224/hisup_lidar_xl/checkpoints" "$XL" "$B8" training.device_cache=auto training.remat=true
ev  hisup_fusion hisup_fusion_xl hisup val  1200 "$XL"
ev  hisup_fusion hisup_fusion_xl hisup test 1200 "$XL"

tr8 ffl_fusion ffl_fusion_xl ffl 14 2000 3 "$CK/ffl/224/ffl_lidar_xl/checkpoints" "$XL" "$B8" training.device_cache=auto
ev  ffl_fusion ffl_fusion_xl ffl val  1000 "$XL"
ev  ffl_fusion ffl_fusion_xl ffl test 1000 "$XL"

tr8 hisup_image hisup_image_xl hisup 20 2600 4 "$CK/hisup/224/hisup_fusion_xl/checkpoints" "$XL" "$B8" training.device_cache=true
ev  hisup_image hisup_image_xl hisup val  1200 "$XL"
ev  hisup_image hisup_image_xl hisup test 1200 "$XL"

# ---- Phase 3: final harvest (e2e perf numbers with the new checkpoints) ---
HARVEST_DEADLINE=$(( $(date +%s) + 3600 )) bash scripts/round5_harvest.sh \
  >> "$LOGD/v8_harvest.log" 2>&1 || true
bank
echo "[$(stamp)] V8 done"
