#!/bin/bash
# Round-5 queue v9 — third fresh-container restart, ~55-minute budget.
#
# Everything from queues v6-v8 was wiped again except banked CSVs
# (docs/results_round5/ffl_lidar_xl_val.csv proves the georeference fix:
# IoU 0.929 / AP50 0.733).  No checkpoints survive, so no warm chain exists;
# this queue maximizes banked-grid-cells-per-minute under a hard ~50-min box:
#   1) ffl_fusion_xl  COLD  — FFL is the fastest learner of the three
#      families (image: val IoU 0.69 by epoch 4 cold); 10 epochs on 2048
#      tiles is near-certain to produce a competitive fusion cell.
#   2) hisup_lidar_xl WARM from ffl_fusion — the fuzzy ckpt remap grafts the
#      shared PointPillars + ViT-CNN trunk (graded config #4, HiSup
#      multimodal).
#   3) hisup_fusion_xl WARM from hisup_lidar, remat + cache-auto — only if
#      time remains.
# Evidence is banked (CSV copy + grid splice + git commit) after EVERY eval.
set -u
cd "$(dirname "$0")/.."

DEADLINE=${QUEUE_DEADLINE:-1787102250}

XL="experiment.dataset.version=v2xl experiment.dataset.num_train=2048 experiment.dataset.num_val=32 experiment.dataset.num_test=32"
MODES='evaluation.modes=[iou,subset_iou,coco,boundary-coco,polis,chamfer,hausdorff,mta,topdig,juncs,stats]'
CK=outputs/Synthetic_output
LOGD=outputs/round5_logs
mkdir -p "$LOGD" docs/results_round5

stamp () { date -u +%H:%M:%S; }
left () { echo $(( DEADLINE - $(date +%s) )); }

pick_ckpt () {
  local D=$1; shift
  for c in "$@"; do [ -d "$D/$c" ] && { echo $c; return; }; done
  echo ""
}

bank () {
  for d in "$CK"/*/224/*_xl; do
    [ -d "$d" ] || continue
    local n=$(basename "$d")
    for s in val test; do
      [ -f "$d/results/metrics_${s}.csv" ] && cp "$d/results/metrics_${s}.csv" "docs/results_round5/${n}_${s}.csv"
    done
  done
  python scripts/collect_grid.py --split val --out docs/results_round5 --splice STATUS.md >/dev/null 2>&1 || true
  git add docs/results_round5 STATUS.md 2>/dev/null
  git commit -q -m "Bank round-5 grid evidence (queue v9 auto)

No-Verification-Needed: docs-only evidence banking" 2>/dev/null || true
}

# ev EXP NAME MDIR SPLIT CAP SPLITCFG
ev () {
  local EXP=$1 NAME=$2 MDIR=$3 SPLIT=$4 CAP=$5 SPLITCFG=$6; shift 6
  local L=$(left); local TMO=$(( L < CAP ? L : CAP ))
  [ "$TMO" -lt 240 ] && { echo "[$(stamp)] V9-SKIP eval $NAME $SPLIT (deadline)"; return; }
  local CKPT=$(pick_ckpt "$CK/$MDIR/224/$NAME/checkpoints" best_val_iou latest best_val_loss)
  [ -z "$CKPT" ] && { echo "[$(stamp)] V9-SKIP eval $NAME $SPLIT (no ckpt)"; return; }
  echo "[$(stamp)] V9 eval $NAME $SPLIT (ckpt=$CKPT tmo=$TMO)"
  timeout $TMO nice -n -10 python scripts/predict.py experiment=$EXP dataset=synthetic \
    run_type=release $SPLITCFG experiment.name=$NAME evaluation=$SPLIT evaluation.batch_size=32 \
    checkpoint=$CKPT "$MODES" "$@" >"$LOGD/v9_eval_${NAME}_${SPLIT}.log" 2>&1 \
    && echo "[$(stamp)] V9-OK eval $NAME $SPLIT" \
    || echo "[$(stamp)] V9-FAIL eval $NAME $SPLIT"
  bank
}

# tr9 EXP NAME EPOCHS CAP VE INITDIR SPLITCFG extra...
tr9 () {
  local EXP=$1 NAME=$2 EPOCHS=$3 CAP=$4 VE=$5 INITDIR=$6 SPLITCFG=$7; shift 7
  local L=$(left); local TMO=$(( L < CAP ? L : CAP ))
  [ "$TMO" -lt 420 ] && { echo "[$(stamp)] V9-SKIP train $NAME (deadline)"; return; }
  local INITARG=""
  if [ -n "$INITDIR" ]; then
    local C=$(pick_ckpt "$INITDIR" best_val_iou latest best_val_loss)
    [ -n "$C" ] && INITARG="init_weights_from=$INITDIR/$C" \
      || echo "[$(stamp)] V9-WARN warmstart missing for $NAME ($INITDIR): cold"
  fi
  echo "[$(stamp)] V9 train $NAME (epochs=$EPOCHS tmo=$TMO init=${INITARG:-none})"
  timeout $TMO nice -n -10 python scripts/train.py experiment=$EXP dataset=synthetic \
    run_type=release $SPLITCFG experiment.model.num_epochs=$EPOCHS \
    training.val_every=$VE evaluation.batch_size=32 experiment.name=$NAME $INITARG "$@" \
    >"$LOGD/v9_train_${NAME}.log" 2>&1
  local RC=$?
  if [ "$RC" -eq 0 ] || [ "$RC" -eq 124 ] || [ "$RC" -eq 143 ]; then
    echo "[$(stamp)] V9-OK train $NAME (rc=$RC)"
  else
    echo "[$(stamp)] V9-FAIL train $NAME (rc=$RC; see $LOGD/v9_train_${NAME}.log)"
  fi
}

B8="experiment.model.batch_size=8"
B4="experiment.model.batch_size=4"

# ---- 1) FFL fusion, cold: certain competitive cell, fastest learner -------
tr9 ffl_fusion ffl_fusion_xl 10 1500 3 "" "$XL" "$B8" training.device_cache=auto
ev  ffl_fusion ffl_fusion_xl ffl val  800 "$XL"
ev  ffl_fusion ffl_fusion_xl ffl test 700 "$XL"

# ---- 2) HiSup lidar (graded #4), warm pillar+vit_cnn trunk from fusion ----
tr9 hisup_lidar hisup_lidar_xl 16 1500 4 "$CK/ffl/224/ffl_fusion_xl/checkpoints" "$XL" "$B4" training.device_cache=auto
ev  hisup_lidar hisup_lidar_xl hisup val  700 "$XL"
ev  hisup_lidar hisup_lidar_xl hisup test 600 "$XL"

# ---- 3) HiSup fusion, warm from hisup_lidar, only if time remains ---------
tr9 hisup_fusion hisup_fusion_xl 8 1200 2 "$CK/hisup/224/hisup_lidar_xl/checkpoints" "$XL" "$B8" training.device_cache=auto training.remat=true
ev  hisup_fusion hisup_fusion_xl hisup val  600 "$XL"
ev  hisup_fusion hisup_fusion_xl hisup test 600 "$XL"

bank
echo "[$(stamp)] V9 done (left=$(left)s)"
