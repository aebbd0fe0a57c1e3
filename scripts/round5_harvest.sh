#!/bin/bash
# Round-5 end-of-round harvest (VERDICT r4 next #4/#5/#6): one consistent,
# dated family of predict-perf numbers + evidence-grade reference probes +
# the refreshed 3x3 grid. Run AFTER scripts/round5_queue.sh releases the chip.
# Budget ~40 min of chip; every step shrinks to the deadline and is skippable.
set -u
cd "$(dirname "$0")/.."

# driver round budget ends at 1787015954+43200=1787059154; leave ~20 min for
# the final commit + driver bench
DEADLINE=${HARVEST_DEADLINE:-1787082300}
LOGD=outputs/round5_logs
CK=outputs/Synthetic_output
E2E=$LOGD/predict_e2e.jsonl
mkdir -p "$LOGD"

stamp () { date -u +%H:%M:%S; }
left () { echo $(( DEADLINE - $(date +%s) )); }

pick_ckpt () {
  local D=$1; shift
  for c in "$@"; do [ -d "$D/$c" ] && { echo $c; return; }; done
  echo ""
}

XL="experiment.dataset.version=v2xl experiment.dataset.num_train=2048 experiment.dataset.num_val=32 experiment.dataset.num_test=32"

# e2e EXP NAME MDIR BATCH CAP extra...
e2e () {
  local EXP=$1 NAME=$2 MDIR=$3 BATCH=$4 CAP=$5; shift 5
  local L=$(left); local TMO=$(( L < CAP ? L : CAP ))
  if [ "$TMO" -lt 240 ]; then echo "[$(stamp)] HARVEST-SKIP e2e $NAME (deadline)"; return; fi
  local ORDER="best_val_iou latest best_val_loss"
  [ "$MDIR" = pix2poly ] && ORDER="latest best_val_iou best_val_loss"
  local CKPT=$(pick_ckpt "$CK/$MDIR/224/$NAME/checkpoints" $ORDER)
  if [ -z "$CKPT" ]; then echo "[$(stamp)] HARVEST-SKIP e2e $NAME (no ckpt)"; return; fi
  echo "[$(stamp)] HARVEST e2e $NAME (ckpt=$CKPT batch=$BATCH tmo=$TMO)"
  timeout $TMO nice -n -10 python scripts/measure_predict_e2e.py experiment=$EXP \
    dataset=synthetic run_type=release $XL experiment.name=$NAME checkpoint=$CKPT \
    evaluation=val evaluation.batch_size=$BATCH "$@" 2>"$LOGD/e2e_${NAME}.log" \
    | tee -a "$E2E" \
    || echo "[$(stamp)] HARVEST-FAIL e2e $NAME (see $LOGD/e2e_${NAME}.log)"
}

# ---- 1) predict e2e, trained ckpts, warm-pass medians --------------------
# P2P at batch 128 = the measured decode throughput peak (BENCH_TABLE
# decode_batch_scan); HiSup/FFL at the production batch 32. One cell per
# family — whichever trained this round, graded modality first.
PNAME=""; PEXP2=""; PCFG=""
XXL6="experiment.dataset.version=v2xxl experiment.dataset.num_train=6144 experiment.dataset.num_val=32 experiment.dataset.num_test=32"
for trip in "p2p_lidar_xxl6 p2p_lidar xxl6" "p2p_fusion_xxl6 p2p_fusion xxl6" "p2p_lidar_xl p2p_lidar xl" "p2p_image_xxl6 p2p_image xxl6"; do
  set -- $trip
  if [ -n "$(pick_ckpt "$CK/pix2poly/224/$1/checkpoints" latest best_val_iou best_val_loss)" ]; then
    PNAME=$1; PEXP2=$2; PCFG=$3; break
  fi
done
if [ -n "$PNAME" ]; then
  if [ "$PCFG" = xxl6 ]; then
    e2e $PEXP2 $PNAME pix2poly 128 900 $XXL6
  else
    e2e $PEXP2 $PNAME pix2poly 128 900
  fi
fi

HNAME=""; HEXP2=""
for pair in "hisup_fusion_xl hisup_fusion" "hisup_lidar_xl hisup_lidar" "hisup_image_xl hisup_image"; do
  set -- $pair
  if [ -n "$(pick_ckpt "$CK/hisup/224/$1/checkpoints" best_val_iou latest best_val_loss)" ]; then
    HNAME=$1; HEXP2=$2; break
  fi
done
[ -n "$HNAME" ] && e2e $HEXP2 $HNAME hisup 32 900

FNAME=""; FEXP2=""
for pair in "ffl_lidar_xl ffl_lidar" "ffl_fusion_xl ffl_fusion" "ffl_image_xl ffl_image"; do
  set -- $pair
  if [ -n "$(pick_ckpt "$CK/ffl/224/$1/checkpoints" best_val_iou latest best_val_loss)" ]; then
    FNAME=$1; FEXP2=$2; break
  fi
done
[ -n "$FNAME" ] && e2e $FEXP2 $FNAME ffl 32 900
python scripts/update_bench_table.py "$E2E" || true

# ---- 2) reference probes at 16 tiles with trained weights ----------------
# (VERDICT r4 weak #1: the 2-tile random-weight HiSup probe was not
# evidence-grade; bench_baselines now refuses <8 tiles by default.)
if [ "$(left)" -gt 600 ]; then
  HISUP_NAME=""
  for n in hisup_image_xl hisup_fusion_xl hisup_lidar_xl; do
    C=$(pick_ckpt "$CK/hisup/224/$n/checkpoints" best_val_iou latest)
    [ -n "$C" ] && { HISUP_NAME=$n; HISUP_CKPT="$CK/hisup/224/$n/checkpoints/$C"; break; }
  done
  FFL_CKPT_DIR="$CK/ffl/224/ffl_image_xl/checkpoints"
  FFLC=$(pick_ckpt "$FFL_CKPT_DIR" best_val_iou latest)
  ARGS=()
  MODELS=""
  if [ -n "$FFLC" ]; then MODELS="ffl"; fi
  if [ -n "$HISUP_NAME" ]; then MODELS="${MODELS:+$MODELS,}hisup"; fi
  HEXP=""
  case "$HISUP_NAME" in
    hisup_fusion_xl) HEXP="experiment=hisup_fusion" ;;
    hisup_lidar_xl)  HEXP="experiment=hisup_lidar" ;;
  esac
  if [ -n "$MODELS" ]; then
    echo "[$(stamp)] HARVEST probes ($MODELS; hisup=$HISUP_NAME)"
    # ffl probe loads ffl_image_xl weights; hisup probe loads the best
    # available trained hisup cell (its own experiment so shapes match)
    BENCH_MODELS=ffl BENCH_BATCH=16 timeout $(( $(left) > 900 ? 900 : $(left) )) \
      nice -n -10 python scripts/bench_baselines.py \
      "init_weights_from=$FFL_CKPT_DIR/$FFLC" \
      > "$LOGD/probe_ffl.log" 2>&1 || echo "[$(stamp)] HARVEST-FAIL ffl probe"
    if [ -n "$HISUP_NAME" ] && [ "$(left)" -gt 420 ]; then
      BENCH_MODELS=hisup BENCH_BATCH=16 timeout $(( $(left) > 1200 ? 1200 : $(left) )) \
        nice -n -10 python scripts/bench_baselines.py $HEXP \
        "init_weights_from=$HISUP_CKPT" \
        > "$LOGD/probe_hisup.log" 2>&1 || echo "[$(stamp)] HARVEST-FAIL hisup probe"
    fi
  fi
fi

# ---- 3) bank the round-5 eval CSVs as committed evidence ------------------
# (container restarts wipe outputs/; docs/ is git-tracked)
mkdir -p docs/results_round5
for d in "$CK"/*/224/*_xl "$CK"/*/224/*_xxl6; do
  n=$(basename "$d")
  for s in val test; do
    [ -f "$d/results/metrics_${s}.csv" ] && cp "$d/results/metrics_${s}.csv" "docs/results_round5/${n}_${s}.csv"
  done
done

# ---- 4) grid + STATUS refresh (CPU-only, cheap) ---------------------------
python scripts/collect_grid.py --split val  --out docs/results_round5 --splice STATUS.md \
  || echo "[$(stamp)] HARVEST-FAIL collect_grid val"
python scripts/collect_grid.py --split test --out docs/results_round5 \
  || echo "[$(stamp)] HARVEST-FAIL collect_grid test"

echo "[$(stamp)] HARVEST done (left=$(left)s)"
