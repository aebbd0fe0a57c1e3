#!/bin/bash
# Round-5 v7 companion: prebuild every queue cell's device-cache packs on the
# host CPU, in queue order, while the chip trains earlier cells.  Packs are
# written atomically (tmp+rename) into the versioned dataset dir, so a later
# train run finds its pack instead of building it inside its chip box.
set -u
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu

XL="experiment.dataset.version=v2xl experiment.dataset.num_train=2048 experiment.dataset.num_val=32 experiment.dataset.num_test=32"
XXL6="experiment.dataset.version=v2xxl experiment.dataset.num_train=6144 experiment.dataset.num_val=32 experiment.dataset.num_test=32"

pb () {
  local EXP=$1 CFG=$2
  echo "[$(date -u +%H:%M:%S)] PREBUILD $EXP"
  nice -n 5 python scripts/prebuild_caches.py "$EXP" train val $CFG \
    >> outputs/round5_logs/prebuild.log 2>&1 \
    && echo "[$(date -u +%H:%M:%S)] PREBUILD-OK $EXP" \
    || echo "[$(date -u +%H:%M:%S)] PREBUILD-FAIL $EXP"
}

mkdir -p outputs/round5_logs
pb ffl_image "$XL"
pb ffl_lidar "$XL"
pb p2p_image "$XXL6"
pb p2p_lidar "$XXL6"
pb p2p_fusion "$XXL6"
pb hisup_lidar "$XL"
pb hisup_fusion "$XL"
pb hisup_image "$XL"
pb ffl_fusion "$XL"
echo "[$(date -u +%H:%M:%S)] PREBUILD chain done"
