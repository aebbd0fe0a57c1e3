#!/bin/bash
# Round-5 evidence banker: container restarts wipe outputs/, so every few
# minutes copy any eval CSVs + queue logs' tail into git-tracked docs/ and
# commit. Runs alongside round5_queue_v7.sh; exits at its deadline.
set -u
cd "$(dirname "$0")/.."

DEADLINE=${BANK_DEADLINE:-1787082600}
CK=outputs/Synthetic_output
LOGD=outputs/round5_logs

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  sleep 420
  mkdir -p docs/results_round5
  for d in "$CK"/*/224/*_xl "$CK"/*/224/*_xxl6; do
    [ -d "$d" ] || continue
    n=$(basename "$d")
    for s in val test; do
      [ -f "$d/results/metrics_${s}.csv" ] && cp "$d/results/metrics_${s}.csv" "docs/results_round5/${n}_${s}.csv"
    done
  done
  # one-line queue progress snapshot (small, useful forensic trail)
  grep -h "QUEUE\|PREBUILD" "$LOGD"/queue_v7.log "$LOGD"/prebuild_chain.log 2>/dev/null \
    > docs/results_round5/queue_v7_progress.txt || true
  if ! git diff --quiet -- docs/results_round5 2>/dev/null \
     || [ -n "$(git status --porcelain docs/results_round5)" ]; then
    git add docs/results_round5
    git commit -q -m "Bank round-5 eval CSVs + queue progress (auto)

No-Verification-Needed: docs-only evidence banking" || true
  fi
done
