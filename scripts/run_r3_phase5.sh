#!/usr/bin/env bash
# Round-3 phase 5: unet_skip x mixed-domain training + the three-protocol
# report for the skip_mixed checkpoint. Serialized behind phase 4
# (one relay client at a time; see run_r3_campaign.sh header).
set -u
cd "$(dirname "$0")/.."

SETTLE=75
LOG=outputs/campaign.log

while ! grep -q "phase4 complete" "${LOG}"; do sleep 60; done
sleep ${SETTLE}

out=outputs/r3_skip_mixed
if [ ! -f "${out}/TRAIN_DONE" ]; then
  mkdir -p "${out}"
  echo "=== skip_mixed: training $(date -u +%H:%M:%S) ===" >> "${LOG}"
  python scripts/train.py --config configs/experiments/long_skip_mixed.yaml \
      --synthetic --output-dir "${out}" >"${out}/train.log" 2>&1 \
    && touch "${out}/TRAIN_DONE" \
    || echo "=== skip_mixed: TRAIN FAILED ===" >> "${LOG}"
  sleep ${SETTLE}
fi

run_eval() {  # tag cfg
  local tag="$1" cfg="$2"
  local e=outputs/r3_eval/${tag}
  [ -f "${e}/DONE" ] && return 0
  mkdir -p "${e}"
  echo "=== eval ${tag} (${cfg}) $(date -u +%H:%M:%S) ===" >> "${LOG}"
  python scripts/evaluate.py --config "${cfg}" --synthetic \
      --checkpoint "${out}/checkpoints" --output-dir "${e}" \
      >"${e}/eval.log" 2>&1 && touch "${e}/DONE"
  echo "=== eval ${tag}: rc=$? ===" >> "${LOG}"
  sleep ${SETTLE}
}

run_eval skip_mixed_base512 configs/experiments/eval_skip512.yaml
run_eval skip_mixed_rich512 configs/experiments/eval_skip_rich512.yaml
run_eval skip_mixed_mix512  configs/experiments/eval_skip_mix512.yaml

echo "=== phase5 complete $(date -u +%H:%M:%S) ===" >> "${LOG}"
