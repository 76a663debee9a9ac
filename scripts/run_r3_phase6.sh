#!/usr/bin/env bash
# Round-3 phase 6: data-scaling extension for the skip architecture.
# skip_data (unet_skip x 4096 tiles) cut off at 240 epochs still climbing
# +1.08 dB per 100 epochs (steepest tail in the campaign; 36.72 dB on the
# 512 protocol already). Extend 240 -> 960 with the same SGDR-style
# horizon rebuild that unlocked skip_ext (see run_r3_phase4.sh header).
# Serialized behind phase 7 (the cheap residual probe runs first so its
# signal lands before this 3-h extension; one relay client at a time).
set -u
cd "$(dirname "$0")/.."

SETTLE=75
LOG=outputs/campaign.log

while ! grep -q "phase7 complete" "${LOG}"; do sleep 60; done
sleep ${SETTLE}

out=outputs/r3_skip_data_ext
if [ ! -f "${out}/TRAIN_DONE" ]; then
  mkdir -p "${out}"
  # Resume from this run's own checkpoints if a prior attempt got partway
  # (otherwise a rerun would restart at epoch 240 and discard progress).
  ckpt=outputs/r3_skip_data/checkpoints
  if [ -n "$(ls -A "${out}/checkpoints" 2>/dev/null)" ]; then
    ckpt="${out}/checkpoints"
  fi
  echo "=== skip_data_ext: training 240->960 (from ${ckpt}) $(date -u +%H:%M:%S) ===" >> "${LOG}"
  python scripts/train.py --config configs/experiments/long_skip_data.yaml \
      --synthetic --output-dir "${out}" --epochs 960 \
      --resume --checkpoint "${ckpt}" \
      >"${out}/train.log" 2>&1 \
    && touch "${out}/TRAIN_DONE" \
    || echo "=== skip_data_ext: TRAIN FAILED ===" >> "${LOG}"
  sleep ${SETTLE}
fi

for tag in skip_data_ext_512 skip_data_ext_tta8; do
  e=outputs/r3_eval/${tag}
  [ -f "${e}/DONE" ] && continue
  mkdir -p "${e}"
  extra=""
  [ "${tag}" = "skip_data_ext_tta8" ] && extra="--tta 8"
  echo "=== eval ${tag} $(date -u +%H:%M:%S) ===" >> "${LOG}"
  python scripts/evaluate.py --config configs/experiments/eval_skip512.yaml \
      --synthetic --checkpoint "${out}/checkpoints" \
      --output-dir "${e}" ${extra} >"${e}/eval.log" 2>&1 && touch "${e}/DONE"
  echo "=== eval ${tag}: rc=$? ===" >> "${LOG}"
  sleep ${SETTLE}
done

echo "=== phase6 complete $(date -u +%H:%M:%S) ===" >> "${LOG}"
