#!/usr/bin/env bash
# Round-3 phase 4: the skip extension kept accelerating through 1200
# epochs (37.37 @ 600 -> 40.04 @ 1187, +0.46 dB in the last 100), so
# double the horizon again: resume r3_skip_ext 1200 -> 2400. The
# --epochs override rebuilds the cosine over the longer horizon, so the
# restored step lands mid-schedule — an SGDR-style warm restart that is
# exactly what unlocked 600 -> 1200.
# Serialized behind the phase-3 TPU checks (one relay client at a time).
set -u
cd "$(dirname "$0")/.."

SETTLE=75
LOG=outputs/campaign.log

while ! grep -q "tpu checks complete" "${LOG}"; do sleep 60; done
sleep ${SETTLE}

out=outputs/r3_skip_ext2
if [ ! -f "${out}/TRAIN_DONE" ]; then
  mkdir -p "${out}"
  # Resume from this run's own checkpoints if a prior attempt got partway
  # (otherwise a rerun would restart at epoch 1200 and discard progress).
  ckpt=outputs/r3_skip_ext/checkpoints
  if [ -n "$(ls -A "${out}/checkpoints" 2>/dev/null)" ]; then
    ckpt="${out}/checkpoints"
  fi
  echo "=== skip_ext2: training 1200->2400 (from ${ckpt}) $(date -u +%H:%M:%S) ===" >> "${LOG}"
  python scripts/train.py --config configs/experiments/long_skip.yaml \
      --synthetic --output-dir "${out}" --epochs 2400 \
      --resume --checkpoint "${ckpt}" \
      >"${out}/train.log" 2>&1 \
    && touch "${out}/TRAIN_DONE" \
    || echo "=== skip_ext2: TRAIN FAILED ===" >> "${LOG}"
  sleep ${SETTLE}
fi

for tag in skip_ext2_512 skip_ext2_tta8; do
  e=outputs/r3_eval/${tag}
  [ -f "${e}/DONE" ] && continue
  mkdir -p "${e}"
  extra=""
  [ "${tag}" = "skip_ext2_tta8" ] && extra="--tta 8"
  echo "=== eval ${tag} $(date -u +%H:%M:%S) ===" >> "${LOG}"
  python scripts/evaluate.py --config configs/experiments/long_skip.yaml \
      --synthetic --checkpoint "${out}/checkpoints" \
      --output-dir "${e}" ${extra} >"${e}/eval.log" 2>&1 && touch "${e}/DONE"
  echo "=== eval ${tag}: rc=$? ===" >> "${LOG}"
  sleep ${SETTLE}
done

echo "=== phase4 complete $(date -u +%H:%M:%S) ===" >> "${LOG}"
