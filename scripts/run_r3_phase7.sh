#!/usr/bin/env bash
# Round-3 phase 7: global-residual probe (long_skip_res = unet_skip +
# output = input + correction). 600 epochs on the 512 protocol — directly
# comparable to control 35.42 / skip 37.16 at the same budget. Cheap
# (~30 min) and decides whether the residual family is the round-4
# flagship. Serialized behind phase 5; phase 6 (the 3-h skip_data
# extension) waits for this probe so the signal lands early.
set -u
cd "$(dirname "$0")/.."

SETTLE=75
LOG=outputs/campaign.log

while ! grep -q "phase5 complete" "${LOG}"; do sleep 60; done
sleep ${SETTLE}

out=outputs/r3_skip_res
if [ ! -f "${out}/TRAIN_DONE" ]; then
  mkdir -p "${out}"
  ckpt=""
  if [ -n "$(ls -A "${out}/checkpoints" 2>/dev/null)" ]; then
    ckpt="--resume --checkpoint ${out}/checkpoints"
  fi
  echo "=== skip_res: training $(date -u +%H:%M:%S) ===" >> "${LOG}"
  python scripts/train.py --config configs/experiments/long_skip_res.yaml \
      --synthetic --output-dir "${out}" ${ckpt} >"${out}/train.log" 2>&1 \
    && touch "${out}/TRAIN_DONE" \
    || echo "=== skip_res: TRAIN FAILED ===" >> "${LOG}"
  sleep ${SETTLE}
fi

for tag in skip_res_512 skip_res_tta8; do
  e=outputs/r3_eval/${tag}
  [ -f "${e}/DONE" ] && continue
  mkdir -p "${e}"
  extra=""
  [ "${tag}" = "skip_res_tta8" ] && extra="--tta 8"
  echo "=== eval ${tag} $(date -u +%H:%M:%S) ===" >> "${LOG}"
  python scripts/evaluate.py --config configs/experiments/long_skip_res.yaml \
      --synthetic --checkpoint "${out}/checkpoints" \
      --output-dir "${e}" ${extra} >"${e}/eval.log" 2>&1 && touch "${e}/DONE"
  echo "=== eval ${tag}: rc=$? ===" >> "${LOG}"
  sleep ${SETTLE}
done

echo "=== phase7 complete $(date -u +%H:%M:%S) ===" >> "${LOG}"
