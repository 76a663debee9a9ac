#!/usr/bin/env bash
# Round-3 phase 6 (rewritten after the phase-4 result): allocate the
# remaining TPU budget by measured value, highest first —
#
#   1. skip_ext3 — resume the 43.1-dB skip arm 2400 -> 3600 (still
#      +0.14 dB/100 ep at cutoff; ~31 min for a likely +0.5-1 dB)
#   2. skip_res_ext — IF the phase-7 residual probe beats the plain
#      skip arm at the same budget (>= 38 dB at 600 ep), extend it to
#      2400 so the residual family gets the same horizon the skip arm
#      proved out
#   3. skip_data_ext — data-scaling extension 240 -> 600 (shrunk from
#      960: the slope evidence matters, the wall-clock does too)
#
# A wall-clock guard skips any training that would start after the
# cutoff (the driver needs the relay free at round end for bench.py).
# Serialized behind phase 7 (one relay client at a time).
set -u
cd "$(dirname "$0")/.."

SETTLE=75
LOG=outputs/campaign.log
CUTOFF_EPOCH=$(date -u -d "today 20:30" +%s 2>/dev/null || echo 0)

past_cutoff() {
  [ "${CUTOFF_EPOCH}" != "0" ] && [ "$(date -u +%s)" -gt "${CUTOFF_EPOCH}" ]
}

while ! grep -q "phase7 complete" "${LOG}"; do sleep 60; done
sleep ${SETTLE}

run_train() {  # name cfg base_ckpt epochs
  local name="$1" cfg="$2" base="$3" epochs="$4"
  local out="outputs/r3_${name}"
  [ -f "${out}/TRAIN_DONE" ] && return 0
  if past_cutoff; then
    echo "=== ${name}: SKIPPED (past wall-clock cutoff) ===" >> "${LOG}"
    return 1
  fi
  mkdir -p "${out}"
  # resume from this run's own checkpoints if a prior attempt got partway
  local ckpt="${base}"
  if [ -n "$(ls -A "${out}/checkpoints" 2>/dev/null)" ]; then
    ckpt="${out}/checkpoints"
  fi
  echo "=== ${name}: training -> ${epochs} ep (from ${ckpt}) $(date -u +%H:%M:%S) ===" >> "${LOG}"
  python scripts/train.py --config "${cfg}" --synthetic \
      --output-dir "${out}" --epochs "${epochs}" \
      --resume --checkpoint "${ckpt}" >"${out}/train.log" 2>&1 \
    && touch "${out}/TRAIN_DONE" \
    || echo "=== ${name}: TRAIN FAILED ===" >> "${LOG}"
  sleep ${SETTLE}
}

run_eval() {  # tag cfg ckpt extra...
  local tag="$1" cfg="$2" ckpt="$3"; shift 3
  local e="outputs/r3_eval/${tag}"
  [ -f "${e}/DONE" ] && return 0
  mkdir -p "${e}"
  echo "=== eval ${tag} $(date -u +%H:%M:%S) ===" >> "${LOG}"
  python scripts/evaluate.py --config "${cfg}" --synthetic \
      --checkpoint "${ckpt}" --output-dir "${e}" "$@" \
      >"${e}/eval.log" 2>&1 && touch "${e}/DONE"
  echo "=== eval ${tag}: rc=$? ===" >> "${LOG}"
  sleep ${SETTLE}
}

# --- 1. skip horizon 2400 -> 3600 ---
if run_train skip_ext3 configs/experiments/long_skip.yaml \
    outputs/r3_skip_ext2/checkpoints 3600; then
  run_eval skip_ext3_512  configs/experiments/long_skip.yaml outputs/r3_skip_ext3/checkpoints
  run_eval skip_ext3_tta8 configs/experiments/long_skip.yaml outputs/r3_skip_ext3/checkpoints --tta 8
fi

# --- 2. conditional residual extension ---
RES_PSNR=$(python -c "
import json
try:
    print(json.load(open('outputs/r3_eval/skip_res_512/evaluation_results.json'))['psnr'])
except Exception:
    print(0)")
if python -c "import sys; sys.exit(0 if float('${RES_PSNR}') >= 38.0 else 1)"; then
  echo "=== skip_res probe ${RES_PSNR} dB >= 38: extending to 2400 ===" >> "${LOG}"
  if run_train skip_res_ext configs/experiments/long_skip_res.yaml \
      outputs/r3_skip_res/checkpoints 2400; then
    run_eval skip_res_ext_512  configs/experiments/long_skip_res.yaml outputs/r3_skip_res_ext/checkpoints
    run_eval skip_res_ext_tta8 configs/experiments/long_skip_res.yaml outputs/r3_skip_res_ext/checkpoints --tta 8
  fi
else
  echo "=== skip_res probe ${RES_PSNR} dB < 38: no extension ===" >> "${LOG}"
fi

# --- 3. data-scaling extension 240 -> 600 ---
if run_train skip_data_ext configs/experiments/long_skip_data.yaml \
    outputs/r3_skip_data/checkpoints 600; then
  run_eval skip_data_ext_512  configs/experiments/eval_skip512.yaml outputs/r3_skip_data_ext/checkpoints
  run_eval skip_data_ext_tta8 configs/experiments/eval_skip512.yaml outputs/r3_skip_data_ext/checkpoints --tta 8
fi

echo "=== phase6 complete $(date -u +%H:%M:%S) ===" >> "${LOG}"
