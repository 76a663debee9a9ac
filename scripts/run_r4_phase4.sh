#!/usr/bin/env bash
# Round-4 phase 4 (serialized behind phase 3):
#
#   1. skip_fill horizon extension 600 -> 2400, one continuous resume
#      (the r3 horizon-scaling pattern: the 600-ep arm's own-val was
#      still climbing at cutoff; phase-2 scored the 600-ep checkpoint,
#      this phase buys the tail).
#   2. Score the extended arm: 512 protocol plain + TTA-8, and the
#      widened 2048-tile protocol (VERDICT r3 #3) plain + TTA-8.
#   3. Re-anchor the round-3/4 skip flagships on the wide protocol so
#      every cross-round comparison cites the same basis:
#      r4_skip_ext3 (3600 ep) and r3_skip_ext2 (2400 ep).
#
# Relay hygiene per memory/axon-relay-client-serialization: one client
# at a time, 75 s settle between steps.
set -u
cd "$(dirname "$0")/.."

SETTLE=75
LOG=outputs/campaign.log
mkdir -p outputs/r4_eval

while ! grep -q "r4 phase3 complete" "${LOG}"; do sleep 60; done
sleep ${SETTLE}

run_eval() {  # tag cfg ckpt extra...
  local tag="$1" cfg="$2" ckpt="$3"; shift 3
  local e="outputs/r4_eval/${tag}"
  [ -f "${e}/DONE" ] && return 0
  mkdir -p "${e}"
  echo "=== r4p4 eval ${tag} $(date -u +%H:%M:%S) ===" >> "${LOG}"
  python scripts/evaluate.py --config "${cfg}" --synthetic \
      --checkpoint "${ckpt}" --output-dir "${e}" "$@" \
      >"${e}/eval.log" 2>&1 && touch "${e}/DONE"
  echo "=== r4p4 eval ${tag}: rc=$? ===" >> "${LOG}"
  sleep ${SETTLE}
}

# --- 1. skip_fill 600 -> 2400 (continuous resume) ---
out=outputs/r4_skip_fill_ext
if [ ! -f "${out}/TRAIN_DONE" ]; then
  mkdir -p "${out}"
  ckpt=outputs/r4_skip_fill/checkpoints
  if [ -n "$(ls -A "${out}/checkpoints" 2>/dev/null)" ]; then
    ckpt="${out}/checkpoints"
  fi
  echo "=== r4p4 skip_fill_ext: training 600->2400 (from ${ckpt}) $(date -u +%H:%M:%S) ===" >> "${LOG}"
  python scripts/train.py --config configs/experiments/long_skip_fill.yaml \
      --synthetic --output-dir "${out}" --epochs 2400 \
      --resume --checkpoint "${ckpt}" >"${out}/train.log" 2>&1 \
    && touch "${out}/TRAIN_DONE" \
    || echo "=== r4p4 skip_fill_ext: TRAIN FAILED ===" >> "${LOG}"
  sleep ${SETTLE}
fi

# --- 2. score the extended flagship ---
run_eval fill_ext_512 configs/experiments/eval_fill512.yaml "${out}/checkpoints"
run_eval fill_ext_tta8 configs/experiments/eval_fill512.yaml "${out}/checkpoints" --tta 8
run_eval fill_ext_wide configs/experiments/eval_wide_fill2048.yaml "${out}/checkpoints"
run_eval fill_ext_wide_tta8 configs/experiments/eval_wide_fill2048.yaml "${out}/checkpoints" --tta 8

# --- 3. re-anchor prior flagships on the wide protocol ---
run_eval skip_ext3_wide configs/experiments/eval_wide_skip2048.yaml \
    outputs/r4_skip_ext3/checkpoints
run_eval skip_ext2_wide configs/experiments/eval_wide_skip2048.yaml \
    outputs/r3_skip_ext2/checkpoints
run_eval fill600_wide configs/experiments/eval_wide_fill2048.yaml \
    outputs/r4_skip_fill/checkpoints

echo "=== r4 phase4 complete $(date -u +%H:%M:%S) ===" >> "${LOG}"
