#!/usr/bin/env bash
# Round-4 phase 2: the two staged quality probes at the standard 600-ep
# budget, serialized behind phase 1 (one relay client at a time):
#
#   1. skip_fill — unet_skip + dead-band input fill + residual
#      (long_skip_fill.yaml, ops/fill.py). Initializes AT the 46.4-dB
#      zero-skill floor; the 600-ep score vs long_skip's 37.16 decides
#      the extension budget in phase 3.
#   2. skip_res — the VERDICT-r3 item: long_skip_res.yaml (global
#      residual head, now with the zero-init head), never run in r3.
#
# Each arm is scored on the 512 protocol (plain; TTA deferred to the
# final eval phase).
set -u
cd "$(dirname "$0")/.."

SETTLE=75
LOG=outputs/campaign.log
mkdir -p outputs/r4_eval

while ! grep -q "r4 phase1 complete" "${LOG}"; do sleep 60; done
sleep ${SETTLE}

run_train() {  # name cfg epochs
  local name="$1" cfg="$2" epochs="$3"
  local out="outputs/r4_${name}"
  [ -f "${out}/TRAIN_DONE" ] && return 0
  mkdir -p "${out}"
  local extra=""
  if [ -n "$(ls -A "${out}/checkpoints" 2>/dev/null)" ]; then
    extra="--resume --checkpoint ${out}/checkpoints"
  fi
  echo "=== r4p2 ${name}: training -> ${epochs} ep $(date -u +%H:%M:%S) ===" >> "${LOG}"
  python scripts/train.py --config "${cfg}" --synthetic \
      --output-dir "${out}" --epochs "${epochs}" ${extra} \
      >"${out}/train.log" 2>&1 \
    && touch "${out}/TRAIN_DONE" \
    || echo "=== r4p2 ${name}: TRAIN FAILED ===" >> "${LOG}"
  sleep ${SETTLE}
}

run_eval() {  # tag cfg ckpt extra...
  local tag="$1" cfg="$2" ckpt="$3"; shift 3
  local e="outputs/r4_eval/${tag}"
  [ -f "${e}/DONE" ] && return 0
  mkdir -p "${e}"
  echo "=== r4p2 eval ${tag} $(date -u +%H:%M:%S) ===" >> "${LOG}"
  python scripts/evaluate.py --config "${cfg}" --synthetic \
      --checkpoint "${ckpt}" --output-dir "${e}" "$@" \
      >"${e}/eval.log" 2>&1 && touch "${e}/DONE"
  echo "=== r4p2 eval ${tag}: rc=$? ===" >> "${LOG}"
  sleep ${SETTLE}
}

run_train skip_fill configs/experiments/long_skip_fill.yaml 600
run_eval skip_fill_512 configs/experiments/eval_fill512.yaml outputs/r4_skip_fill/checkpoints

run_train skip_res configs/experiments/long_skip_res.yaml 600
run_eval skip_res_512 configs/experiments/long_skip_res.yaml outputs/r4_skip_res/checkpoints

echo "=== r4 phase2 complete $(date -u +%H:%M:%S) ===" >> "${LOG}"
