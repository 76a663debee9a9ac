#!/usr/bin/env bash
# Round-3 quality campaign (docs/DESIGN.md §10 consequence): four
# sequential TPU runs — the TPU is a single chip behind the axon relay,
# so runs MUST be serial (concurrent XLA compiles starve each other).
#
#   1. long_skip     unet_skip decoder (the bottleneck-bypass lever)
#   2. long_base600  control arm (round-1 protocol rerun, same commit)
#   3. capacity_2x   2x decoder channels (capacity control)
#   4. long_mixed    50/50 base+rich domain mix (cross-domain cliff fix)
#
# RELAY RULE (measured 2026-08-19): the axon relay serializes clients and
# WEDGES if a new client connects while the previous one is still
# draining — recovery needs every client killed plus a ~90 s settle.
# Hence: one phase at a time, a settle gap between phases, and NEVER run
# ad-hoc TPU probes while this script is active.
#
# Trainings all run first (pass 1), evaluations after (pass 2); each
# phase writes a marker so reruns resume where they left off.
set -u
cd "$(dirname "$0")/.."

SETTLE=75

train_one() {
  local name="$1" cfg="$2"
  local out="outputs/r3_${name}"
  if [ -f "${out}/TRAIN_DONE" ]; then
    echo "=== ${name}: train already done ==="
    return 0
  fi
  mkdir -p "${out}"
  echo "=== ${name}: training (config ${cfg}) $(date -u +%H:%M:%S) ==="
  local resume=""
  [ -d "${out}/checkpoints" ] && resume="--resume --checkpoint ${out}/checkpoints"
  python scripts/train.py --config "${cfg}" --synthetic \
      --output-dir "${out}" ${resume} >"${out}/train.log" 2>&1
  local rc=$?
  if [ ${rc} -ne 0 ]; then
    echo "=== ${name}: TRAIN FAILED rc=${rc} (see ${out}/train.log) ==="
  else
    touch "${out}/TRAIN_DONE"
  fi
  sleep ${SETTLE}
  return ${rc}
}

eval_one() {
  local name="$1" cfg="$2"
  local out="outputs/r3_${name}"
  if [ -f "${out}/DONE" ]; then
    echo "=== ${name}: eval already done ==="
    return 0
  fi
  [ -f "${out}/TRAIN_DONE" ] || { echo "=== ${name}: no train, skip eval ==="; return 1; }
  echo "=== ${name}: evaluating $(date -u +%H:%M:%S) ==="
  python scripts/evaluate.py --config "${cfg}" --synthetic \
      --checkpoint "${out}/checkpoints" \
      --output-dir "${out}/eval" >"${out}/eval.log" 2>&1 \
    && touch "${out}/DONE"
  echo "=== ${name}: eval rc=$? ==="
  sleep ${SETTLE}
}

train_one skip     configs/experiments/long_skip.yaml
train_one base600  configs/experiments/long_base600.yaml
train_one capacity configs/experiments/capacity_2x.yaml
train_one mixed    configs/experiments/long_mixed.yaml

eval_one skip     configs/experiments/long_skip.yaml
eval_one base600  configs/experiments/long_base600.yaml
eval_one capacity configs/experiments/capacity_2x.yaml
eval_one mixed    configs/experiments/long_mixed.yaml
echo "=== campaign complete $(date -u +%H:%M:%S) ==="
