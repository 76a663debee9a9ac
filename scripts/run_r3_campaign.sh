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
# Each run trains, then evaluates its best checkpoint on the matching
# 512-tile protocol. Logs land under outputs/<run>/train.log.
set -u
cd "$(dirname "$0")/.."

run() {
  local name="$1" cfg="$2"
  local out="outputs/r3_${name}"
  if [ -f "${out}/DONE" ]; then
    echo "=== ${name}: already DONE, skipping ==="
    return 0
  fi
  mkdir -p "${out}"
  echo "=== ${name}: training (config ${cfg}) ==="
  local resume=""
  [ -d "${out}/checkpoints" ] && resume="--resume --checkpoint ${out}/checkpoints"
  python scripts/train.py --config "${cfg}" --synthetic \
      --output-dir "${out}" ${resume} >"${out}/train.log" 2>&1
  local rc=$?
  if [ ${rc} -ne 0 ]; then
    echo "=== ${name}: TRAIN FAILED rc=${rc} (see ${out}/train.log) ==="
    return ${rc}
  fi
  echo "=== ${name}: evaluating ==="
  python scripts/evaluate.py --config "${cfg}" --synthetic \
      --checkpoint "${out}/checkpoints" \
      --output-dir "${out}/eval" >"${out}/eval.log" 2>&1 \
    && touch "${out}/DONE"
  echo "=== ${name}: done rc=$? ==="
}

run skip     configs/experiments/long_skip.yaml
run base600  configs/experiments/long_base600.yaml
run capacity configs/experiments/capacity_2x.yaml
run mixed    configs/experiments/long_mixed.yaml
echo "=== campaign complete ==="
