#!/usr/bin/env bash
# Round-4 phase 3 (serialized behind phase 2):
#   1. quality-vs-noise sweep (VERDICT #5): low/medium/high regimes at
#      the reference's own budgets (50/100/150 ep), flagship arch;
#      each arm scored on its own val protocol (matched noise).
#   2. two-stage recipe (VERDICT #7): verbatim reference pair
#      (stage_a_decoder -> stage_b_finetune) for mechanics, and the
#      flagship pair (stage_a_skipfill -> stage_b_skipfill) for quality;
#      stage B warm-starts via --init-from (weights-only graft across
#      the freeze-structure change).
set -u
cd "$(dirname "$0")/.."

SETTLE=75
LOG=outputs/campaign.log
mkdir -p outputs/r4_eval

while ! grep -q "r4 phase2 complete" "${LOG}"; do sleep 60; done
sleep ${SETTLE}

run_train() {  # name cfg [extra train args...]
  local name="$1" cfg="$2"; shift 2
  local out="outputs/r4_${name}"
  [ -f "${out}/TRAIN_DONE" ] && return 0
  mkdir -p "${out}"
  echo "=== r4p3 ${name}: training $(date -u +%H:%M:%S) ===" >> "${LOG}"
  python scripts/train.py --config "${cfg}" --synthetic \
      --output-dir "${out}" "$@" >"${out}/train.log" 2>&1 \
    && touch "${out}/TRAIN_DONE" \
    || echo "=== r4p3 ${name}: TRAIN FAILED ===" >> "${LOG}"
  sleep ${SETTLE}
}

run_eval() {  # tag cfg ckpt extra...
  local tag="$1" cfg="$2" ckpt="$3"; shift 3
  local e="outputs/r4_eval/${tag}"
  [ -f "${e}/DONE" ] && return 0
  mkdir -p "${e}"
  echo "=== r4p3 eval ${tag} $(date -u +%H:%M:%S) ===" >> "${LOG}"
  python scripts/evaluate.py --config "${cfg}" --synthetic \
      --checkpoint "${ckpt}" --output-dir "${e}" "$@" \
      >"${e}/eval.log" 2>&1 && touch "${e}/DONE"
  echo "=== r4p3 eval ${tag}: rc=$? ===" >> "${LOG}"
  sleep ${SETTLE}
}

# --- 1. noise sweep (own-protocol scoring: matched noise levels) ---
for lvl in low medium high; do
  run_train "sweep_${lvl}" "configs/experiments/sweep_${lvl}_fill.yaml"
  run_eval "sweep_${lvl}" "configs/experiments/sweep_${lvl}_fill.yaml" \
      "outputs/r4_sweep_${lvl}/checkpoints"
done

# --- 2a. two-stage recipe, verbatim reference configs ---
run_train stage_a configs/experiments/stage_a_decoder.yaml
if [ -f outputs/r4_stage_a/TRAIN_DONE ]; then
  run_train stage_b configs/experiments/stage_b_finetune.yaml \
      --init-from outputs/r4_stage_a/checkpoints
  run_eval stage_b configs/experiments/stage_b_finetune.yaml \
      outputs/r4_stage_b/checkpoints
fi

# --- 2b. two-stage recipe, flagship architecture ---
run_train stage_a_fill configs/experiments/stage_a_skipfill.yaml
if [ -f outputs/r4_stage_a_fill/TRAIN_DONE ]; then
  run_train stage_b_fill configs/experiments/stage_b_skipfill.yaml \
      --init-from outputs/r4_stage_a_fill/checkpoints
  run_eval stage_a_fill configs/experiments/stage_a_skipfill.yaml \
      outputs/r4_stage_a_fill/checkpoints
  run_eval stage_b_fill configs/experiments/stage_b_skipfill.yaml \
      outputs/r4_stage_b_fill/checkpoints
fi

echo "=== r4 phase3 complete $(date -u +%H:%M:%S) ===" >> "${LOG}"
