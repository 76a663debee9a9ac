#!/usr/bin/env bash
# Round-4b campaign: regenerate + finish the round-4 quality program
# after the build machine lost outputs/ (all checkpoints + eval
# artifacts — outputs/ is per-machine, gitignored). Every DESIGN §10.5
# claim must have on-disk evidence again, and the unfinished phases
# (horizon extension, noise sweep, two-stage, skip_res) still need to
# run. One serialized script = one relay client at a time (relay
# hygiene: concurrent XLA compiles starve each other); 75 s settle
# between steps; DONE markers make every step resumable.
#
# Phases (strict order, highest value first):
#   1. skip_fill 600 ep retrain + 512-protocol eval  (flagship artifact)
#   2. skip_fill_ext 600->2400 + evals: 512, 512+TTA8, wide2048,
#      wide2048+TTA8, and the 600-ep ckpt on wide2048 (re-anchor)
#   3. noise sweep low/medium/high on the flagship arch + own-protocol
#      evals (reference README quality-vs-noise table counterpart)
#   4. two-stage recipe: verbatim reference pair + flagship pair
#      (stage B via --init-from weights-only graft)
#   5. skip_res 600 ep + eval (VERDICT r3 item, never yet scored)
#   6. committed bench refresh (run_benchmarks.py -> results.json;
#      quality row picks up the phase-2 flagship checkpoint)
set -u
cd "$(dirname "$0")/.."

SETTLE=75
LOG=outputs/campaign_r4b.log
mkdir -p outputs/r4_eval outputs/r4_checks

mark() { echo "=== $* $(date -u +%H:%M:%S) ===" >> "${LOG}"; }

run_train() {  # name cfg [extra args...]
  local name="$1" cfg="$2"; shift 2
  local out="outputs/r4_${name}"
  [ -f "${out}/TRAIN_DONE" ] && return 0
  mkdir -p "${out}"
  local extra=""
  if [ -n "$(ls -A "${out}/checkpoints" 2>/dev/null)" ]; then
    extra="--resume --checkpoint ${out}/checkpoints"
  fi
  mark "train ${name}"
  python scripts/train.py --config "${cfg}" --synthetic \
      --output-dir "${out}" ${extra} "$@" >"${out}/train.log" 2>&1 \
    && touch "${out}/TRAIN_DONE" \
    || mark "train ${name} FAILED"
  sleep ${SETTLE}
}

run_eval() {  # tag cfg ckpt [extra args...]
  local tag="$1" cfg="$2" ckpt="$3"; shift 3
  local e="outputs/r4_eval/${tag}"
  [ -f "${e}/DONE" ] && return 0
  mkdir -p "${e}"
  mark "eval ${tag}"
  python scripts/evaluate.py --config "${cfg}" --synthetic \
      --checkpoint "${ckpt}" --output-dir "${e}" "$@" \
      >"${e}/eval.log" 2>&1 && touch "${e}/DONE" \
    || mark "eval ${tag} FAILED"
  sleep ${SETTLE}
}

# --- phase 1: flagship 600 ep -----------------------------------------
run_train skip_fill configs/experiments/long_skip_fill.yaml
run_eval fill600_512 configs/experiments/eval_fill512.yaml \
    outputs/r4_skip_fill/checkpoints
mark "r4b phase1 complete"

# --- phase 2: horizon extension 600 -> 2400 ---------------------------
out=outputs/r4_skip_fill_ext
if [ ! -f "${out}/TRAIN_DONE" ]; then
  mkdir -p "${out}"
  ckpt=outputs/r4_skip_fill/checkpoints
  if [ -n "$(ls -A "${out}/checkpoints" 2>/dev/null)" ]; then
    ckpt="${out}/checkpoints"
  fi
  mark "train skip_fill_ext 600->2400 (from ${ckpt})"
  python scripts/train.py --config configs/experiments/long_skip_fill.yaml \
      --synthetic --output-dir "${out}" --epochs 2400 \
      --resume --checkpoint "${ckpt}" >"${out}/train.log" 2>&1 \
    && touch "${out}/TRAIN_DONE" \
    || mark "train skip_fill_ext FAILED"
  sleep ${SETTLE}
fi
run_eval fill_ext_512 configs/experiments/eval_fill512.yaml "${out}/checkpoints"
run_eval fill_ext_tta8 configs/experiments/eval_fill512.yaml "${out}/checkpoints" --tta 8
run_eval fill_ext_wide configs/experiments/eval_wide_fill2048.yaml "${out}/checkpoints"
run_eval fill_ext_wide_tta8 configs/experiments/eval_wide_fill2048.yaml "${out}/checkpoints" --tta 8
run_eval fill600_wide configs/experiments/eval_wide_fill2048.yaml \
    outputs/r4_skip_fill/checkpoints
mark "r4b phase2 complete"

# --- phase 3: quality-vs-noise sweep ----------------------------------
for lvl in low medium high; do
  run_train "sweep_${lvl}" "configs/experiments/sweep_${lvl}_fill.yaml"
  run_eval "sweep_${lvl}" "configs/experiments/sweep_${lvl}_fill.yaml" \
      "outputs/r4_sweep_${lvl}/checkpoints"
done
mark "r4b phase3 complete"

# --- phase 4: two-stage recipe ----------------------------------------
run_train stage_a configs/experiments/stage_a_decoder.yaml
if [ -f outputs/r4_stage_a/TRAIN_DONE ] && [ ! -f outputs/r4_stage_b/TRAIN_DONE ]; then
  mkdir -p outputs/r4_stage_b
  mark "train stage_b (init-from stage_a)"
  python scripts/train.py --config configs/experiments/stage_b_finetune.yaml \
      --synthetic --output-dir outputs/r4_stage_b \
      --init-from outputs/r4_stage_a/checkpoints \
      >outputs/r4_stage_b/train.log 2>&1 \
    && touch outputs/r4_stage_b/TRAIN_DONE \
    || mark "train stage_b FAILED"
  sleep ${SETTLE}
fi
run_eval stage_b configs/experiments/stage_b_finetune.yaml \
    outputs/r4_stage_b/checkpoints

run_train stage_a_fill configs/experiments/stage_a_skipfill.yaml
if [ -f outputs/r4_stage_a_fill/TRAIN_DONE ] && [ ! -f outputs/r4_stage_b_fill/TRAIN_DONE ]; then
  mkdir -p outputs/r4_stage_b_fill
  mark "train stage_b_fill (init-from stage_a_fill)"
  python scripts/train.py --config configs/experiments/stage_b_skipfill.yaml \
      --synthetic --output-dir outputs/r4_stage_b_fill \
      --init-from outputs/r4_stage_a_fill/checkpoints \
      >outputs/r4_stage_b_fill/train.log 2>&1 \
    && touch outputs/r4_stage_b_fill/TRAIN_DONE \
    || mark "train stage_b_fill FAILED"
  sleep ${SETTLE}
fi
run_eval stage_a_fill configs/experiments/stage_a_skipfill.yaml \
    outputs/r4_stage_a_fill/checkpoints
run_eval stage_b_fill configs/experiments/stage_b_skipfill.yaml \
    outputs/r4_stage_b_fill/checkpoints
mark "r4b phase4 complete"

# --- phase 5: skip_res (VERDICT r3, never scored) ----------------------
run_train skip_res configs/experiments/long_skip_res.yaml
run_eval skip_res_512 configs/experiments/long_skip_res.yaml \
    outputs/r4_skip_res/checkpoints
mark "r4b phase5 complete"

# --- phase 6: committed bench refresh ----------------------------------
if [ ! -f outputs/r4_checks/bench_refresh.done ]; then
  mark "bench refresh"
  python benchmarks/run_benchmarks.py > outputs/r4_checks/bench_refresh.log 2>&1 \
    && touch outputs/r4_checks/bench_refresh.done \
    || mark "bench refresh FAILED"
fi
mark "r4b campaign complete"
