#!/usr/bin/env bash
# Round-4d follow-up: the phases run_r4c_campaign.sh's time gate skipped
# (noise sweep + two-stage pair). Launch ONLY after r4c completes — one
# relay client at a time. Same DONE markers; safe to re-run/resume.
set -u
cd "$(dirname "$0")/.."

SETTLE=45
LOG=outputs/campaign_r4d.log
mkdir -p outputs/r4_eval outputs/r4_checks

mark() { echo "=== $* $(date -u +%H:%M:%S) elapsed=${SECONDS}s ===" >> "${LOG}"; }

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
    || { mark "train ${name} FAILED"; return 1; }
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

# --- flagship evals r4c's budget gate skipped ----------------------------
# No-ops if r4c already ran them (same tags/markers).
run_eval fill600_tta8 configs/experiments/eval_fill512.yaml \
    outputs/r4_skip_fill/checkpoints --tta 8

# --- wide 2048-tile protocol re-anchor (VERDICT r3 weak #3) --------------
run_eval fill600_wide configs/experiments/eval_wide_fill2048.yaml \
    outputs/r4_skip_fill/checkpoints
run_eval fill600_wide_tta8 configs/experiments/eval_wide_fill2048.yaml \
    outputs/r4_skip_fill/checkpoints --tta 8
mark "r4d wide re-anchor complete"

# --- quality-vs-noise sweep (VERDICT r3 missing #3) ----------------------
for lvl in low medium high; do
  if run_train "sweep_${lvl}" "configs/experiments/sweep_${lvl}_fill.yaml"; then
    run_eval "sweep_${lvl}" "configs/experiments/sweep_${lvl}_fill.yaml" \
        "outputs/r4_sweep_${lvl}/checkpoints"
  fi
done
mark "r4d sweep complete"

# --- two-stage recipe on the flagship arch (VERDICT r3 #7) ---------------
if run_train stage_a_fill configs/experiments/stage_a_skipfill.yaml; then
  if [ ! -f outputs/r4_stage_b_fill/TRAIN_DONE ]; then
    mkdir -p outputs/r4_stage_b_fill
    # ADVICE r4 #2: resume partial stage-B checkpoints instead of
    # discarding them with a fresh --init-from graft.
    if [ -n "$(ls -A outputs/r4_stage_b_fill/checkpoints 2>/dev/null)" ]; then
      src_args="--resume --checkpoint outputs/r4_stage_b_fill/checkpoints"
      mark "train stage_b_fill (resume)"
    else
      src_args="--init-from outputs/r4_stage_a_fill/checkpoints"
      mark "train stage_b_fill (init-from stage_a_fill)"
    fi
    python scripts/train.py --config configs/experiments/stage_b_skipfill.yaml \
        --synthetic --output-dir outputs/r4_stage_b_fill \
        ${src_args} \
        >outputs/r4_stage_b_fill/train.log 2>&1 \
      && touch outputs/r4_stage_b_fill/TRAIN_DONE \
      || mark "train stage_b_fill FAILED"
    sleep ${SETTLE}
  fi
  run_eval stage_a_fill configs/experiments/stage_a_skipfill.yaml \
      outputs/r4_stage_a_fill/checkpoints
  [ -f outputs/r4_stage_b_fill/TRAIN_DONE ] && \
    run_eval stage_b_fill configs/experiments/stage_b_skipfill.yaml \
        outputs/r4_stage_b_fill/checkpoints
fi
mark "r4d campaign complete"
