#!/usr/bin/env bash
# Round-5 campaign: execute the quality agenda VERDICT r4 ordered.
# Serialized (one relay client at a time), DONE-marker idempotent, and
# — new this round (VERDICT r4 #8 + ADVICE) — evidence is collected
# into the COMMITTED benchmarks/results/ tree after EVERY eval and
# train step, so a kill at any point leaves durable numbers for the
# steps that completed.
#
# Phases (strict order):
#   1. Flagship re-anchor: TTA-8 + wide-2048 (+wide TTA-8) evals of the
#      on-disk 600-ep fill checkpoint (VERDICT #1).
#   2. Fill horizon extension 600 -> 2400 + 512/TTA-8/wide/wide-TTA-8
#      evals (VERDICT #1).
#   3. Quality-vs-noise sweep low/medium/high + own-protocol evals
#      (VERDICT #3 — two rounds overdue).
#   4. Two-stage recipe: eval the trained stage_a_fill, train + eval
#      stage_b_fill (resume-aware, ADVICE #2) (VERDICT #4).
#   5. Flagship-arch mixed-domain generalist 240 ep + base/rich/mixed
#      512 evals (VERDICT #7).
# The conditional loss-retuned arm (long_skip_fill_loss) and the bench
# refresh are launched manually after reading phase-2 results.
set -u
cd "$(dirname "$0")/.."

SETTLE=45
LOG=outputs/campaign_r5.log
mkdir -p outputs/r4_eval outputs/r4_checks benchmarks/results/r4_train

mark() { echo "=== $* $(date -u +%H:%M:%S) elapsed=${SECONDS}s ===" >> "${LOG}"; }

collect() {  # durable evidence after every step (VERDICT r4 #8)
  bash scripts/collect_evidence.sh >> "${LOG}" 2>&1 || true
}

collect_train() {  # name — training history into the committed tree
  local src="outputs/r4_$1/logs/training_history.json"
  [ -f "${src}" ] && cp "${src}" "benchmarks/results/r4_train/$1_history.json"
  return 0
}

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
    || { mark "train ${name} FAILED"; collect_train "${name}"; sleep ${SETTLE}; return 1; }
  collect_train "${name}"
  sleep ${SETTLE}
}

run_eval() {  # tag cfg ckpt [extra args...]
  local tag="$1" cfg="$2" ckpt="$3"; shift 3
  local e="outputs/r4_eval/${tag}"
  [ -f "${e}/DONE" ] && return 0
  [ -n "$(ls -A "${ckpt}" 2>/dev/null)" ] \
    || { mark "skip eval ${tag} (no checkpoint at ${ckpt})"; return 1; }
  mkdir -p "${e}"
  mark "eval ${tag}"
  python scripts/evaluate.py --config "${cfg}" --synthetic \
      --checkpoint "${ckpt}" --output-dir "${e}" "$@" \
      >"${e}/eval.log" 2>&1 && touch "${e}/DONE" \
    || { mark "eval ${tag} FAILED"; sleep ${SETTLE}; collect; return 1; }
  collect
  sleep ${SETTLE}
}

# --- phase 1: flagship 600-ep re-anchor (ckpt already on disk) ---------
FLAG=outputs/r4_skip_fill/checkpoints
run_eval fill600_tta8 configs/experiments/eval_fill512.yaml "${FLAG}" --tta 8
run_eval fill600_wide configs/experiments/eval_wide_fill2048.yaml "${FLAG}"
run_eval fill600_wide_tta8 configs/experiments/eval_wide_fill2048.yaml \
    "${FLAG}" --tta 8
mark "r5 phase1 complete"

# --- phase 2: horizon extension 600 -> 2400 ----------------------------
out=outputs/r4_skip_fill_ext
if [ ! -f "${out}/TRAIN_DONE" ]; then
  mkdir -p "${out}"
  ckpt="${FLAG}"
  if [ -n "$(ls -A "${out}/checkpoints" 2>/dev/null)" ]; then
    ckpt="${out}/checkpoints"
  fi
  mark "train skip_fill_ext 600->2400 (from ${ckpt})"
  python scripts/train.py --config configs/experiments/long_skip_fill.yaml \
      --synthetic --output-dir "${out}" --epochs 2400 \
      --resume --checkpoint "${ckpt}" >"${out}/train.log" 2>&1 \
    && touch "${out}/TRAIN_DONE" \
    || mark "train skip_fill_ext FAILED"
  collect_train skip_fill_ext
  sleep ${SETTLE}
fi
if [ -f "${out}/TRAIN_DONE" ]; then
  run_eval fill_ext_512 configs/experiments/eval_fill512.yaml "${out}/checkpoints"
  run_eval fill_ext_tta8 configs/experiments/eval_fill512.yaml "${out}/checkpoints" --tta 8
  run_eval fill_ext_wide configs/experiments/eval_wide_fill2048.yaml "${out}/checkpoints"
  run_eval fill_ext_wide_tta8 configs/experiments/eval_wide_fill2048.yaml \
      "${out}/checkpoints" --tta 8
fi
mark "r5 phase2 complete"

# --- phase 3: quality-vs-noise sweep -----------------------------------
for lvl in low medium high; do
  if run_train "sweep_${lvl}" "configs/experiments/sweep_${lvl}_fill.yaml"; then
    run_eval "sweep_${lvl}" "configs/experiments/sweep_${lvl}_fill.yaml" \
        "outputs/r4_sweep_${lvl}/checkpoints"
  fi
done
mark "r5 phase3 complete"

# --- phase 4: two-stage recipe (stage_a_fill already trained) ----------
if [ -f outputs/r4_stage_a_fill/TRAIN_DONE ]; then
  run_eval stage_a_fill configs/experiments/stage_a_skipfill.yaml \
      outputs/r4_stage_a_fill/checkpoints
  bout=outputs/r4_stage_b_fill
  if [ ! -f "${bout}/TRAIN_DONE" ]; then
    mkdir -p "${bout}"
    # Resume-aware (ADVICE r4 #2): partial stage-B checkpoints resume;
    # only a fresh dir warm-starts from stage A.
    if [ -n "$(ls -A "${bout}/checkpoints" 2>/dev/null)" ]; then
      src_args="--resume --checkpoint ${bout}/checkpoints"
      mark "train stage_b_fill (resume)"
    else
      src_args="--init-from outputs/r4_stage_a_fill/checkpoints"
      mark "train stage_b_fill (init-from stage_a_fill)"
    fi
    python scripts/train.py --config configs/experiments/stage_b_skipfill.yaml \
        --synthetic --output-dir "${bout}" ${src_args} \
        >"${bout}/train.log" 2>&1 \
      && touch "${bout}/TRAIN_DONE" \
      || mark "train stage_b_fill FAILED"
    collect_train stage_b_fill
    sleep ${SETTLE}
  fi
  [ -f "${bout}/TRAIN_DONE" ] && \
    run_eval stage_b_fill configs/experiments/stage_b_skipfill.yaml \
        "${bout}/checkpoints"
fi
mark "r5 phase4 complete"

# --- phase 5: flagship-arch mixed-domain generalist --------------------
if run_train skip_fill_mixed configs/experiments/long_skip_fill_mixed.yaml; then
  MIX=outputs/r4_skip_fill_mixed/checkpoints
  run_eval fill_mixed_base512 configs/experiments/eval_fill512.yaml "${MIX}"
  run_eval fill_mixed_rich512 configs/experiments/eval_fill_rich512.yaml "${MIX}"
  run_eval fill_mixed_mix512 configs/experiments/eval_fill_mix512.yaml "${MIX}"
fi
mark "r5 phase5 complete"
mark "r5 campaign complete"
