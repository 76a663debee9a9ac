#!/usr/bin/env bash
# Round-4c campaign: the ~1 h wall-clock cut of run_r4b_campaign.sh.
# Same DONE-marker idempotence and one-client-at-a-time relay hygiene,
# but every optional step is gated on a time budget so the TPU is free
# for the driver's end-of-round bench. Priorities (VERDICT r3):
#   1. Flagship evidence regen: skip_fill 600 ep + 512 / TTA-8 / wide
#      evals (the machine reset deleted every round-4 artifact).
#   2. Quality-vs-noise sweep (VERDICT missing #3) on the flagship arch.
#   3. Two-stage recipe pair (VERDICT #7) — only if time remains.
#   4. Committed bench refresh (quality row needs the phase-1 ckpt).
set -u
cd "$(dirname "$0")/.."

SETTLE=45
BUDGET=${BUDGET:-3000}       # stop starting optional steps after ~50 min
LOG=outputs/campaign_r4c.log
mkdir -p outputs/r4_eval outputs/r4_checks

mark() { echo "=== $* $(date -u +%H:%M:%S) elapsed=${SECONDS}s ===" >> "${LOG}"; }
have_time() { [ $(( SECONDS + $1 )) -lt ${BUDGET} ]; }

run_train() {  # name cfg est_seconds [extra args...]
  local name="$1" cfg="$2" est="$3"; shift 3
  local out="outputs/r4_${name}"
  [ -f "${out}/TRAIN_DONE" ] && return 0
  have_time "${est}" || { mark "skip train ${name} (budget)"; return 1; }
  mkdir -p "${out}"
  local extra=""
  if [ -n "$(ls -A "${out}/checkpoints" 2>/dev/null)" ]; then
    extra="--resume --checkpoint ${out}/checkpoints"
  fi
  mark "train ${name}"
  python scripts/train.py --config "${cfg}" --synthetic \
      --output-dir "${out}" ${extra} "$@" >"${out}/train.log" 2>&1 \
    && touch "${out}/TRAIN_DONE" \
    || { mark "train ${name} FAILED"; sleep ${SETTLE}; return 1; }
  sleep ${SETTLE}
}

run_eval() {  # tag cfg ckpt est_seconds [extra args...]
  local tag="$1" cfg="$2" ckpt="$3" est="$4"; shift 4
  local e="outputs/r4_eval/${tag}"
  [ -f "${e}/DONE" ] && return 0
  have_time "${est}" || { mark "skip eval ${tag} (budget)"; return 1; }
  # ADVICE r4 #1: don't burn eval startup + settle against a checkpoint
  # that was never produced (train skipped on budget or failed).
  [ -n "$(ls -A "${ckpt}" 2>/dev/null)" ] \
    || { mark "skip eval ${tag} (no checkpoint at ${ckpt})"; return 1; }
  mkdir -p "${e}"
  mark "eval ${tag}"
  python scripts/evaluate.py --config "${cfg}" --synthetic \
      --checkpoint "${ckpt}" --output-dir "${e}" "$@" \
      >"${e}/eval.log" 2>&1 && touch "${e}/DONE" \
    || mark "eval ${tag} FAILED"
  sleep ${SETTLE}
}

# --- phase 1: flagship 600 ep + evidence -------------------------------
run_train skip_fill configs/experiments/long_skip_fill.yaml 1500
run_eval fill600_512 configs/experiments/eval_fill512.yaml \
    outputs/r4_skip_fill/checkpoints 240
run_eval fill600_tta8 configs/experiments/eval_fill512.yaml \
    outputs/r4_skip_fill/checkpoints 420 --tta 8
run_eval fill600_wide configs/experiments/eval_wide_fill2048.yaml \
    outputs/r4_skip_fill/checkpoints 420
mark "r4c phase1 complete"

# --- phase 2: quality-vs-noise sweep (VERDICT missing #3) ---------------
for lvl in low medium high; do
  if run_train "sweep_${lvl}" "configs/experiments/sweep_${lvl}_fill.yaml" 420; then
    run_eval "sweep_${lvl}" "configs/experiments/sweep_${lvl}_fill.yaml" \
        "outputs/r4_sweep_${lvl}/checkpoints" 240
  fi
done
mark "r4c phase2 complete"

# --- phase 3: two-stage recipe on the flagship arch (VERDICT #7) --------
if run_train stage_a_fill configs/experiments/stage_a_skipfill.yaml 360; then
  if [ ! -f outputs/r4_stage_b_fill/TRAIN_DONE ] && have_time 420; then
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
      outputs/r4_stage_a_fill/checkpoints 240
  [ -f outputs/r4_stage_b_fill/TRAIN_DONE ] && \
    run_eval stage_b_fill configs/experiments/stage_b_skipfill.yaml \
        outputs/r4_stage_b_fill/checkpoints 240
fi
mark "r4c phase3 complete"

# --- phase 4: committed bench refresh (always; quality row uses ckpt) ---
if [ ! -f outputs/r4_checks/bench_refresh.done ]; then
  mark "bench refresh"
  python benchmarks/run_benchmarks.py > outputs/r4_checks/bench_refresh.log 2>&1 \
    && touch outputs/r4_checks/bench_refresh.done \
    || mark "bench refresh FAILED"
fi
mark "r4c campaign complete"
