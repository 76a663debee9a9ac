#!/usr/bin/env bash
# Round-5 conditional arm: SSIM-retuned fine-tune of the extended fill
# flagship (VERDICT r4 #1, "only if the extended arm still misses SSIM
# on the wide protocol"). Launch ONLY while no other relay client runs.
# Same DONE markers / per-step evidence collection as run_r5_campaign.sh.
set -u
cd "$(dirname "$0")/.."

SETTLE=45
LOG=outputs/campaign_r5.log
mkdir -p outputs/r4_eval benchmarks/results/r4_train

mark() { echo "=== $* $(date -u +%H:%M:%S) ===" >> "${LOG}"; }
collect() { bash scripts/collect_evidence.sh >> "${LOG}" 2>&1 || true; }

out=outputs/r4_skip_fill_loss_ft
if [ ! -f "${out}/TRAIN_DONE" ]; then
  mkdir -p "${out}"
  if [ -n "$(ls -A "${out}/checkpoints" 2>/dev/null)" ]; then
    src_args="--resume --checkpoint ${out}/checkpoints"
    mark "train skip_fill_loss_ft (resume)"
  else
    src_args="--init-from outputs/r4_skip_fill_ext/checkpoints"
    mark "train skip_fill_loss_ft (init-from skip_fill_ext)"
  fi
  python scripts/train.py --config configs/experiments/long_skip_fill_loss_ft.yaml \
      --synthetic --output-dir "${out}" ${src_args} \
      >"${out}/train.log" 2>&1 \
    && touch "${out}/TRAIN_DONE" \
    || mark "train skip_fill_loss_ft FAILED"
  cp "${out}/logs/training_history.json" \
     benchmarks/results/r4_train/skip_fill_loss_ft_history.json 2>/dev/null
  sleep ${SETTLE}
fi

run_eval() {  # tag cfg [extra args...]
  local tag="$1" cfg="$2"; shift 2
  local e="outputs/r4_eval/${tag}"
  [ -f "${e}/DONE" ] && return 0
  mkdir -p "${e}"
  mark "eval ${tag}"
  python scripts/evaluate.py --config "${cfg}" --synthetic \
      --checkpoint "${out}/checkpoints" --output-dir "${e}" "$@" \
      >"${e}/eval.log" 2>&1 && touch "${e}/DONE" \
    || { mark "eval ${tag} FAILED"; }
  collect
  sleep ${SETTLE}
}

if [ -f "${out}/TRAIN_DONE" ]; then
  run_eval fill_loss_ft_512 configs/experiments/eval_fill512.yaml
  run_eval fill_loss_ft_tta8 configs/experiments/eval_fill512.yaml --tta 8
  run_eval fill_loss_ft_wide configs/experiments/eval_wide_fill2048.yaml
  run_eval fill_loss_ft_wide_tta8 configs/experiments/eval_wide_fill2048.yaml --tta 8
fi
mark "r5 loss arm complete"
