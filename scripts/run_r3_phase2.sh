#!/usr/bin/env bash
# Round-3 quality campaign, phase 2 (runs after run_r3_campaign.sh):
#
#   1. skip extension — resume r3_skip 600 -> 1200 epochs (curve was
#      still climbing +0.68 dB per 100 epochs at cutoff)
#   2. long_skip_data — unet_skip x 4096-tile recipe (data-scaling
#      retest now the token-bottleneck cap is lifted; DESIGN §10)
#   3. eval matrix — skip_ext own + TTA-8, skip_data on the 512
#      protocol, mixed checkpoint on base-512 / rich-512 / mixed-512
#
# Same relay rules as phase 1: ONE TPU client at a time, settle gaps,
# resumable markers. Waits for phase 1 via the eval DONE markers that
# run_r3_campaign.sh itself writes (its completion echo goes to stdout,
# which is only in outputs/campaign.log if the operator redirected it
# there — the grep is a fallback, not the contract).
set -u
cd "$(dirname "$0")/.."

SETTLE=75
LOG=outputs/campaign.log

phase1_done() {
  [ -f outputs/r3_skip/DONE ] && [ -f outputs/r3_base600/DONE ] \
    && [ -f outputs/r3_capacity/DONE ] && [ -f outputs/r3_mixed/DONE ] \
    && return 0
  grep -q "campaign complete" "${LOG}" 2>/dev/null
}

echo "=== phase2: waiting for phase-1 completion ===" >> "${LOG}"
while ! phase1_done; do sleep 60; done
sleep ${SETTLE}

run_train() {  # name cfg extra-args...
  local name="$1" cfg="$2"; shift 2
  local out="outputs/r3_${name}"
  if [ -f "${out}/TRAIN_DONE" ]; then
    echo "=== ${name}: train already done ===" >> "${LOG}"; return 0
  fi
  mkdir -p "${out}"
  echo "=== ${name}: training (${cfg}) $(date -u +%H:%M:%S) ===" >> "${LOG}"
  python scripts/train.py --config "${cfg}" --synthetic \
      --output-dir "${out}" "$@" >"${out}/train.log" 2>&1
  local rc=$?
  if [ ${rc} -ne 0 ]; then
    echo "=== ${name}: TRAIN FAILED rc=${rc} ===" >> "${LOG}"
  else
    touch "${out}/TRAIN_DONE"
  fi
  sleep ${SETTLE}
  return ${rc}
}

run_eval() {  # tag cfg ckpt extra-args...
  local tag="$1" cfg="$2" ckpt="$3"; shift 3
  local out="outputs/r3_eval/${tag}"
  if [ -f "${out}/DONE" ]; then
    echo "=== eval ${tag}: already done ===" >> "${LOG}"; return 0
  fi
  mkdir -p "${out}"
  echo "=== eval ${tag} (${cfg}) $(date -u +%H:%M:%S) ===" >> "${LOG}"
  python scripts/evaluate.py --config "${cfg}" --synthetic \
      --checkpoint "${ckpt}" --output-dir "${out}" "$@" \
      >"${out}/eval.log" 2>&1 && touch "${out}/DONE"
  echo "=== eval ${tag}: rc=$? ===" >> "${LOG}"
  sleep ${SETTLE}
}

# --- trainings ---
if [ -f outputs/r3_skip/TRAIN_DONE ]; then
  run_train skip_ext configs/experiments/long_skip.yaml \
      --epochs 1200 --resume --checkpoint outputs/r3_skip/checkpoints
fi
run_train skip_data configs/experiments/long_skip_data.yaml

# --- eval matrix ---
run_eval skip_ext_512  configs/experiments/long_skip.yaml outputs/r3_skip_ext/checkpoints
run_eval skip_ext_tta8 configs/experiments/long_skip.yaml outputs/r3_skip_ext/checkpoints --tta 8
run_eval skip_data_512 configs/experiments/eval_skip512.yaml outputs/r3_skip_data/checkpoints
run_eval mixed_base512 configs/base.yaml outputs/r3_mixed/checkpoints
run_eval mixed_rich512 configs/experiments/long_rich.yaml outputs/r3_mixed/checkpoints
run_eval mixed_mix512  configs/experiments/eval_mixed512.yaml outputs/r3_mixed/checkpoints

echo "=== phase2 complete $(date -u +%H:%M:%S) ===" >> "${LOG}"
