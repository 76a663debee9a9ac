#!/usr/bin/env bash
# Round-4 phase 1: the two TPU items that need no new code —
#
#   1. fastpath A/B re-run (VERDICT weak #2): one interleaved session,
#      b in {1,2,4,8} twice (second pass reuses cached executables), 200
#      pipelined iters — settles whether optimize="auto" should still
#      pick the fastpath at small batch (r3 bench said apply 1.24 ms vs
#      fastpath 1.368 at b=1, contradicting the shipped threshold).
#   2. skip_ext3 — resume the 43.1-dB skip arm 2400 -> 3600 (VERDICT
#      next #2: still +0.14 dB/100 ep at the 2400 cutoff), then score it
#      on the 512 protocol plain + TTA-8.
#
# Relay hygiene per memory/axon-relay-client-serialization: one client
# at a time, 75 s settle between phases.
set -u
cd "$(dirname "$0")/.."

SETTLE=75
LOG=outputs/campaign.log
mkdir -p outputs/r4_checks outputs/r4_eval

# --- 1. fastpath A/B ---
if [ ! -f outputs/r4_checks/fastpath_ab.done ]; then
  echo "=== r4p1 fastpath_ab $(date -u +%H:%M:%S) ===" >> "${LOG}"
  python benchmarks/fastpath_ab.py --batches 1,2,4,8,1,2,4,8 --iters 200 \
      > outputs/r4_checks/fastpath_ab.log 2>&1 \
    && touch outputs/r4_checks/fastpath_ab.done \
    || echo "=== r4p1 fastpath_ab FAILED ===" >> "${LOG}"
  sleep ${SETTLE}
fi

# --- 2. skip horizon 2400 -> 3600 ---
out=outputs/r4_skip_ext3
if [ ! -f "${out}/TRAIN_DONE" ]; then
  mkdir -p "${out}"
  ckpt=outputs/r3_skip_ext2/checkpoints
  if [ -n "$(ls -A "${out}/checkpoints" 2>/dev/null)" ]; then
    ckpt="${out}/checkpoints"
  fi
  echo "=== r4p1 skip_ext3: training 2400->3600 (from ${ckpt}) $(date -u +%H:%M:%S) ===" >> "${LOG}"
  python scripts/train.py --config configs/experiments/long_skip.yaml \
      --synthetic --output-dir "${out}" --epochs 3600 \
      --resume --checkpoint "${ckpt}" >"${out}/train.log" 2>&1 \
    && touch "${out}/TRAIN_DONE" \
    || echo "=== r4p1 skip_ext3: TRAIN FAILED ===" >> "${LOG}"
  sleep ${SETTLE}
fi

for tag in skip_ext3_512 skip_ext3_tta8; do
  e=outputs/r4_eval/${tag}
  [ -f "${e}/DONE" ] && continue
  mkdir -p "${e}"
  extra=""
  [ "${tag}" = "skip_ext3_tta8" ] && extra="--tta 8"
  echo "=== r4p1 eval ${tag} $(date -u +%H:%M:%S) ===" >> "${LOG}"
  python scripts/evaluate.py --config configs/experiments/long_skip.yaml \
      --synthetic --checkpoint "${out}/checkpoints" \
      --output-dir "${e}" ${extra} >"${e}/eval.log" 2>&1 && touch "${e}/DONE"
  echo "=== r4p1 eval ${tag}: rc=$? ===" >> "${LOG}"
  sleep ${SETTLE}
done

echo "=== r4 phase1 complete $(date -u +%H:%M:%S) ===" >> "${LOG}"
