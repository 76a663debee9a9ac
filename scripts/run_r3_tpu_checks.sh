#!/usr/bin/env bash
# Round-3 post-campaign TPU checks, serialized behind phase 2
# (one relay client at a time, settle gaps; see run_r3_campaign.sh):
#   1. driver entry point (single-chip flagship forward)
#   2. headline bench
#   3. unet_skip optimized-graph A/B (cost of the r3 quality winner)
#   4. Mosaic any_dma toolchain gate re-probe (VERDICT r2 item 7)
set -u
cd "$(dirname "$0")/.."

SETTLE=75
LOG=outputs/campaign.log
OUT=outputs/r3_checks
mkdir -p "${OUT}"

while ! grep -q "phase2 complete" "${LOG}"; do sleep 60; done
sleep ${SETTLE}

run_check() {  # name cmd...
  local name="$1"; shift
  if [ -f "${OUT}/${name}.DONE" ]; then
    echo "=== check ${name}: already done ===" >> "${LOG}"; return 0
  fi
  echo "=== check ${name} $(date -u +%H:%M:%S) ===" >> "${LOG}"
  "$@" >"${OUT}/${name}.log" 2>&1 && touch "${OUT}/${name}.DONE"
  echo "=== check ${name}: rc=$? ===" >> "${LOG}"
  sleep ${SETTLE}
}

run_check entry    python __graft_entry__.py
run_check bench    python bench.py
run_check skip_ab  python benchmarks/fastpath_ab.py --batches 1,8,128 --arch unet_skip --iters 40
run_check any_dma  python benchmarks/pallas_probe.py any_dma

echo "=== tpu checks complete $(date -u +%H:%M:%S) ===" >> "${LOG}"
