#!/usr/bin/env bash
# Round-3 phase 8: refresh benchmarks/results.json on the real chip.
# Row 5 (scene) gained the streamed path and row 2 (eval) the hybrid
# forward since results.json was last generated; re-run the whole suite
# so the committed numbers match the shipped code. Serialized behind
# phase 6 (one relay client at a time).
set -u
cd "$(dirname "$0")/.."

SETTLE=75
LOG=outputs/campaign.log

while ! grep -q "phase6 complete" "${LOG}"; do sleep 60; done
sleep ${SETTLE}

if [ ! -f outputs/r3_checks/benchsuite.DONE ]; then
  echo "=== benchsuite: run_benchmarks $(date -u +%H:%M:%S) ===" >> "${LOG}"
  python benchmarks/run_benchmarks.py >outputs/r3_checks/benchsuite.log 2>&1 \
    && touch outputs/r3_checks/benchsuite.DONE
  echo "=== benchsuite: rc=$? ===" >> "${LOG}"
  sleep ${SETTLE}
fi

echo "=== phase8 complete $(date -u +%H:%M:%S) ===" >> "${LOG}"
