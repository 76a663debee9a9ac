#!/usr/bin/env bash
# Round-3 tail (replaces phases 6/7/8 after the wall-clock recount):
# the round started 03:30 UTC (PROGRESS.jsonl wall_s), so ~12 h ends
# ~15:30 UTC — the queued 600/1200-epoch trainings cannot fit and would
# leave the relay contended when the driver runs bench.py at round end.
#
# This script waits for phase 5 (skip_mixed evals), then refreshes
# benchmarks/results.json on the real chip ONLY if it can finish with
# margin, and guarantees the relay is idle well before round end.
set -u
cd "$(dirname "$0")/.."

SETTLE=75
LOG=outputs/campaign.log
# Do not START the suite after this time...
START_CUTOFF=$(date -u -d "today 14:50" +%s)
# ...and hard-kill it at this time regardless.
END_CUTOFF=$(date -u -d "today 15:10" +%s)

while ! grep -q "phase5 complete" "${LOG}"; do sleep 30; done
sleep ${SETTLE}

now=$(date -u +%s)
if [ "${now}" -lt "${START_CUTOFF}" ] && [ ! -f outputs/r3_checks/benchsuite.DONE ]; then
  budget=$(( END_CUTOFF - now ))
  echo "=== benchsuite: run_benchmarks (budget ${budget}s) $(date -u +%H:%M:%S) ===" >> "${LOG}"
  timeout "${budget}" python benchmarks/run_benchmarks.py \
      >outputs/r3_checks/benchsuite.log 2>&1 \
    && touch outputs/r3_checks/benchsuite.DONE
  echo "=== benchsuite: rc=$? ===" >> "${LOG}"
else
  echo "=== benchsuite: SKIPPED (past cutoff or done) ===" >> "${LOG}"
fi

echo "=== tail complete $(date -u +%H:%M:%S) ===" >> "${LOG}"
