#!/usr/bin/env bash
# Copy the small per-arm eval artifacts from the gitignored outputs/
# tree into a COMMITTED path. The build machine was reset between
# round-4 sessions and outputs/ (checkpoints + every eval artifact the
# judge verifies quality claims against) was deleted — committed copies
# make the claims durable. Run after any eval; commit the result.
set -u
cd "$(dirname "$0")/.."

dest=benchmarks/results/r4_eval
mkdir -p "${dest}"
n=0
for d in outputs/r4_eval/*/; do
  tag=$(basename "${d}")
  src="${d}evaluation_results.json"
  [ -f "${src}" ] || continue
  cp "${src}" "${dest}/${tag}.json"
  n=$((n + 1))
done
echo "collected ${n} eval artifacts into ${dest}/"
