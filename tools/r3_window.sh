#!/bin/bash
# ONE command for the round-3 TPU window: full measurement runbook ->
# summary -> at-scale train/val/QA run.  A/B default decisions still need
# a human read of $OUT/SUMMARY.md afterwards (docs/perf_roadmap.md "Next
# TPU window" steps 2-3), but every number is collected unattended.
#
#   bash tools/r3_window.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r3_measure}

bash tools/r3_measure_all.sh "$OUT"
python tools/r3_summarize.py "$OUT" | tee "$OUT/SUMMARY.md"
bash tools/r3_scale_run.sh
echo "WINDOW COMPLETE: read $OUT/SUMMARY.md, decide A/B defaults, update"
echo "BASELINE.md / divergences.md / perf_roadmap.md, run final solo bench."
