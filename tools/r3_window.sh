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
bash tools/r3_scale_run.sh
# Parity AGAIN with the fresh 600-step checkpoint — the runbook's parity
# steps use the stale r2 checkpoint (or random init on a fresh host), and
# the 600-step run exists partly to stabilize these rankings (BASELINE.md
# "Parity at speed").
R3CKPT=/tmp/s4g_scale_r3/train_out
if [ -d "$R3CKPT" ]; then
    timeout 1200 python tools/parity_at_speed.py compare "$R3CKPT" \
        > "$OUT/parity_compare_r3ckpt.log" 2>&1
    timeout 1200 python tools/parity_at_speed.py selfnoise "$R3CKPT" \
        > "$OUT/parity_noise_r3ckpt.log" 2>&1
    tail -1 "$OUT/parity_compare_r3ckpt.log" "$OUT/parity_noise_r3ckpt.log"
fi
python tools/r3_summarize.py "$OUT" | tee "$OUT/SUMMARY.md"
echo "WINDOW COMPLETE: read $OUT/SUMMARY.md, decide A/B defaults, update"
echo "BASELINE.md / divergences.md / perf_roadmap.md, run final solo bench."
