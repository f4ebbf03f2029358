#!/bin/bash
# ONE command for the round-4 TPU window: measurement runbook -> multi-class
# at-scale run -> parity with the fresh checkpoint -> summary.  A/B default
# decisions still need a human read of $OUT/SUMMARY.md afterwards
# (docs/perf_roadmap.md), but every number is collected unattended.
#
#   bash tools/r4_window.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r4_measure}

# The r3 A/B matrix is unchanged (same flags; S4G_MLP_FUSE_MIN_ROWS=1 now
# also fuses the non-pooled FP/seg chains, with a _pooled scope variant) —
# reuse the r3 runbook (it bounds bench.py's internal deadlines itself).
bash tools/r3_measure_all.sh "$OUT"

# Multi-class at-scale run (VERDICT r3 #6), dataset pre-staged on CPU.
# Publish artifacts + run ckpt parity ONLY on a successful run — a stale
# /tmp survivor from a previous attempt must never become this round's
# evidence (r4_scale_run.sh deletes the old summary up front and exits
# nonzero on failure).
if bash tools/r4_scale_run.sh /tmp/s4g_scale_r4; then
    cp /tmp/s4g_scale_r4/scale_run.json docs/scale_run_r4.json
    [ -f /tmp/s4g_scale_r4/dataset_stats.json ] && \
        cp /tmp/s4g_scale_r4/dataset_stats.json docs/dataset_stats_r4.json
    SCALE_OK=1
else
    SCALE_OK=0
fi

# Parity AGAIN with the fresh 600-step multi-class checkpoint (VERDICT r3
# #4): the runbook's parity steps use whatever older checkpoint survives.
R4CKPT=/tmp/s4g_scale_r4/train_out
if [ "$SCALE_OK" = 1 ] && [ -d "$R4CKPT" ]; then
    timeout 1200 python tools/parity_at_speed.py compare "$R4CKPT" \
        > "$OUT/parity_compare_r4ckpt.log" 2>&1
    timeout 1200 python tools/parity_at_speed.py selfnoise "$R4CKPT" \
        > "$OUT/parity_noise_r4ckpt.log" 2>&1
    tail -1 "$OUT/parity_compare_r4ckpt.log" "$OUT/parity_noise_r4ckpt.log"
fi
python tools/r3_summarize.py "$OUT" | tee "$OUT/SUMMARY.md"
echo "WINDOW COMPLETE: read $OUT/SUMMARY.md, decide A/B defaults, update"
echo "BASELINE.md / divergences.md / perf_roadmap.md, run final solo bench."
