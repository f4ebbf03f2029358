#!/bin/bash
# Round-3 at-scale run (VERDICT r2 #8): deployment-scale training + val pass
# + detection QA, using the PRE-GENERATED dataset (tools/train_at_scale.py
# --datagen-only, staged at /tmp/s4g_scale_r3 so the TPU window skips the
# ~380 s CPU scene factory).  Run SOLO — nothing else on the chip.
#
#   bash tools/r3_scale_run.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/s4g_scale_r3}
if [ ! -d "$OUT/merged_data" ]; then
    echo "no pre-generated data at $OUT — running datagen first (CPU, ~380s)"
    timeout 900 python tools/train_at_scale.py --out "$OUT" --datagen-only \
        || exit 1
fi
# STEPS override: 600 default (vs 300 in round 2) — the parity-at-speed
# instrument needs a less-flat score field to stabilize top-K rankings.
timeout 2700 python tools/train_at_scale.py --out "$OUT" --skip-datagen \
    --steps "${STEPS:-600}" --batch 4 2>&1 | tee "$OUT/train_log.txt" | tail -30
echo "summary -> $OUT/scale_run.json"
