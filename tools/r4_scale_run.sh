#!/bin/bash
# Round-4 at-scale run (VERDICT r3 #4/#6): deployment-scale training + val
# + detection QA on the MULTI-CLASS dataset — 52 scenes x 4 views drawn
# from the 11-class procedural inventory x 3 scale variants (33 objects;
# the reference's 118-mesh YCB factory analog).  The dataset is
# PRE-GENERATED on CPU (tools/train_at_scale.py --object-set procedural
# --datagen-only, staged at /tmp/s4g_scale_r4 — ~2.5 h on the 1-core
# host, so the TPU window never waits on it).  Run SOLO.
#
#   bash tools/r4_scale_run.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/s4g_scale_r4}
if [ ! -d "$OUT/merged_data" ]; then
    echo "no pre-generated data at $OUT — running datagen first (CPU, ~2.5h)"
    timeout 14000 python tools/train_at_scale.py --out "$OUT" \
        --object-set procedural --scenes 52 --val-scenes 4 --views 4 \
        --datagen-only || exit 1
fi
# 600 steps (as r3 planned): the parity-at-speed instrument needs a
# less-flat score field to stabilize top-K rankings.  Remove any STALE
# summary first so a failed run can never be mistaken for this round's
# evidence, and propagate the failure (tee/tail would swallow the rc).
rm -f "$OUT/scale_run.json"
set -o pipefail
timeout 3600 python tools/train_at_scale.py --out "$OUT" --skip-datagen \
    --object-set procedural --scenes 52 --val-scenes 4 --views 4 \
    --steps "${STEPS:-600}" --batch 4 2>&1 | tee "$OUT/train_log.txt" | tail -30
rc=$?
if [ $rc -ne 0 ] || [ ! -f "$OUT/scale_run.json" ]; then
    echo "AT-SCALE RUN FAILED (rc=$rc, scale_run.json missing)"
    exit 1
fi
echo "summary -> $OUT/scale_run.json ; stats -> $OUT/dataset_stats.json"
