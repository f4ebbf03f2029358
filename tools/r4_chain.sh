#!/bin/bash
# Round-4 window tail, detachable: waits for (a) the measurement matrix
# (tools/r3_measure_all.sh) to finish and (b) the pre-generated multi-class
# dataset, then runs the at-scale train + fresh-checkpoint parity + summary
# (the r4_window.sh steps after the matrix).  Exists so the TPU-window
# sequencing survives a supervisor/session crash: launch it detached once,
# and the round's evidence lands unattended.
#
#   setsid nohup bash tools/r4_chain.sh /tmp/r4_measure /tmp/s4g_scale_r4 &
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r4_measure}
DATA=${2:-/tmp/s4g_scale_r4}
DATAGEN_PID_FILE=${3:-/tmp/datagen_r4.pid}

echo "[chain] waiting for measurement matrix in $OUT"
while ! grep -q "ALL DONE" "$OUT/summary.log" 2>/dev/null; do
    # If the matrix process died mid-run, resume it (steps are .ok-marked).
    if ! ps aux | grep "[r]3_measure_all.sh" >/dev/null; then
        echo "[chain] matrix not running — resuming r3_measure_all.sh"
        bash tools/r3_measure_all.sh "$OUT" >> /tmp/r4_measure_outer.log 2>&1
    fi
    sleep 60
done
echo "[chain] matrix done"

# Round-4 extra A/Bs (bf16 activation cast + combinations + parity under
# the cast) — runs while the chip is still solo, before the at-scale
# train grabs it.  Resumable like the matrix (.ok markers in $OUT).
bash tools/r4_extra.sh "$OUT"

echo "[chain] waiting for dataset at $DATA/merged_data"
while kill -0 "$(cat "$DATAGEN_PID_FILE" 2>/dev/null)" 2>/dev/null; do
    sleep 60
done
if [ ! -d "$DATA/merged_data" ]; then
    echo "[chain] FATAL: datagen exited without $DATA/merged_data"
    tail -20 /tmp/datagen_r4.log
    exit 1
fi
echo "[chain] dataset ready"

# At-scale run on the (now solo) TPU; publish artifacts only on success.
if bash tools/r4_scale_run.sh "$DATA"; then
    cp "$DATA/scale_run.json" docs/scale_run_r4.json
    [ -f "$DATA/dataset_stats.json" ] && \
        cp "$DATA/dataset_stats.json" docs/dataset_stats_r4.json
    SCALE_OK=1
else
    SCALE_OK=0
fi

R4CKPT=$DATA/train_out
if [ "$SCALE_OK" = 1 ] && [ -d "$R4CKPT" ]; then
    timeout 1200 python tools/parity_at_speed.py compare "$R4CKPT" \
        > "$OUT/parity_compare_r4ckpt.log" 2>&1
    timeout 1200 python tools/parity_at_speed.py selfnoise "$R4CKPT" \
        > "$OUT/parity_noise_r4ckpt.log" 2>&1
    tail -1 "$OUT/parity_compare_r4ckpt.log" "$OUT/parity_noise_r4ckpt.log"
fi
python tools/r3_summarize.py "$OUT" | tee "$OUT/SUMMARY.md"
echo "[chain] WINDOW COMPLETE -> $OUT/SUMMARY.md"
