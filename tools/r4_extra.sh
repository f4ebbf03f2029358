#!/bin/bash
# Round-4 EXTRA A/Bs, run right after the r3 measurement matrix (the chain
# invokes this between the matrix and the at-scale run, so the chip stays
# solo).  Focus: the ~1.9 ms MLP/pool/head floor is HBM-bound between
# layers — S4G_CAST_ACTIVATIONS=1 keeps inter-layer activations bf16
# (halves that traffic) and was never in the r3 matrix.  Parity under the
# cast is measured too: a perf default is only adopted if the functional
# overlap stays at the self-noise floor (BASELINE.md parity discipline).
#
#   bash tools/r4_extra.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r4_measure}
mkdir -p "$OUT"

export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
export S4G_BACKEND_PROBE_DEADLINE=${S4G_BACKEND_PROBE_DEADLINE:-120}
export S4G_BENCH_DEADLINE=${S4G_BENCH_DEADLINE:-2400}
# The matrix's default bench reported emit_rel:false — the deadline-bounded
# compile probe failed.  Raise the probe budget here (a cold remote-Mosaic
# compile of the big emit kernel can exceed the 420 s default) and capture
# the probe's actual traceback first so a real kernel failure is visible.
export S4G_PALLAS_PROBE_DEADLINE=${S4G_PALLAS_PROBE_DEADLINE:-1200}
STEP_TMO=${STEP_TMO:-2700}

step() {  # step <name> <timeout-s> <cmd...>  (resumable: skips on $name.ok)
    local name=$1 tmo=$2; shift 2
    if [ -f "$OUT/$name.ok" ]; then
        echo "=== $name: SKIP (already done) ===" | tee -a "$OUT/summary.log"
        return
    fi
    echo "=== $name: $* ===" | tee -a "$OUT/summary.log"
    timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
    local rc=$?
    tail -3 "$OUT/$name.log" | tee -a "$OUT/summary.log"
    echo "--- $name exit=$rc" | tee -a "$OUT/summary.log"
    [ $rc -eq 0 ] && touch "$OUT/$name.ok"
}

# Emit-probe diagnosis: the exact snippet _select_routes() probes, run in
# the foreground so the traceback (or success) lands in the log.
step diag_emit $STEP_TMO python -c "
import jax, jax.numpy as jnp, numpy as np
from s4g_tpu.ops import neighbors
keys = jnp.linspace(0.0, 1.0, 25600, dtype=jnp.float32)
pts = jnp.stack([keys, keys * 0.5, keys * 0.25])[None]
cents = pts[:, :, ::5]
idx, cnt, rel = neighbors.ball_query_grouped(
    pts, cents, 0.02, 64, sorted_axis=0, centroids_sorted=True)
print('emit ok', float(np.asarray(rel.sum())) + float(np.asarray(idx.sum())))
"
# Re-run the default-config bench under the raised probe deadline: if the
# emit probe now passes, this is the real emit_rel-on headline the matrix
# missed (bench.ok exists, so the name must differ).
step bench_emit_retry $STEP_TMO python bench.py
step bench_cast      $STEP_TMO env S4G_CAST_ACTIVATIONS=1 python bench.py
step bench_cast_fuse $STEP_TMO env S4G_CAST_ACTIVATIONS=1 S4G_MLP_FUSE_MIN_ROWS=1 python bench.py
step bench_all       $STEP_TMO env S4G_CAST_ACTIVATIONS=1 S4G_MLP_FUSE_MIN_ROWS=1 S4G_3NN_SLAB=1 python bench.py
# Parity under the cast: same checkpoint convention as the matrix steps.
CKPT=""
[ -d /tmp/s4g_scale/train_out ] && CKPT=/tmp/s4g_scale/train_out
step parity_cast $STEP_TMO env S4G_CAST_ACTIVATIONS=1 python tools/parity_at_speed.py compare $CKPT
# Retry matrix steps that "completed" with a structured-failure line: the
# bench supervisor exits 0 by driver contract even when the child dies
# (e.g. a transient tunnel FailedPrecondition), so the .ok marker can pin
# a null result.  Drop those markers and resume the matrix once under the
# raised probe deadline.
RETRY=0
for okf in "$OUT"/*.ok; do
    name=$(basename "$okf" .ok)
    log="$OUT/$name.log"
    [ -f "$log" ] || continue
    if tail -1 "$log" | grep -q '"value": null'; then
        echo "[extra] $name ended with value:null — retrying" \
            | tee -a "$OUT/summary.log"
        rm -f "$okf"
        RETRY=1
    fi
done
if [ "$RETRY" = 1 ]; then
    bash tools/r3_measure_all.sh "$OUT"
fi
echo "EXTRA DONE -> $OUT" | tee -a "$OUT/summary.log"
