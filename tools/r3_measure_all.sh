#!/bin/bash
# Round-3 TPU measurement runbook: every number the round needs, collected
# SEQUENTIALLY (one process per variant, nothing else on the chip — the
# measurement discipline in BASELINE.md).  Run solo:
#
#   bash tools/r3_measure_all.sh [outdir]
#
# Each step is individually timed out; a hung tunnel fails the step, not
# the run.  Results land in $OUT/*.log plus a combined summary.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r3_measure}
mkdir -p "$OUT"

# Persistent compilation cache: a recycled host arrives with a cold XLA /
# remote-Mosaic cache and tunnel compiles run minutes per program (round 4
# measured 116 s for a trivial matmul, 27 s cached) — without this the
# A/B matrix recompiles the full pipeline 6x over.
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

# bench.py runs under its own supervisor (round 4): keep probe + child
# deadlines inside the per-step timeout so a hung tunnel yields the
# structured JSON error line, never an outer rc-124 kill.  Cold-cache
# compiles through the tunnel can eat 10+ minutes, hence the wide default;
# cached reruns finish in a couple of minutes.
export S4G_BACKEND_PROBE_DEADLINE=${S4G_BACKEND_PROBE_DEADLINE:-120}
export S4G_BENCH_DEADLINE=${S4G_BENCH_DEADLINE:-2400}
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

# DECISION-CRITICAL FIRST (a short tunnel window should still adjudicate
# the staged A/Bs): headline bench, then the A/B variants (env flags are
# read at module import — one process each).  The slab 3-NN now patches
# per-query instead of whole-call falling back, and the fused MLP-chain
# kernel faces a different fusion landscape now that stage-1 grouped xyz
# comes out of the ball-query kernel, not an XLA gather it used to fuse
# with.
step bench          $STEP_TMO python bench.py
step bench_noemit   $STEP_TMO env S4G_EMIT_REL=0 python bench.py
step bench_3nnslab  $STEP_TMO env S4G_3NN_SLAB=1 python bench.py
step bench_mlpfuse  $STEP_TMO env S4G_MLP_FUSE_MIN_ROWS=1 python bench.py
step bench_mlpfuse_pooled $STEP_TMO env S4G_MLP_FUSE_MIN_ROWS=1 S4G_MLP_FUSE_SCOPE=pooled python bench.py
step bench_both     $STEP_TMO env S4G_3NN_SLAB=1 S4G_MLP_FUSE_MIN_ROWS=1 python bench.py
# Attribution + batch points.
step trace_fwd      $STEP_TMO python tools/trace_forward.py --json "$OUT/trace_fwd.json"
step trace_detect   $STEP_TMO python tools/trace_forward.py --detect
step batch1         $STEP_TMO python tools/measure_batch.py 1
step batch2         $STEP_TMO python tools/measure_batch.py 2
step batch4         $STEP_TMO python tools/measure_batch.py 4
step batch8         $STEP_TMO python tools/measure_batch.py 8
step diag_3nn       $STEP_TMO env S4G_3NN_SLAB=1 python tools/diag_3nn_slab.py
step stream         $STEP_TMO python tools/measure_stream.py 50 2
# Trained weights when available (random-init rot6d vectors are near zero,
# so Gram-Schmidt amplifies bf16 noise into ~20deg deltas that say nothing
# about deployment parity; the r2 at-scale checkpoint survives in /tmp).
CKPT=""
[ -d /tmp/s4g_scale/train_out ] && CKPT=/tmp/s4g_scale/train_out
step parity_compare $STEP_TMO python tools/parity_at_speed.py compare $CKPT
step parity_noise   $STEP_TMO python tools/parity_at_speed.py selfnoise $CKPT
step parity_time    $STEP_TMO python tools/parity_at_speed.py time-parity
step trace_b2       $STEP_TMO python tools/trace_forward.py --batch 2 --json "$OUT/trace_b2.json"
step trace_diff_b2  60  python tools/trace_diff.py "$OUT/trace_fwd.json" "$OUT/trace_b2.json"
echo "ALL DONE -> $OUT" | tee -a "$OUT/summary.log"
