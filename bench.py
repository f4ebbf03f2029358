"""Benchmark: scenes/sec/chip for single-view grasp inference.

Measures the reference's headline points (SURVEY.md §6 / BASELINE.md):
model-forward latency and the fused end-to-end detect pipeline (forward +
post-processing + collision filtering) with 25,600 points per scene, on
the attached TPU chip.  The headline value is the best honest serving
configuration — batch 2 beats batch 1 (VERDICT r4 #6); batch-1 numbers
stay in detail.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.

Infra contract (VERDICT r3 #1/#2): every step that can touch the axon
tunnel runs under a hard wall-clock deadline.  The measurement itself runs
in a supervised child process; if the backend is unreachable or the child
exceeds its deadline, the supervisor prints a structured JSON line with
"value": null and an "error" field within bounded time — never rc 124.
The child emits a PARTIAL line after each completed stage so a mid-bench
hang still surfaces everything measured up to that point.

vs_baseline uses BASELINE.md's reference anchor: the reference publishes no
numbers, so we anchor on an H100 estimate for the same PointNet++ forward
(~10 ms/scene => 100 scenes/sec; the driver's north star is 4x that).
vs_baseline = measured_scenes_per_sec / 100.0 (>4.0 meets the target).

Timing methodology (chained-dispatch slope): each timed program runs N
iterations of the workload inside ONE jitted lax.fori_loop whose carry
feeds back into the inputs, and the per-iteration device time is the slope
(t(N_hi) - t(N_lo)) / (N_hi - N_lo) — dispatch and tunnel constants cancel
exactly.  The feedback uses a *1e-45 scale (adds exactly 0 after f32
rounding) rather than *0.0: XLA constant-folds 0.0*x under
--xla_allow_excess_precision and then dead-code-eliminates the loop body,
which silently turned earlier benchmarks into no-ops.

Cross-validated against jax.profiler device traces (tools/trace_forward.py
sums per-op device time from the Chrome trace): solo slope runs and traces
agree to ~1% on the model forward (9.63 ms at deployment scale), closing
VERDICT r1 weak #5.  Slope numbers are only valid with NOTHING else using
the TPU — a concurrent process inflates both endpoints non-uniformly.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REF_SCENES_PER_SEC = 100.0  # documented H100-estimate anchor (BASELINE.md)
MODEL_GMACS = 110.0         # PN2_CLS forward at 25,600 pts (BASELINE.md)
V5E_PEAK_BF16_TFLOPS = 394.0

METRIC = ("scenes/sec/chip single-view grasp inference "
          "(e2e fwd+postproc+collision, 25600 pts, best serving batch)")


def _error_result(error, detail=None):
    return {"metric": METRIC, "value": None, "unit": "scenes/sec",
            "vs_baseline": None, "error": error, "detail": detail or {}}


def slope_time(fn, args, lo=10, hi=60, reps=3):
    """Per-call device seconds via chained-dispatch slope timing."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def make(n):
        @jax.jit
        def run(*a):
            def body(i, acc):
                eps = acc * 1e-45          # == +0.0 after rounding, unfoldable
                pert = [x + eps if jnp.issubdtype(x.dtype, jnp.floating)
                        else x for x in a]
                out = fn(*pert)
                s = sum(jnp.sum(leaf).astype(jnp.float32)
                        for leaf in jax.tree.leaves(out))
                return acc + s * 1e-45 + 1.0
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        return run

    run_lo, run_hi = make(lo), make(hi)
    float(run_lo(*args))
    float(run_hi(*args))
    best = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run_lo(*args))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run_hi(*args))
        t_hi = time.perf_counter() - t0
        best.append((t_hi - t_lo) / (hi - lo))
    return min(best)


def _select_routes():
    """Probe the Pallas builds in deadline-bounded subprocesses; fall back
    to proven paths when a kernel fails to compile OR the remote Mosaic
    helper hangs (a mid-session failure mode documented in BASELINE.md —
    an in-process probe would hang the whole bench, VERDICT r3 weak #2)."""
    import jax
    from s4g_tpu.ops import sampling
    from s4g_tpu.runtime import guard

    if jax.default_backend() != "tpu":
        return
    probe_s = float(os.environ.get("S4G_PALLAS_PROBE_DEADLINE", 420))
    if not guard.pallas_fps_compiles(timeout_s=probe_s):
        sampling.set_default_fps_impl("xla")


def _bench_child():
    """The actual measurement; prints PARTIAL lines then a RESULT line."""
    import jax
    import jax.numpy as jnp

    _select_routes()

    from s4g_tpu.configs.config import load_cfg_from_file
    from s4g_tpu.models import build_model
    from s4g_tpu.ops import sampling as _sampling_mod
    from s4g_tpu.ops.neighbors import ball_query, three_nn
    from s4g_tpu.ops.sampling import farthest_point_sample
    from s4g_tpu.pipeline.postprocessing import post_process_predictions
    from s4g_tpu.pipeline.collision import batch_view_non_collision
    from s4g_tpu.utils.math_utils import batch_transformation_inv

    detail = {
        "timing": "chained-dispatch slope (dispatch/tunnel cancels)",
        "backend": jax.default_backend(),
        # Active kernel routes after the compile probes — if a staged
        # Pallas path failed to compile, the fallback is visible here
        # rather than silently shaping the headline.
        "fps_impl": _sampling_mod.resolved_fps_impl(),
    }

    def partial():
        print("PARTIAL " + json.dumps(detail), flush=True)

    # Emit the resolved routes BEFORE the first (longest) measurement so a
    # hang there still surfaces which kernel routes were active.
    partial()

    cfg = load_cfg_from_file("s4g_tpu/configs/curvature_model.yaml")
    net, _, _ = build_model(cfg)
    rng = np.random.RandomState(0)

    # Use the bundled real scene when available for realistic geometry.
    try:
        scene = np.load("/root/reference/inference/2638_view_0.p",
                        allow_pickle=True)
        cloud = scene["point_cloud"].astype(np.float32)  # (3, n)
        sel = rng.choice(cloud.shape[1], 25600,
                         replace=cloud.shape[1] < 25600)
        points = cloud[:, sel]
    except Exception:
        points = (rng.rand(3, 25600) * 0.6 - 0.3).astype(np.float32)
        points[2] += 1.0

    pts = jnp.asarray(points)
    batch = {"scene_points": pts[None]}
    variables = jax.jit(
        lambda k, b: net.init(k, b, train=False))(jax.random.key(0), batch)

    fwd = lambda p: net.apply(variables, {"scene_points": p}, train=False)
    fwd_t = slope_time(fwd, (pts[None],))
    detail["model_forward_ms"] = round(fwd_t * 1000, 2)
    detail["model_mfu_pct"] = round(
        (MODEL_GMACS * 2e9 / fwd_t) / (V5E_PEAK_BF16_TFLOPS * 1e12) * 100, 1)
    partial()

    # Fused detect pipeline: forward + post-process + collision (batch 1).
    def detect(p):
        preds = net.apply(variables, {"scene_points": p[None]}, train=False)
        post = post_process_predictions(
            p, preds["score"][0], preds["frame_R"][0], preds["frame_t"][0],
            0.3, -1.0, num_candidates=1024)
        g2l = batch_transformation_inv(post.poses)
        ok = batch_view_non_collision(g2l, p.T)
        return post.poses.sum() + post.scores.sum() + (post.valid & ok).sum()

    det_t = slope_time(detect, (pts,))
    detail["detect_e2e_ms"] = round(det_t * 1000, 2)
    partial()

    # Per-stage hot-op breakdown at deployment shapes (same slope method).
    c1 = jnp.take_along_axis(
        pts[None], farthest_point_sample(pts[None], 5120)[:, None, :]
        .repeat(3, 1), axis=2)
    fps_t = slope_time(lambda p: farthest_point_sample(p, 5120), (pts[None],))
    detail["stage1_fps_ms"] = round(fps_t * 1000, 2)
    bq_t = slope_time(lambda p, c: ball_query(p, c, 0.02, 64),
                      (pts[None], c1))
    detail["stage1_ball_query_ms"] = round(bq_t * 1000, 2)
    nn_t = slope_time(lambda q, k: three_nn(q, k), (pts[None], c1))
    detail["stage1_three_nn_ms"] = round(nn_t * 1000, 2)
    partial()

    scenes_per_sec = 1.0 / det_t
    result = {
        "metric": METRIC,
        "value": round(scenes_per_sec, 2),
        "unit": "scenes/sec",
        "vs_baseline": round(scenes_per_sec / REF_SCENES_PER_SEC, 3),
        "detail": detail,
    }
    print("RESULT " + json.dumps(result), flush=True)


def _measure_batch_points(result, deadline_each):
    """Batch serving points, ONE child process per batch size (one-process
    multi-variant slope A/Bs measured impossible numbers in round 2 —
    BASELINE.md methodology).  The best point becomes the headline value;
    batch 1 moves into detail.  Default sweeps ONLY b=2 (the measured best
    point; b=4/8 regress and each point costs a compiled child process —
    the full table lives in docs/perf_roadmap.md).  Override with
    S4G_BENCH_BATCH_POINTS="2,4,8" for a full sweep."""
    points = os.environ.get("S4G_BENCH_BATCH_POINTS", "2")
    if not points.strip():
        return
    # A/B variant runs (kernel-route env overrides active) measure only the
    # batch-1 points: the batch sweep belongs to the default-config bench.
    if any(k in os.environ for k in (
            "S4G_MLP_FUSE_MIN_ROWS",
            "S4G_MLP_FUSE_SCOPE", "S4G_MLP_IMPL", "S4G_FPS_IMPL",
            "S4G_FPS_GROUP", "S4G_BQ_IMPL", "S4G_BQ_SLAB_IMPL",
            "S4G_3NN_IMPL", "S4G_CAST_ACTIVATIONS")):
        return
    here = os.path.dirname(os.path.abspath(__file__))
    batches = {}
    for b in points.split(","):
        b = b.strip()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.join(here, "tools", "measure_batch.py"),
                 b],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                cwd=here, timeout=deadline_each)
            line = [l for l in proc.stdout.splitlines()
                    if l.startswith("{")][-1]
            rec = json.loads(line)
            batches[int(b)] = {
                "e2e_ms_per_scene": rec["e2e_ms_per_scene"],
                "scenes_per_sec": rec["scenes_per_sec"],
            }
        except Exception:
            continue
    if not batches:
        return
    result.setdefault("detail", {})["batch_points"] = batches
    best_b = max(batches, key=lambda b: batches[b]["scenes_per_sec"])
    best = batches[best_b]["scenes_per_sec"]
    result["detail"]["best_batch"] = best_b
    result["detail"]["best_batch_scenes_per_sec"] = best
    # Headline = the best honest serving configuration (VERDICT r4 #6):
    # batch 2 amortizes the fixed postproc/head floor and beats batch 1
    # (176.3 vs 160.9 measured in round 4).  Batch 1 stays in detail.
    if result.get("value") is not None and best > result["value"]:
        result["detail"]["batch1_scenes_per_sec"] = result["value"]
        result["detail"]["headline_batch"] = best_b
        result["value"] = round(best, 2)
        result["vs_baseline"] = round(best / REF_SCENES_PER_SEC, 3)
    else:
        result["detail"]["headline_batch"] = 1


def main():
    """Supervisor: backend probe + deadline-bounded child measurement."""
    from s4g_tpu.runtime import guard

    # Persistent XLA cache BEFORE any child spawns: the driver runs this
    # file bare on a possibly-cold host, and cold tunnel compiles are the
    # main way a bounded deadline turns into a structured-failure line.
    guard.enable_persistent_cache()
    probe_s = float(os.environ.get("S4G_BACKEND_PROBE_DEADLINE", 150))
    ok, info = guard.backend_reachable(timeout_s=probe_s)
    if not ok:
        print(json.dumps(_error_result(f"backend unreachable: {info}")))
        return

    deadline = float(os.environ.get("S4G_BENCH_DEADLINE", 1500))
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)))
    last_partial, result, tail = None, None, []
    t0 = time.monotonic()
    # Stream the child line-by-line (communicate() would buffer everything
    # until exit, hiding PARTIAL progress from logs and losing it entirely
    # if an outer `timeout` kills this supervisor mid-run).
    import threading

    def _pump():
        for line in proc.stdout:
            line = line.rstrip("\n")
            nonlocal_state(line)

    def nonlocal_state(line):
        nonlocal last_partial, result
        if line.startswith("PARTIAL "):
            last_partial = json.loads(line[len("PARTIAL "):])
            print(line, file=sys.stderr, flush=True)
        elif line.startswith("RESULT "):
            result = json.loads(line[len("RESULT "):])
        else:
            tail.append(line)

    pump = threading.Thread(target=_pump, daemon=True)
    pump.start()
    try:
        proc.wait(timeout=deadline)
    except subprocess.TimeoutExpired:
        proc.kill()
        try:
            proc.wait(timeout=10)
        except Exception:
            pass
    pump.join(timeout=10)
    elapsed = time.monotonic() - t0
    if result is not None:
        remaining = deadline - elapsed
        if remaining > 240:
            _measure_batch_points(
                result, deadline_each=min(remaining - 60, 900))
        print(json.dumps(result))
    elif proc.returncode is None or elapsed >= deadline:
        print(json.dumps(_error_result(
            f"bench child exceeded {deadline:.0f}s deadline "
            f"(backend was reachable at start: {info})", last_partial)))
    else:
        print(json.dumps(_error_result(
            f"bench child failed rc={proc.returncode}: "
            + " | ".join(tail[-4:])[-400:], last_partial)))


if __name__ == "__main__":
    if "--child" in sys.argv:
        _bench_child()
    else:
        main()
