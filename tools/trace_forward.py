"""Capture a jax.profiler device trace of the deployment-scale forward (or
the fused detect pipeline) and print per-op device-time attribution.

This is the ground-truth complement to tools/profile_stages.py: slope timing
gives per-op wall costs in isolation, the xplane trace shows where the time
goes INSIDE the fused jit program (XLA fusion boundaries, DMA stalls,
per-kernel durations).

Usage: python tools/trace_forward.py [--detect] [--batch B] [--top 40]
"""

import argparse
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def capture(fn, args, trace_dir):
    import jax
    out = jax.block_until_ready(fn(*args))  # warm/compile
    with jax.profiler.trace(trace_dir):
        for _ in range(8):
            out = jax.block_until_ready(fn(*args))
    return out


def parse_trace(trace_dir, top, reps=8, json_out=None, batch=1):
    """Aggregate per-op device time from the Chrome trace JSON the profiler
    writes alongside the xplane (the 'XLA Ops' thread of the TPU process).
    `while` wrappers double-count their body ops, so they are listed but
    excluded from the leaf total."""
    import gzip
    import json

    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace.json.gz under {trace_dir}"
    tr = json.load(gzip.open(sorted(paths)[-1]))
    tids = {}
    for e in tr["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"].get("name", "")
    totals = defaultdict(float)
    counts = defaultdict(int)
    for e in tr["traceEvents"]:
        if e.get("ph") == "X" and \
                "XLA Ops" in tids.get((e["pid"], e["tid"]), ""):
            totals[e["name"]] += e["dur"] / 1e3  # ms
            counts[e["name"]] += 1
    leaf = sum(ms for n, ms in totals.items()
               if not (n.startswith("while") or n.startswith("cond")))
    print(f"\n=== device XLA-op time: {leaf / reps:.3f} ms/exec "
          f"(leaves, {reps} reps) ===")
    for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{ms / reps:9.3f} ms  x{counts[name] // reps:<4d} {name[:90]}")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"batch": batch, "reps": reps,
                       "leaf_ms_per_exec": leaf / reps,
                       "ms_per_exec": {n: ms / reps
                                       for n, ms in totals.items()}}, f)
        print(f"[json] per-op table -> {json_out}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--detect", action="store_true",
                   help="trace the fused detect pipeline instead of forward")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--trace-dir", default="/tmp/s4g_trace")
    p.add_argument("--json", default=None,
                   help="also dump the per-op ms table as JSON (for "
                        "tools/trace_diff.py)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from s4g_tpu.configs.config import load_cfg_from_file
    from s4g_tpu.models import build_model

    rng = np.random.RandomState(0)
    try:
        scene = np.load("/root/reference/inference/2638_view_0.p",
                        allow_pickle=True)
        cloud = scene["point_cloud"].astype(np.float32)
        sel = rng.choice(cloud.shape[1], 25600, replace=cloud.shape[1] < 25600)
        base = cloud[:, sel]
    except Exception:
        base = (rng.rand(3, 25600) * 0.6 - 0.3).astype(np.float32)
    pts = jnp.asarray(np.stack([base + 0.001 * i
                                for i in range(args.batch)]))

    cfg = load_cfg_from_file("s4g_tpu/configs/curvature_model.yaml")
    net, _, _ = build_model(cfg)
    variables = jax.jit(lambda k, b: net.init(k, b, train=False))(
        jax.random.key(0), {"scene_points": pts})

    if args.detect:
        from s4g_tpu.pipeline.postprocessing import post_process_predictions
        from s4g_tpu.pipeline.collision import batch_view_non_collision
        from s4g_tpu.utils.math_utils import batch_transformation_inv

        @jax.jit
        def fn(p):
            preds = net.apply(variables, {"scene_points": p[None]},
                              train=False)
            post = post_process_predictions(
                p, preds["score"][0], preds["frame_R"][0],
                preds["frame_t"][0], 0.3, -1.0, num_candidates=1024)
            g2l = batch_transformation_inv(post.poses)
            ok = batch_view_non_collision(g2l, p.T)
            return post.poses, post.scores, post.valid & ok
        capture(fn, (pts[0],), args.trace_dir)
    else:
        fwd = jax.jit(lambda p: net.apply(variables, {"scene_points": p},
                                          train=False))
        capture(fwd, (pts,), args.trace_dir)

    parse_trace(args.trace_dir, args.top, json_out=args.json,
                batch=args.batch)


if __name__ == "__main__":
    main()
