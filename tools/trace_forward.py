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


def parse_xplane(trace_dir, top):
    from tensorflow.core.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {trace_dir}"
    xspace = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    for plane in xspace.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        ev_names = {m.id: m.name for m in plane.event_metadata.values()} \
            if hasattr(plane.event_metadata, "values") else {}
        # event_metadata is a map<int64, XEventMetadata>
        ev_names = {k: v.name for k, v in plane.event_metadata.items()}
        totals = defaultdict(float)
        counts = defaultdict(int)
        for line in plane.lines:
            if "XLA Ops" not in line.name and "XLA Op" != line.name:
                continue
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] += ev.duration_ps / 1e9  # ms
                counts[name] += 1
        if not totals:
            continue
        grand = sum(totals.values())
        print(f"\n=== plane: {plane.name} — total XLA-op time "
              f"{grand:.3f} ms over the traced window ===")
        for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
            print(f"{ms:9.3f} ms  x{counts[name]:<4d} {name[:110]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--detect", action="store_true",
                   help="trace the fused detect pipeline instead of forward")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--trace-dir", default="/tmp/s4g_trace")
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

    parse_xplane(args.trace_dir, args.top)


if __name__ == "__main__":
    main()
