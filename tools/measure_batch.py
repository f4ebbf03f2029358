"""Measure per-scene device time of the batched serving program.

Usage: python tools/measure_batch.py B

Runs the deployment-config model (curvature_model.yaml: SORT_POINTS,
sharded FPS, bf16 backbone) on a REAL (B, 3, 25600) batch and slope-times
(a) the model forward and (b) the fused forward+postproc+collision program
(bench.py's e2e points), printing one JSON line with per-scene ms.

One batch size per PROCESS: one-process multi-variant slope A/Bs measured
impossible numbers in round 2 (see BASELINE.md methodology notes); run each
B solo with nothing else on the chip.
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import slope_time  # noqa: E402


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1

    import jax
    import jax.numpy as jnp

    from s4g_tpu.configs.config import load_cfg_from_file
    from s4g_tpu.models import build_model
    from s4g_tpu.pipeline.postprocessing import (importance_sample,
                                                 post_process_predictions)
    from s4g_tpu.pipeline.collision import batch_view_non_collision
    from s4g_tpu.utils.math_utils import batch_transformation_inv

    cfg = load_cfg_from_file("/root/repo/s4g_tpu/configs/curvature_model.yaml")
    # Deployment-feature A/B knobs (parity_at_speed measures the OUTPUT
    # divergence of the same features; this measures their perf value).
    import dataclasses
    import os
    pn2_over = {}
    if os.environ.get("S4G_SORT_POINTS") is not None:
        on = os.environ["S4G_SORT_POINTS"] == "1"
        pn2_over["SORT_POINTS"] = on
        if not on:
            pn2_over["FPS_SHARDS"] = 1  # sharded FPS needs the sorted cloud
    if os.environ.get("S4G_FPS_SHARDS") is not None:
        pn2_over["FPS_SHARDS"] = int(os.environ["S4G_FPS_SHARDS"])
    if pn2_over:
        cfg = dataclasses.replace(cfg, MODEL=dataclasses.replace(
            cfg.MODEL, PN2=dataclasses.replace(cfg.MODEL.PN2, **pn2_over)))
    net, _, _ = build_model(cfg)
    rng = np.random.RandomState(0)

    try:
        scene = np.load("/root/reference/inference/2638_view_0.p",
                        allow_pickle=True)
        cloud = scene["point_cloud"].astype(np.float32)  # (3, n)
        sel = rng.choice(cloud.shape[1], (b, 25600),
                         replace=cloud.shape[1] < 25600)
        points = np.stack([cloud[:, s] for s in sel])    # (B, 3, 25600)
    except Exception:
        points = (rng.rand(b, 3, 25600) * 0.6 - 0.3).astype(np.float32)
        points[:, 2] += 1.0

    pts = jnp.asarray(points)
    variables = jax.jit(
        lambda k, x: net.init(k, {"scene_points": x}, train=False)
    )(jax.random.key(0), pts[:1])

    fwd = lambda p: net.apply(variables, {"scene_points": p}, train=False)
    fwd_t = slope_time(fwd, (pts,))

    def post_one(p, score, frame_r, frame_t):
        post = post_process_predictions(p, score, frame_r, frame_t,
                                        0.3, -1.0, num_candidates=1024)
        g2l = batch_transformation_inv(post.poses)
        ok = batch_view_non_collision(g2l, p.T)
        sel_i = importance_sample(jax.random.key(0), post.scores,
                                  post.valid & ok, 5)
        return (post.poses.sum() + post.scores.sum()
                + (post.valid & ok).sum() + sel_i.sum())

    def detect(p):
        preds = net.apply(variables, {"scene_points": p}, train=False)
        outs = jax.vmap(post_one)(p, preds["score"], preds["frame_R"],
                                  preds["frame_t"])
        return outs.sum()

    det_t = slope_time(detect, (pts,))

    print(json.dumps({
        "batch": b,
        "fwd_ms_per_scene": round(fwd_t / b * 1000, 3),
        "e2e_ms_per_scene": round(det_t / b * 1000, 3),
        "scenes_per_sec": round(b / det_t, 2),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
