"""Benchmark: scenes/sec/chip for single-view grasp inference.

Measures the reference's headline points (SURVEY.md §6 / BASELINE.md):
model-forward latency at batch 1 with 25,600 points, plus the fused
end-to-end detect pipeline, on the attached TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline uses BASELINE.md's reference anchor: the reference publishes no
numbers, so we anchor on an H100 estimate for the same PointNet++ forward
(~10 ms/scene => 100 scenes/sec; the driver's north star is 4x that).
vs_baseline = measured_scenes_per_sec / 100.0 (>4.0 meets the target).

NOTE on timing under this harness: block_until_ready is unreliable over the
remote-TPU tunnel, and fetching large outputs measures tunnel bandwidth, not
compute.  All timed programs therefore reduce outputs to scalars on device
and sync by fetching the scalar; per-fetch tunnel latency (~3 ms amortized
over a timing loop) is subtracted via a measured null-op baseline.
"""

import json
import time

import numpy as np

REF_SCENES_PER_SEC = 100.0  # documented H100-estimate anchor (BASELINE.md)


def _sync_scalar(x):
    return float(np.asarray(x))


def timed_loop(fn, iters):
    _sync_scalar(fn())
    t0 = time.perf_counter()
    r = None
    for _ in range(iters):
        r = fn()
    _sync_scalar(r)
    return (time.perf_counter() - t0) / iters


def _select_fps_impl():
    """Probe the Pallas FPS kernel; fall back to the XLA loop if the Mosaic
    compiler is unavailable (e.g. remote-compile helper outage)."""
    import os
    import jax.numpy as jnp
    from s4g_tpu.ops.sampling import farthest_point_sample
    try:
        probe = jnp.zeros((1, 3, 25600), jnp.float32)
        _sync_scalar(farthest_point_sample(probe, 5120,
                                           impl="pallas").sum())
    except Exception:
        os.environ["S4G_FPS_IMPL"] = "xla"


def main():
    import jax
    import jax.numpy as jnp

    _select_fps_impl()

    from s4g_tpu.configs.config import load_cfg_from_file
    from s4g_tpu.models import build_model
    from s4g_tpu.pipeline.postprocessing import post_process_predictions
    from s4g_tpu.pipeline.collision import batch_view_non_collision
    from s4g_tpu.utils.math_utils import batch_transformation_inv

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

    batch = {"scene_points": jnp.asarray(points[None])}
    variables = jax.jit(
        lambda k, b: net.init(k, b, train=False))(jax.random.key(0), batch)

    # Null-op: measures tunnel sync latency to subtract.
    null = jax.jit(lambda b: b["scene_points"].sum())
    null_t = timed_loop(lambda: null(batch), 30)

    fwd = jax.jit(lambda v, b: jax.tree.map(
        jnp.sum, net.apply(v, b, train=False))["score"])
    fwd_t = max(timed_loop(lambda: fwd(variables, batch), 30) - null_t, 1e-6)

    # Fused detect pipeline: forward + post-process + collision (batch 1).
    @jax.jit
    def detect(variables, batch, key):
        preds = net.apply(variables, batch, train=False)
        pts = batch["scene_points"][0]
        post = post_process_predictions(
            pts, preds["score"][0], preds["frame_R"][0], preds["frame_t"][0],
            0.3, -1.0, num_candidates=1024)
        g2l = batch_transformation_inv(post.poses)
        ok = batch_view_non_collision(g2l, pts.T)
        valid = post.valid & ok
        return post.poses.sum() + post.scores.sum() + valid.sum()

    key = jax.random.key(0)
    det_t = max(timed_loop(lambda: detect(variables, batch, key), 30) - null_t,
                1e-6)

    scenes_per_sec = 1.0 / det_t
    result = {
        "metric": "scenes/sec/chip single-view grasp inference "
                  "(e2e fwd+postproc+collision, 25600 pts, batch 1)",
        "value": round(scenes_per_sec, 2),
        "unit": "scenes/sec",
        "vs_baseline": round(scenes_per_sec / REF_SCENES_PER_SEC, 3),
        "detail": {
            "model_forward_ms": round(fwd_t * 1000, 2),
            "detect_e2e_ms": round(det_t * 1000, 2),
            "sync_overhead_ms": round(null_t * 1000, 2),
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
