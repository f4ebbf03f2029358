"""Quantify the deployment-config divergence at pose level ("parity at
speed", VERDICT r2 #5).

The benched deployment configuration (curvature_model.yaml: bf16 backbone,
SORT_POINTS, FPS_SHARDS=128) diverges from the reference-parity numerics
(f32, unsorted, exact FPS) at neighbour-selection level (docs/divergences.md
items 5-7).  This tool runs BOTH configurations with the SAME weights on the
SAME 25,600-point sample of the bundled real scene and reports:

* per-point score field agreement (max |delta|, fraction > 0.05);
* top-50 grasp-point set overlap (the reference's selection pool,
  file_logger_cls.py:197-218);
* pose deltas over the matched top candidates (translation mm, rotation
  geodesic deg).

Usage:
    python tools/parity_at_speed.py compare [ckpt_dir]   # correctness diff
    python tools/parity_at_speed.py selfnoise [ckpt_dir] # noise floor (see
                                                         # compare docstring)
    python tools/parity_at_speed.py time-parity          # scenes/sec, f32 path
    (deployment scenes/sec comes from bench.py — run solo)

No reference .pth is shipped in this environment, so "same weights" means a
framework checkpoint (pass the at-scale run's dir) or a fixed random init.
"""

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def _load_scene(rng, n=25600):
    scene = np.load("/root/reference/inference/2638_view_0.p",
                    allow_pickle=True)
    cloud = scene["point_cloud"].astype(np.float32)      # (3, n)
    sel = rng.choice(cloud.shape[1], n, replace=cloud.shape[1] < n)
    return cloud[:, sel]


def _qa_scene_assets(out_dir, qa_seed=777):
    """Simulate + render the at-scale run's held-out QA composition
    (tools/train_at_scale.py specs_of(777)).  Returns
    (pose_dict, (clean, noisy, cam) first view)."""
    from s4g_tpu.datagen.render import render_scene_views, table_mesh
    from s4g_tpu.datagen.scene_sim import TableEnv
    from tools.train_at_scale import build_procedural_catalog

    meshes, base_specs = build_procedural_catalog(out_dir)
    names = sorted(meshes)
    r = np.random.RandomState(10_000 + qa_seed)
    k = int(r.randint(4, 7))
    picked = r.choice(len(names), size=k, replace=False)
    qa_specs = [base_specs[names[i]] for i in picked]
    env = TableEnv(qa_specs, percentage=1.1, random_seed=qa_seed)
    pose_dict = env.run()
    views = render_scene_views({nm: meshes[nm] for nm in pose_dict},
                               pose_dict, table_mesh=table_mesh(),
                               rng=np.random.RandomState(0),
                               width=640, height=480)
    return pose_dict, views[0]


def _load_qa_scene(out_dir, rng, n=25600, qa_seed=777):
    """In-distribution scene: the at-scale run's held-out QA composition
    (tools/train_at_scale.py specs_of(777)), rendered and camera-framed.

    The bundled real scene is OUT of distribution for a checkpoint trained
    on the procedural catalog: its score field there is noisy, so the
    top-50 set is chaotic under ANY perturbation and the selfnoise floor
    saturates toward 0 — measured 0.04 at the r5 checkpoint, making
    deploy-vs-parity overlap unreadable.  On a scene from the training
    distribution the field is sharp and the floor meaningful."""
    _, (_, noisy, cam) = _qa_scene_assets(out_dir, qa_seed)
    world2cam = np.linalg.inv(cam)
    cloud = (world2cam[:3, :3] @ noisy.T
             + world2cam[:3, 3:4]).astype(np.float32)    # (3, n_view)
    sel = rng.choice(cloud.shape[1], n, replace=cloud.shape[1] < n)
    return cloud[:, sel]


def _build(cfg_overrides):
    from s4g_tpu.configs.config import load_cfg_from_file
    from s4g_tpu.models import build_model
    cfg = load_cfg_from_file("/root/repo/s4g_tpu/configs/curvature_model.yaml")
    pn2 = dataclasses.replace(cfg.MODEL.PN2, **cfg_overrides.get("PN2", {}))
    model = dataclasses.replace(cfg.MODEL, PN2=pn2,
                                **cfg_overrides.get("MODEL", {}))
    cfg = dataclasses.replace(cfg, MODEL=model)
    net, _, _ = build_model(cfg)
    return cfg, net


PARITY = {"MODEL": {"COMPUTE_DTYPE": "float32"},
          "PN2": {"SORT_POINTS": False, "FPS_SHARDS": 1}}
DEPLOY = {}   # the released YAML as-is

# Single-feature ablations (VERDICT r4 #3): which deployment feature moves
# the functional overlap off the self-noise floor?  FPS_SHARDS only acts
# under SORT_POINTS (the sharded FPS consumes the sorted cloud), so the
# lane-FPS effect is isolated as `sort_shards` minus `sort`.
ABLATIONS = {
    "bf16": {"MODEL": {"COMPUTE_DTYPE": "bfloat16"},
             "PN2": {"SORT_POINTS": False, "FPS_SHARDS": 1}},
    "sort": {"MODEL": {"COMPUTE_DTYPE": "float32"},
             "PN2": {"SORT_POINTS": True, "FPS_SHARDS": 1}},
    "sort_shards": {"MODEL": {"COMPUTE_DTYPE": "float32"},
                    "PN2": {"SORT_POINTS": True, "FPS_SHARDS": 128}},
}


def _variables(net, pts, ckpt_dir):
    import jax
    if ckpt_dir:
        import logging
        from s4g_tpu.utils.checkpoint import Checkpointer
        target = net.init(jax.random.key(0), {"scene_points": pts},
                          train=False)
        state = Checkpointer(ckpt_dir, logging.getLogger("parity")).load(
            None, resume=True, target=None)
        # train-state pytrees store params/batch_stats under "model"
        src = state.get("model", state)
        return {k: src[k] for k in target}
    return net.init(jax.random.key(0), {"scene_points": pts}, train=False)


def _run_config(net, variables, pts):
    import jax
    from s4g_tpu.pipeline.postprocessing import post_process_predictions
    preds = jax.jit(
        lambda v, p, n=net: n.apply(v, {"scene_points": p}, train=False)
    )(variables, pts)
    post = post_process_predictions(
        pts[0], preds["score"][0], preds["frame_R"][0],
        preds["frame_t"][0], 0.3, -1.0, num_candidates=1024)
    return {
        "score": np.asarray(preds["score"][0]),      # (C, N)
        "poses": np.asarray(post.poses),             # (K, 4, 4)
        "scores": np.asarray(post.scores),
        "valid": np.asarray(post.valid),
        "cand_point": np.asarray(post.poses[:, :3, 3]),
    }


def compare(ckpt_dir=None, selfnoise=False, sortnoise=False,
            scene="real"):
    """selfnoise: instead of parity-vs-deploy, run the PARITY config twice —
    once on the cloud as loaded, once with its points PERMUTED (outputs
    un-permuted for comparison).  Input point order is arbitrary in this
    pipeline (the detector random-samples the cloud, grasp_detector.py),
    and the reference is NOT order-invariant (FPS starts at index 0,
    scan-order tie-breaks), so this measures the NOISE FLOOR of every
    overlap/delta metric below under the pipeline's own arbitrariness —
    exactly the arbitrariness SORT_POINTS re-rolls (divergences.md #6).  A
    deploy-config divergence at or below this floor is indistinguishable
    from reference-intrinsic behavior.

    sortnoise: like selfnoise but the permutation SORTS the points along
    their widest axis — the exact reordering SORT_POINTS applies — while
    keeping the PARITY numerics (no slab kernels, no sharded FPS).  This
    isolates the round-5 attribution question: if parity-on-sorted-input
    reproduces the SORT_POINTS collapse, the slab/lane-FPS kernels are
    faithful and the divergence is the reference's own first-K scan-order
    semantics meeting a systematically ordered input (an input-distribution
    effect), not a kernel bug."""
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    if scene.startswith("qa:"):
        pts = jnp.asarray(_load_qa_scene(scene[3:], rng)[None])
    else:
        pts = jnp.asarray(_load_scene(rng)[None])        # (1, 3, 25600)

    _, net_p = _build(PARITY)
    _, net_d = _build(DEPLOY)
    variables = _variables(net_p, pts, ckpt_dir)

    out = {}
    if selfnoise or sortnoise:
        if sortnoise:
            p_np = np.asarray(pts[0])                    # (3, N)
            axis = int(np.argmax(p_np.max(1) - p_np.min(1)))
            perm = np.argsort(p_np[axis])
        else:
            perm = np.random.RandomState(1).permutation(pts.shape[2])
        out["parity"] = _run_config(net_p, variables, pts)
        res = _run_config(net_p, variables, pts[:, :, perm])
        res["score"] = res["score"][:, np.argsort(perm)]  # back to cloud order
        out["deploy"] = res          # "deploy" slot holds the permuted run
    else:
        for name, net in (("parity", net_p), ("deploy", net_d)):
            out[name] = _run_config(net, variables, pts)

    rec = _divergence_metrics(out["parity"], out["deploy"])
    rec["mode"] = ("sortnoise (parity vs parity on axis-sorted points)"
                   if sortnoise else
                   "selfnoise (parity vs parity on permuted points)"
                   if selfnoise else "parity vs deploy")
    rec["weights"] = "checkpoint" if ckpt_dir else "fixed random init"
    rec["scene"] = scene
    print(json.dumps(rec))


def _divergence_metrics(a, b):
    """Score-field + top-50 grasp-set agreement between two _run_config
    outputs over the SAME points (a = reference side, b = variant)."""
    # Score field agreement (expectation over bins, the selection signal).
    def expect(score):
        p = np.exp(score - score.max(0)) / np.exp(score - score.max(0)).sum(0)
        return (p * np.arange(score.shape[0])[:, None]).sum(0)

    d_score = np.abs(expect(a["score"]) - expect(b["score"]))

    # Top-50 candidate POINT overlap: candidates are point-anchored; match
    # by translation proximity (points are identical in both runs).
    def top_positions(o, k=50):
        ordr = np.argsort(-np.where(o["valid"], o["scores"], -np.inf))[:k]
        return o["cand_point"][ordr], o["poses"][ordr]

    pp, pose_p = top_positions(a)
    pd, pose_d = top_positions(b)
    d2 = np.linalg.norm(pp[:, None] - pd[None], axis=-1)   # (50, 50) metres
    match = d2.min(1) < 1e-4                     # same anchor point selected
    overlap = float(match.mean())

    # Functional grasp-set overlap: a parity grasp counts as covered when
    # SOME deploy top-50 grasp is within 1 cm translation and 10 deg
    # rotation — operationally the same grasp, whatever its anchor index.
    t_all = np.linalg.norm(pose_p[:, None, :3, 3] - pose_d[None, :, :3, 3],
                           axis=-1)                          # (50, 50) m
    tr = np.einsum("nij,mij->nm", pose_p[:, :3, :3], pose_d[:, :3, :3])
    ang_all = np.degrees(np.arccos(np.clip((tr - 1.0) / 2.0, -1.0, 1.0)))
    covered = ((t_all < 0.01) & (ang_all < 10.0)).any(1)
    overlap_fn = float(covered.mean())

    # Pose deltas over matched anchors.
    j = d2.argmin(1)
    t_err = np.linalg.norm(pose_p[match][:, :3, 3]
                           - pose_d[j[match]][:, :3, 3], axis=-1)
    rp, rd = pose_p[match][:, :3, :3], pose_d[j[match]][:, :3, :3]
    cosang = (np.einsum("nij,nij->n", rp, rd) - 1.0) / 2.0
    ang = np.degrees(np.arccos(np.clip(cosang, -1.0, 1.0)))

    return {
        "score_expectation_max_abs_delta": round(float(d_score.max()), 4),
        "score_expectation_frac_gt_0p05": round(float((d_score > 0.05).mean()), 4),
        "top50_anchor_overlap": overlap,
        "top50_grasp_overlap_1cm_10deg": overlap_fn,
        "matched_pose_t_delta_mm_max": round(float(t_err.max() * 1000), 3)
        if match.any() else None,
        "matched_pose_R_delta_deg_max": round(float(ang.max()), 3)
        if match.any() else None,
        "n_valid_parity": int(a["valid"].sum()),
        "n_valid_deploy": int(b["valid"].sum()),
    }


def quality(ckpt_dir=None, scene="qa:/tmp/s4g_scale_r4", top=50):
    """Ground-truth quality of each config's top-K grasps (VERDICT r4 #3).

    The deployment features that survive ablation (sharded FPS, stratified
    overfull-ball fill under SORT_POINTS) are by-design rule changes inside
    the pipeline's own arbitrariness class: per-point score fields diverge
    by the permutation noise floor (measured 0.822 vs floor 0.822 max
    delta at the r5 checkpoint), but the winner-take-all top-50 race
    amplifies near-ties, so SET overlap under-states behavioral parity.
    The operative question for a grasp system is whether the deployment
    config's winners are equally GOOD grasps — so grade both configs'
    top-K against the composed labeled scene (datagen ground truth,
    pipeline/eval_cloud.py::eval_frames: antipodal score, gripper
    collision, multi-object straddle; reference eval_point_cloud.py:64-113
    semantics)."""
    import pickle

    import jax.numpy as jnp

    from s4g_tpu.datagen.scene_compose import compose_scene
    from s4g_tpu.pipeline.eval_cloud import eval_frames
    from s4g_tpu.pipeline.postprocessing import REAL2TRAIN
    from s4g_tpu.utils.math_utils import batch_transformation_inv

    assert scene.startswith("qa:"), "quality mode needs the labeled QA scene"
    out_dir = scene[3:]
    pose_dict, (_, noisy, cam) = _qa_scene_assets(out_dir)

    # ground truth: composed labeled scene in WORLD frame
    object_data = {}
    for name in pose_dict:
        with open(os.path.join(out_dir, "single_object_data",
                               f"{name}.p"), "rb") as f:
            object_data[name] = pickle.load(f)
    sc = compose_scene(pose_dict, object_data)
    cloud_w = jnp.asarray(np.asarray(sc["cloud"], np.float32))
    normals_w = jnp.asarray(np.asarray(sc["normal"], np.float32))
    labels_w = jnp.asarray(np.asarray(sc["label"], np.int32))

    # identical camera-frame input for both configs
    rng = np.random.RandomState(0)
    world2cam = np.linalg.inv(cam)
    cl = (world2cam[:3, :3] @ noisy.T
          + world2cam[:3, 3:4]).astype(np.float32)
    sel = rng.choice(cl.shape[1], 25600, replace=cl.shape[1] < 25600)
    pts = jnp.asarray(cl[:, sel][None])

    rec = {"mode": f"top{top} ground-truth quality, parity vs deploy",
           "weights": "checkpoint" if ckpt_dir else "fixed random init",
           "scene": scene}
    for tag, overrides in (("parity", PARITY), ("deploy", DEPLOY)):
        _, net = _build(overrides)
        variables = _variables(net, pts, ckpt_dir)
        res = _run_config(net, variables, pts)
        order = np.argsort(
            -np.where(res["valid"], res["scores"], -np.inf))[:top]
        # post_process_predictions returns TRAIN2REAL @ pose (poses in the
        # robot-camera convention).  Here the model input IS the render
        # camera = train frame, so undo that factor before lifting to world
        # — without this every grasp misses the cloud and grades as an
        # empty-close-region "multi object".
        poses_cam = np.einsum("ij,njk->nik",
                              REAL2TRAIN.astype(np.float32),
                              res["poses"][order])          # (top, 4, 4)
        poses_w = np.einsum("ij,njk->nik", cam.astype(np.float32),
                            poses_cam)
        g2l = batch_transformation_inv(jnp.asarray(poses_w))
        ev = eval_frames(g2l, cloud_w, normals_w, labels_w)
        anti = np.asarray(ev.antipodal_score)
        rec[tag] = {
            "num_scored": int(np.asarray(res["valid"]).sum()),
            "collision_rate": round(float(np.asarray(
                ev.collision).mean()), 4),
            "multi_object_rate": round(float(np.asarray(
                ev.multi_objects).mean()), 4),
            "frac_good": round(float((anti > 0).mean()), 4),
            "antipodal_mean": round(float(anti.mean()), 4),
            "antipodal_mean_good": round(float(anti[anti > 0].mean()), 4)
            if (anti > 0).any() else None,
            "antipodal_max": round(float(anti.max()), 4),
        }
    print(json.dumps(rec), flush=True)


def ablate(ckpt_dir=None, scene="real"):
    """Single-feature attribution of the deploy-vs-parity divergence
    (VERDICT r4 #3): run the parity config once, then each ABLATIONS
    variant against it with the same weights, one JSON line each."""
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    if scene.startswith("qa:"):
        pts = jnp.asarray(_load_qa_scene(scene[3:], rng)[None])
    else:
        pts = jnp.asarray(_load_scene(rng)[None])

    _, net_p = _build(PARITY)
    variables = _variables(net_p, pts, ckpt_dir)
    base = _run_config(net_p, variables, pts)

    for name, overrides in ABLATIONS.items():
        _, net_v = _build(overrides)
        res = _run_config(net_v, variables, pts)
        rec = _divergence_metrics(base, res)
        rec["mode"] = f"parity vs ablation:{name}"
        rec["weights"] = "checkpoint" if ckpt_dir else "fixed random init"
        rec["scene"] = scene
        print(json.dumps(rec), flush=True)


def time_parity():
    import jax
    import jax.numpy as jnp
    from bench import slope_time
    from s4g_tpu.pipeline.postprocessing import post_process_predictions
    from s4g_tpu.pipeline.collision import batch_view_non_collision
    from s4g_tpu.utils.math_utils import batch_transformation_inv

    rng = np.random.RandomState(0)
    pts = jnp.asarray(_load_scene(rng))

    _, net = _build(PARITY)
    variables = jax.jit(
        lambda k, p: net.init(k, {"scene_points": p}, train=False)
    )(jax.random.key(0), pts[None])

    def detect(p):
        preds = net.apply(variables, {"scene_points": p[None]}, train=False)
        post = post_process_predictions(
            p, preds["score"][0], preds["frame_R"][0], preds["frame_t"][0],
            0.3, -1.0, num_candidates=1024)
        g2l = batch_transformation_inv(post.poses)
        ok = batch_view_non_collision(g2l, p.T)
        return post.poses.sum() + post.scores.sum() + (post.valid & ok).sum()

    det_t = slope_time(detect, (pts,))
    print(json.dumps({
        "config": "parity (f32, unsorted, exact FPS)",
        "e2e_ms_per_scene": round(det_t * 1000, 2),
        "scenes_per_sec": round(1.0 / det_t, 2),
    }))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "compare"
    scene = sys.argv[3] if len(sys.argv) > 3 else "real"
    if mode == "compare":
        compare(sys.argv[2] if len(sys.argv) > 2 else None, scene=scene)
    elif mode == "selfnoise":
        compare(sys.argv[2] if len(sys.argv) > 2 else None, selfnoise=True,
                scene=scene)
    elif mode == "sortnoise":
        compare(sys.argv[2] if len(sys.argv) > 2 else None, sortnoise=True,
                scene=scene)
    elif mode == "ablate":
        ablate(sys.argv[2] if len(sys.argv) > 2 else None, scene=scene)
    elif mode == "quality":
        quality(sys.argv[2] if len(sys.argv) > 2 else None,
                scene=scene if scene.startswith("qa:")
                else "qa:/tmp/s4g_scale_r4")
    elif mode == "time-parity":
        time_parity()
    else:
        raise SystemExit(f"unknown mode {mode}")
