"""Deployment-scale training run (VERDICT r1 weak #6 / next-round #5).

Exercises BASELINE config #4 at the released curvature_model geometry —
25,600 input points, SA centroids 5120/1024/256, full channel widths,
batch >= 4 — for a few hundred steps on the TPU, with synthetic scenes from
the in-repo data factory (MuJoCo sim -> z-buffer render -> Darboux grading
-> label transfer -> merge).  Records step time and the loss curve.

Usage:
    python tools/train_at_scale.py --out /tmp/s4g_scale --scenes 8 \
        --steps 300 --batch 4
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def box_mesh(hx, hy, hz):
    corners = np.array([[x, y, z] for x in (-hx, hx)
                        for y in (-hy, hy) for z in (-hz, hz)])
    tris = np.array([
        [0, 1, 2], [1, 3, 2], [4, 6, 5], [5, 6, 7],
        [0, 4, 1], [1, 4, 5], [2, 3, 6], [3, 7, 6],
        [0, 2, 4], [2, 6, 4], [1, 5, 3], [3, 5, 7]])
    return corners.astype(np.float64), tris


def build_procedural_catalog(out_dir):
    """The 11-class procedural inventory x 3 scale variants as mesh-geom
    ObjectSpecs (STLs written under out_dir/assets, loaded by MuJoCo; the
    name#k scale convention matches the reference's scale_objects.py).
    MuJoCo collides mesh geoms by convex hull — same approximation the
    reference accepts pre-VHACD — while render/grading use the true mesh.
    """
    from s4g_tpu.datagen.mesh_tools import (PROCEDURAL_CLASSES, save_stl,
                                            scale_variants)
    from s4g_tpu.datagen.scene_sim import ObjectSpec

    asset_dir = os.path.join(out_dir, "assets")
    os.makedirs(asset_dir, exist_ok=True)
    meshes, specs = {}, {}
    for cls, maker in sorted(PROCEDURAL_CLASSES.items()):
        verts, tris = maker()
        for k, v_scaled in scale_variants(verts).items():
            name = f"{cls}#{k}"
            path = os.path.join(asset_dir, f"{cls}_{k}.stl")
            if not os.path.exists(path):
                save_stl(path, v_scaled, tris)
            meshes[name] = (v_scaled, tris)
            specs[name] = ObjectSpec(name=name, geom_type="mesh",
                                     mesh_files=[path])
    return meshes, specs


REAL_MESH_OBJ = "/root/reference/objects/mesh/camera.obj"


def build_real_mesh_catalog(out_dir, frame_stride=8,
                            extra_cache_dirs=()):
    """The bundled real mesh (the reference's `objects/mesh/camera.obj`,
    20,222 verts — the only real asset on this zero-egress host; the
    118-mesh YCB catalog, dataset_config.py:3-56, is not downloadable) at
    the same 3 scale variants as the procedural classes.

    Pre-grades each variant with a strided frame budget (every 8th
    surface point's frame, cloud density unchanged — see
    generate.grade_object): full-resolution grading of this mesh measured
    ~33 min/scale on the 1-CPU host (BASELINE.md mesh-QA section), which
    would dwarf a smoke run, and grading cost is linear in graded frames.
    Seeds the factory's per-object cache so generate_scenes skips its
    full regrade.  MuJoCo collides the mesh by convex hull — no V-HACD
    binary ships on this host (the reference pre-decomposes its meshes
    offline, render/plain_vhacd.py; mesh_tools.vhacd_decompose wraps the
    same CLI for when one exists).
    """
    import pickle

    from s4g_tpu.datagen.generate import grade_object
    from s4g_tpu.datagen.mesh_tools import load_obj, save_stl, scale_variants
    from s4g_tpu.datagen.scene_sim import ObjectSpec

    asset_dir = os.path.join(out_dir, "assets")
    os.makedirs(asset_dir, exist_ok=True)
    verts, tris = load_obj(REAL_MESH_OBJ)
    meshes, specs = {}, {}
    for k, v_scaled in scale_variants(verts).items():
        name = f"camera#{k}"
        path = os.path.join(asset_dir, f"camera_{k}.stl")
        if not os.path.exists(path):
            save_stl(path, v_scaled, tris)
        meshes[name] = (v_scaled.astype(np.float64), tris)
        specs[name] = ObjectSpec(name=name, geom_type="mesh",
                                 mesh_files=[path])
        data = None                      # grade at most once per variant
        for cache_root in (out_dir, *extra_cache_dirs):
            obj_dir = os.path.join(cache_root, "single_object_data")
            os.makedirs(obj_dir, exist_ok=True)
            cache = os.path.join(obj_dir, f"{name}.p")
            if os.path.exists(cache):
                continue
            if data is None:
                tic = time.time()
                data = grade_object(meshes[name][0], tris,
                                    frame_stride=frame_stride,
                                    rng=np.random.RandomState(k))
                n_graded = int((np.asarray(
                    data["search_score"]).reshape(
                        len(data["cloud"]), -1) > 0).any(1).sum())
                print(f"[real-mesh] graded {name}: "
                      f"{len(data['cloud'])} cloud points, "
                      f"~{n_graded} frame-graded, in "
                      f"{time.time() - tic:.0f}s "
                      f"(frame_stride {frame_stride})", flush=True)
            tmp = f"{cache}.tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                pickle.dump(data, f)
            os.replace(tmp, cache)
    return meshes, specs


def run_detect_qa(variables, cfg, meshes, qa_specs, num_points,
                  qa_seed=777):
    """Held-out scene -> render -> preprocess -> detect -> sanity stats.

    Mirrors the reference's eval loop semantics (grasp_detector.py:137-185
    thresholding + view_collision_checker filtering) on one never-trained
    scene; returns the summary dict logged as [detect-qa].
    """
    import jax
    import jax.numpy as jnp
    from s4g_tpu.datagen.render import render_scene_views, table_mesh
    from s4g_tpu.datagen.scene_sim import TableEnv
    from s4g_tpu.models import build_model
    from s4g_tpu.pipeline.postprocessing import post_process_predictions
    from s4g_tpu.pipeline.collision import batch_view_non_collision
    from s4g_tpu.pipeline.preprocessing import preprocess_cloud
    from s4g_tpu.utils.math_utils import batch_transformation_inv

    env = TableEnv(qa_specs, percentage=1.1, random_seed=qa_seed)
    pose_dict = env.run()
    views = render_scene_views({n: meshes[n] for n in pose_dict}, pose_dict,
                               table_mesh=table_mesh(),
                               rng=np.random.RandomState(0),
                               width=640, height=480)
    clean, noisy, cam = views[0]
    net, _, _ = build_model(cfg)
    world2cam = np.linalg.inv(cam)
    noisy_cam = (world2cam[:3, :3] @ noisy.T + world2cam[:3, 3:4]).T
    pre = preprocess_cloud(jnp.asarray(noisy_cam.astype(np.float32)),
                           jax.random.key(0),
                           num_points=num_points, capacity=131072)
    batch_q = {"scene_points": pre.points.T[None]}
    preds = net.apply(variables, batch_q, train=False)
    post = post_process_predictions(
        pre.points.T, preds["score"][0], preds["frame_R"][0],
        preds["frame_t"][0], score_threshold=0.4, vertical_threshold=-1e9,
        num_candidates=512, train2real=jnp.eye(4))
    g2l = batch_transformation_inv(post.poses)
    no_collision = batch_view_non_collision(
        g2l, jnp.asarray(noisy_cam.astype(np.float32)))
    valid = np.asarray(post.valid & no_collision)
    poses_cam = np.asarray(post.poses)[valid]
    poses_w = np.einsum("ij,njk->nik", cam.astype(np.float32), poses_cam)
    heights = poses_w[:, 2, 3] if valid.sum() else np.zeros(0)
    return {
        "num_valid_grasps": int(valid.sum()),
        "num_score_valid": int(np.asarray(post.valid).sum()),
        "top_score": round(float(np.asarray(post.scores)[0]), 4),
        "frac_heights_in_table_band": round(
            float(((heights > 0.74) & (heights < 0.92)).mean()), 4)
        if valid.sum() else None,
        # distribution, to distinguish an uncalibrated score head (spread
        # everywhere) from a frame bug (systematic offset) when the band
        # fraction is low
        "heights_min_med_max": [round(float(v), 3) for v in (
            heights.min(), np.median(heights), heights.max())]
        if valid.sum() else None,
        "num_points": num_points,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="/tmp/s4g_scale")
    parser.add_argument("--scenes", type=int, default=8)
    parser.add_argument("--val-scenes", type=int, default=2,
                        help="extra held-out scenes for the val pass")
    parser.add_argument("--views", type=int, default=2)
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--num-points", type=int, default=25600)
    parser.add_argument("--skip-datagen", action="store_true")
    parser.add_argument("--datagen-only", action="store_true",
                        help="generate the scenes and exit (CPU-only; lets "
                             "the TPU window skip straight to training with "
                             "--skip-datagen)")
    parser.add_argument("--workers", type=int, default=1,
                        help="parallel scene-generation processes (spawn "
                             "pool; per-scene seeds are id-based, but "
                             "workers>1 pre-grades shared objects, which "
                             "re-rolls scene 0's render-noise draws vs a "
                             "cold sequential run)")
    parser.add_argument("--object-set",
                        choices=("box", "procedural", "mixed"),
                        default="box",
                        help="'box': 4 box sizes (the round-2 run). "
                             "'procedural': the full 11-class watertight "
                             "inventory x 3 scale variants (33 objects, "
                             "mesh geoms; the reference's 118-mesh YCB "
                             "catalog analog, dataset_config.py:3-56) with "
                             "4-6 objects sampled per scene. "
                             "'mixed': procedural + the bundled REAL mesh "
                             "(reference objects/mesh/camera.obj, the only "
                             "real asset on this zero-egress host) at the "
                             "same 3 scale variants, with one real variant "
                             "forced into every other scene")
    args = parser.parse_args()

    from s4g_tpu.configs.config import load_cfg_from_dict
    from s4g_tpu.datagen.generate import generate_scenes
    from s4g_tpu.datagen.scene_sim import ObjectSpec
    from s4g_tpu.train import SceneGraspDataset, Trainer

    os.makedirs(args.out, exist_ok=True)
    if args.object_set == "box":
        sizes = [(0.030, 0.030, 0.030), (0.025, 0.025, 0.045),
                 (0.020, 0.035, 0.028), (0.033, 0.022, 0.040)]
        meshes = {f"obj{i}": box_mesh(*s) for i, s in enumerate(sizes)}
        base_specs = {f"obj{i}": ObjectSpec(name=f"obj{i}", geom_type="box",
                                            size=f"{s[0]} {s[1]} {s[2]}")
                      for i, s in enumerate(sizes)}
        specs_of = lambda sid: list(base_specs.values())
    else:
        meshes, base_specs = build_procedural_catalog(args.out)
        real_names = []
        if args.object_set == "mixed":
            real_meshes, real_specs = build_real_mesh_catalog(
                args.out, extra_cache_dirs=[os.path.join(args.out, "val")])
            meshes.update(real_meshes)
            base_specs.update(real_specs)
            real_names = sorted(real_meshes)
        names = sorted(meshes)

        def specs_of(sid):
            # Deterministic per-scene draw of 4-6 distinct objects; same
            # convention as the reference's per-scene object sampling
            # (generate_simulation.py).
            r = np.random.RandomState(10_000 + sid)
            k = int(r.randint(4, 7))
            picked = r.choice(len(names), size=k, replace=False)
            chosen = [names[i] for i in picked]
            if real_names and sid % 2 == 0:
                # guarantee real-mesh coverage: force one real variant
                # into every even scene (replacing the last draw if the
                # scene didn't sample one already)
                forced = real_names[sid % len(real_names)]
                if not any(n in real_names for n in chosen):
                    chosen[-1] = forced
            return [base_specs[n] for n in chosen]

    data_dir = os.path.join(args.out, "merged_data")
    val_root = os.path.join(args.out, "val")
    val_dir = os.path.join(val_root, "merged_data")
    if not args.skip_datagen:
        tic = time.time()
        common = dict(num_views=args.views, percentage=1.1,
                      label_capacity=16384, render_wh=(640, 480),
                      workers=args.workers)
        # Per-scene seeds match the round-2 sequential driver exactly
        # (train: seed=scene_id; val: seed=9000+scene_id).
        train_lists = generate_scenes(
            meshes, [specs_of(s) for s in range(args.scenes)],
            args.out, base_seed=0, **common)
        for scene_id, merged in enumerate(train_lists):
            print(f"[datagen] scene {scene_id}: {len(merged)} views "
                  f"({time.time() - tic:.0f}s elapsed)", flush=True)
        val_lists = generate_scenes(
            meshes, [specs_of(5000 + s) for s in range(args.val_scenes)],
            val_root, base_seed=9000, **common)
        for scene_id, merged in enumerate(val_lists):
            print(f"[datagen] val scene {scene_id}: {len(merged)} views",
                  flush=True)
        total = sum(len(m) for m in train_lists + val_lists)
        print(f"[datagen] {total} views in {time.time() - tic:.0f}s",
              flush=True)
        from s4g_tpu.datagen.stats import dataset_statistics
        stats = dataset_statistics(data_dir)
        if args.object_set != "box":
            # auditability: which objects each scene drew (the 'real-mesh
            # rows' for mixed runs are the scenes listing camera#k)
            stats["scene_objects"] = {
                str(s): [sp.name for sp in specs_of(s)]
                for s in range(args.scenes)}
        stats_path = os.path.join(args.out, "dataset_stats.json")
        with open(stats_path, "w") as f:
            json.dump(stats, f, indent=1)
        print(f"[datagen] stats -> {stats_path}: "
              + json.dumps(stats["summary"]), flush=True)
    if args.datagen_only:
        print("[datagen] done (--datagen-only), exiting before training",
              flush=True)
        return

    ds = SceneGraspDataset(data_dir, num_points=args.num_points,
                           score_classes=3, batch_size=args.batch,
                           num_frame_points=512, seed=0, cache=True)
    steps_per_epoch = max(1, len(ds))
    epochs = max(1, (args.steps + steps_per_epoch - 1) // steps_per_epoch)

    # Deployment geometry: released curvature_model.yaml architecture.
    # Centroid counts follow the input size (25,600 -> 5120/1024/256
    # exactly), so CPU rehearsals with a smaller --num-points keep the
    # same N:M pyramid instead of running more centroids than points.
    np_in = args.num_points
    cfg = load_cfg_from_dict({
        "MODEL": {"TYPE": "PN2_CLS", "PN2": {
            "NUM_INPUT": np_in,
            "NUM_CENTROIDS": (np_in // 5, np_in // 25, np_in // 100),
            "RADIUS": (0.02, 0.08, 0.32),
            "NUM_NEIGHBOURS": (64, 64, 64),
            "SA_CHANNELS": ((128, 128, 256), (256, 256, 512),
                            (512, 512, 1024)),
            "FP_CHANNELS": ((1024, 1024), (512, 512), (256, 256, 256)),
            "NUM_FP_NEIGHBOURS": (3, 3, 3),
            "SEG_CHANNELS": (512, 256, 256, 128),
            "NEG_WEIGHT": 0.5,
        }},
        "DATA": {"SCORE_CLASSES": 3},
        "SOLVER": {"TYPE": "Adam", "BASE_LR": 0.001},
        "SCHEDULER": {"MAX_EPOCH": epochs, "TYPE": "StepLR",
                      "StepLR": {"step_size": 4000, "gamma": 0.5}},
        # LOG_PERIOD is also the scalar-materialization period, i.e. the
        # dispatch pipeline depth over the tunnel (train/trainer.py) — 10
        # keeps the device ~10 steps ahead of the blocking host read.
        "TRAIN": {"BATCH_SIZE": args.batch, "LOG_PERIOD": 10,
                  "CHECKPOINT_PERIOD": 10000, "VAL_PERIOD": 25,
                  "AUGMENTATION": ("PointCloudRotate",)},
    })
    print(f"[train] {len(ds)} batches/epoch x {epochs} epochs "
          f"(batch {args.batch}, {args.num_points} pts)", flush=True)

    val_ds = None
    if os.path.isdir(val_dir) and args.val_scenes > 0:
        val_ds = SceneGraspDataset(val_dir, num_points=args.num_points,
                                   score_classes=3, batch_size=args.batch,
                                   num_frame_points=512, seed=1, cache=True)

    trainer = Trainer(cfg, output_dir=os.path.join(args.out, "train_out"),
                      steps_per_epoch=steps_per_epoch)
    t0 = time.time()
    state = trainer.fit(ds, val_data=val_ds)
    wall = time.time() - t0
    steps = int(state.step)
    print(f"[train] {steps} steps in {wall:.0f}s "
          f"({wall / max(1, steps):.3f} s/step incl. compile+host)",
          flush=True)

    import jax
    from s4g_tpu.parallel.mesh import shard_batch

    # Final val pass over the held-out scenes (VERDICT r2 #8).
    val_metrics = None
    if val_ds is not None:
        from s4g_tpu.utils.logger import MetricLogger
        vm = MetricLogger(delimiter="  ")
        for vb in val_ds:
            vs = trainer._val_step(state, shard_batch(trainer.mesh, vb))
            vm.update(**jax.tree.map(np.asarray, vs))
        val_metrics = {k: round(m.global_avg, 4)
                       for k, m in vm.meters.items()}
        print("[val] " + json.dumps(val_metrics), flush=True)

    # Detection QA with the at-scale-trained weights at full resolution.
    # MUST run on the just-trained state BEFORE the steady-state timing
    # loop below: _train_step donates + mutates the state, so the r4 run's
    # QA silently evaluated weights 11 extra steps overfit to one repeated
    # batch (its logged 0-valid-grasp result; the saved checkpoint gives 2).
    detect_qa = run_detect_qa(state.variables, cfg, meshes, specs_of(777),
                              args.num_points)
    print("[detect-qa] " + json.dumps(detect_qa), flush=True)

    # Steady-state step time, measured separately from the fit wall clock.
    # Runs LAST: it trains (and donates) the state.
    batch = next(iter(ds))
    sharded = shard_batch(trainer.mesh, batch)
    state, scalars = trainer._train_step(state, sharded, jax.random.key(0))
    jax.block_until_ready(scalars)         # warm (donated-state recompile)
    t1 = time.time()
    reps = 10
    for i in range(reps):
        state, scalars = trainer._train_step(state, sharded,
                                             jax.random.key(i))
    jax.block_until_ready(scalars)
    steady = (time.time() - t1) / reps

    summary = {
        "steps": steps,
        "steady_state_s_per_step": round(steady, 3),
        "final_scalars": {k: round(float(v), 4) for k, v in scalars.items()},
        "val_metrics": val_metrics,
        "detect_qa": detect_qa,
        "wall_s": round(wall, 1),
        "batch": args.batch,
        "num_points": args.num_points,
    }
    print("[summary] " + json.dumps(summary), flush=True)
    with open(os.path.join(args.out, "scale_run.json"), "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
