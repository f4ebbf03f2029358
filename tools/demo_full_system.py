"""Full-system demo: synthetic data factory -> TPU training -> detection.

Exercises BASELINE configs #4 and #5 end-to-end on primitive objects:
1. generate scenes with the MuJoCo sim + renderer + label factory;
2. train PN2_CLS on the merged pickles (data-parallel trainer);
3. run the GraspDetector with the trained weights on a held-out scene and
   report how many valid grasps survive post-processing + collision checks.

Usage: python tools/demo_full_system.py --out /tmp/s4g_demo --scenes 6
"""

import argparse
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


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="/tmp/s4g_demo")
    parser.add_argument("--scenes", type=int, default=6)
    parser.add_argument("--epochs", type=int, default=12)
    parser.add_argument("--num-points", type=int, default=10240)
    args = parser.parse_args()

    from s4g_tpu.configs.config import load_cfg_from_dict
    from s4g_tpu.datagen.generate import generate_end_to_end
    from s4g_tpu.datagen.scene_sim import ObjectSpec
    from s4g_tpu.train import SceneGraspDataset, Trainer

    os.makedirs(args.out, exist_ok=True)
    sizes = [(0.030, 0.030, 0.030), (0.025, 0.025, 0.045),
             (0.020, 0.035, 0.028)]
    meshes = {f"obj{i}": box_mesh(*s) for i, s in enumerate(sizes)}
    specs = [ObjectSpec(name=f"obj{i}", geom_type="box",
                        size=f"{s[0]} {s[1]} {s[2]}")
             for i, s in enumerate(sizes)]

    # ---- 1. data factory -----------------------------------------------
    tic = time.time()
    all_merged = []
    for scene_id in range(args.scenes):
        merged = generate_end_to_end(
            meshes, specs, args.out, scene_id=scene_id, num_views=2,
            percentage=1.1, seed=scene_id, label_capacity=8192,
            render_wh=(320, 240))
        all_merged.extend(merged)
        print(f"[datagen] scene {scene_id}: {len(merged)} views "
              f"({time.time() - tic:.0f}s elapsed)", flush=True)
    print(f"[datagen] total {len(all_merged)} training views", flush=True)

    # ---- 2. training ----------------------------------------------------
    cfg = load_cfg_from_dict({
        "MODEL": {"TYPE": "PN2_CLS", "PN2": {
            "NUM_INPUT": args.num_points,
            "NUM_CENTROIDS": (2048, 512, 128),
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
        "SOLVER": {"BASE_LR": 0.001},
        "SCHEDULER": {"MAX_EPOCH": args.epochs, "TYPE": "StepLR",
                      "StepLR": {"step_size": 8, "gamma": 0.5}},
        "TRAIN": {"BATCH_SIZE": 2, "LOG_PERIOD": 2, "CHECKPOINT_PERIOD": 4,
                  "AUGMENTATION": ("PointCloudRotate",)},
    })
    data_dir = os.path.join(args.out, "merged_data")
    ds = SceneGraspDataset(data_dir, num_points=args.num_points,
                           score_classes=3, batch_size=2,
                           num_frame_points=256, seed=0)
    trainer = Trainer(cfg, output_dir=os.path.join(args.out, "train_out"),
                      steps_per_epoch=len(ds))
    state = trainer.fit(ds)
    print("[train] finished", flush=True)

    # ---- 3. detection with the trained weights --------------------------
    import jax
    import jax.numpy as jnp
    from s4g_tpu.datagen.render import render_scene_views, table_mesh
    from s4g_tpu.datagen.scene_sim import TableEnv
    from s4g_tpu.models import build_model
    from s4g_tpu.pipeline.postprocessing import post_process_predictions, REAL2TRAIN
    from s4g_tpu.pipeline.collision import batch_view_non_collision
    from s4g_tpu.pipeline.preprocessing import preprocess_cloud
    from s4g_tpu.utils.math_utils import batch_transformation_inv

    env = TableEnv(specs, percentage=1.1, random_seed=777)
    pose_dict = env.run()
    views = render_scene_views({n: meshes[n] for n in pose_dict}, pose_dict,
                               table_mesh=table_mesh(),
                               rng=np.random.RandomState(0),
                               width=320, height=240)
    clean, noisy, cam = views[0]

    net, _, _ = build_model(cfg)
    variables = state.variables

    # The training pickles hold CAMERA-frame clouds (label transfer dumps
    # to camera frame, reference torch_precomputed_...py:237-256), so the
    # detect input must be transformed world -> camera or BatchNorm sees an
    # out-of-distribution cloud and the scores collapse to a constant.
    world2cam = np.linalg.inv(cam)
    noisy_cam = (world2cam[:3, :3] @ noisy.T + world2cam[:3, 3:4]).T
    pre = preprocess_cloud(jnp.asarray(noisy_cam.astype(np.float32)),
                           jax.random.key(0),
                           num_points=args.num_points, capacity=32768)
    batch = {"scene_points": pre.points.T[None]}
    preds = net.apply(variables, batch, train=False)
    # vertical_threshold=-1e9 truly disables the verticality filter: the
    # degree is computed on the RAW un-orthogonalized rotation column
    # (reference parity, grasp_detector.py:153-156), whose magnitude is
    # unbounded for lightly-trained models, so -1.0 can still reject.
    post = post_process_predictions(
        pre.points.T, preds["score"][0], preds["frame_R"][0],
        preds["frame_t"][0], score_threshold=0.4, vertical_threshold=-1e9,
        num_candidates=256, train2real=jnp.eye(4))
    g2l = batch_transformation_inv(post.poses)
    no_collision = batch_view_non_collision(
        g2l, jnp.asarray(noisy_cam.astype(np.float32)))
    valid = np.asarray(post.valid & no_collision)
    scores = np.asarray(post.scores)
    poses_cam = np.asarray(post.poses)[valid]
    # camera frame -> world frame for the height sanity check
    poses = np.einsum("ij,njk->nik", cam.astype(np.float32), poses_cam)
    print(f"[detect] {valid.sum()} valid grasps "
          f"(top score {scores[0]:.3f})", flush=True)
    if valid.sum():
        heights = poses[:, 2, 3]
        on_objects = ((heights > 0.74) & (heights < 0.92)).mean()
        print(f"[detect] grasp heights sane: {on_objects:.0%} in table band",
              flush=True)
    print("DEMO COMPLETE", flush=True)


if __name__ == "__main__":
    main()
