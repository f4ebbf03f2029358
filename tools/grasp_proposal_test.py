"""End-to-end smoke inference on the bundled real scene — the install check
(reference: inference/grasp_proposal/grasp_proposal_test.py:36-91).

Loads a training-data pickle ('point_cloud' key), preprocesses to the fixed
25,600-point budget, runs the PN2_CLS curvature model, appends the forward
latency to inference_time_ours.txt, dumps prediction artifacts, and exports
the top collision-free grasps.

Usage: python tools/grasp_proposal_test.py [--scene PATH] [--output DIR]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def load_static_data_batch(scene_path: str, num_points: int, key):
    import jax.numpy as jnp
    from s4g_tpu.pipeline.preprocessing import preprocess_cloud

    data = np.load(scene_path, allow_pickle=True)
    cloud_array = np.asarray(data["point_cloud"], np.float32)  # (3, n)
    pre = preprocess_cloud(jnp.asarray(cloud_array.T), key,
                           num_points=num_points,
                           capacity=1 << int(np.ceil(np.log2(
                               cloud_array.shape[1]))))
    return {"scene_points": pre.points.T[None]}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--scene",
                        default="/root/reference/inference/2638_view_0.p")
    parser.add_argument("--output", default="./output")
    parser.add_argument("--model", default="curvature_model")
    args = parser.parse_args()

    import jax
    from s4g_tpu.pipeline.detector import GraspDetector, _CONFIG_DIR
    from s4g_tpu.pipeline.file_logger import log_to_file
    from s4g_tpu.utils.logger import MetricLogger, setup_logger

    os.makedirs(args.output, exist_ok=True)
    logger = setup_logger("S4G", args.output, "unit_test")
    logger.info("Devices: %s", jax.devices())

    detector = GraspDetector(model=args.model, output_dir=args.output)
    meters = MetricLogger(delimiter="  ")

    tic = time.time()
    data_batch = load_static_data_batch(
        args.scene, detector.num_input, jax.random.key(0))
    data_time = time.time() - tic

    fwd = jax.jit(lambda v, b: detector.net.apply(v, b, train=False))
    # warm-up + sync (compile happens here, not inside the timed call)
    jax.tree.map(np.asarray, fwd(detector.variables, data_batch))
    tic = time.time()
    predictions = jax.tree.map(np.asarray, fwd(detector.variables, data_batch))
    batch_time = time.time() - tic
    with open("inference_time_ours.txt", "a+") as f:
        f.write("{:.4f}\n".format(batch_time * 1000.0))
    meters.update(time=batch_time, data=data_time)
    logger.info(str(meters))

    result = log_to_file(data_batch, predictions, 0, args.output,
                         prefix="test", with_label=False)
    if result is not None:
        top_poses, scores = result
        logger.info("top poses: %d, best score %.3f", len(top_poses),
                    scores.max() if len(scores) else float("nan"))


if __name__ == "__main__":
    main()
    print("Finish")
