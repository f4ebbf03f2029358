"""Evaluation-set builder.

Re-design of EvalDataGenerator (reference:
eval/evaluation_data_generator.py:30-453): per rendered view, sample random
above-table grasp points, estimate Darboux frames on the VIEW cloud itself
(the online variant, unlike the precomputed label transfer), check view
collision, and grade ground truth against the dense labeled scene
(antipodal + single-object).  Optionally attach the baseline payloads
(close-region clouds + GPD projection maps) for GPD/PointNetGPD eval.
"""

from __future__ import annotations

import pickle
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..pipeline.eval_cloud import eval_frames
from ..pipeline.collision import batch_view_non_collision
from ..utils.math_utils import batch_transformation_inv
from .baseline_data import baseline_grasp_data
from .grading import darboux_frames, estimate_normals
from .label_transfer import SAMPLE_REGION


def generate_eval_view(view_cloud: np.ndarray, camera_location: np.ndarray,
                       scene: dict, num_grasp_points: int = 2000,
                       rng: Optional[np.random.RandomState] = None,
                       with_baseline: bool = False,
                       save_path: Optional[str] = None) -> dict:
    """Build one view's eval record.

    Args:
        view_cloud: (N, 3) single-view points (world frame).
        scene: labeled scene dict (compose_scene output).

    Returns dict with frames, antipodal_score, non_collision_bool,
    single_label_bool (reference evaluation_data_generator.py:91-110).
    """
    rng = rng or np.random.RandomState()
    view_cloud = np.asarray(view_cloud, np.float32)

    above = np.nonzero(view_cloud[:, 2] > SAMPLE_REGION)[0]
    if len(above) == 0:
        return {"frames": np.zeros((0, 4, 4), np.float32)}
    pick = rng.choice(above, min(num_grasp_points, len(above)),
                      replace=len(above) < num_grasp_points)
    points = view_cloud[pick]

    normals = np.asarray(estimate_normals(
        jnp.asarray(view_cloud), jnp.asarray(camera_location, jnp.float32)))
    frames_all, _ = darboux_frames(jnp.asarray(view_cloud),
                                   jnp.asarray(normals))
    frames = np.asarray(frames_all)[pick]                     # (P, 3, 3)

    poses = np.tile(np.eye(4, dtype=np.float32), (len(pick), 1, 1))
    poses[:, :3, :3] = frames
    poses[:, :3, 3] = points
    g2l = np.asarray(batch_transformation_inv(jnp.asarray(poses)))

    non_collision = np.asarray(batch_view_non_collision(
        jnp.asarray(g2l), jnp.asarray(view_cloud)))

    result = eval_frames(
        jnp.asarray(g2l), jnp.asarray(scene["cloud"], jnp.float32),
        jnp.asarray(scene["normal"], jnp.float32),
        jnp.asarray(scene["label"], jnp.int32))

    record = {
        "frames": poses,
        "grasp_point_index": pick.astype(np.int64),
        "view_cloud": view_cloud,
        "antipodal_score": np.asarray(result.antipodal_score),
        "non_collision_bool": non_collision,
        "single_label_bool": ~np.asarray(result.multi_objects),
        "scene_collision_bool": np.asarray(result.collision),
    }

    if with_baseline:
        keep = np.nonzero(non_collision)[0][:300]
        close_sets, proj_maps = [], []
        for i in keep:
            payload = baseline_grasp_data(g2l[i], view_cloud, normals)
            close_sets.append(payload["close_region_points"])
            proj_maps.append(payload["close_region_projection_maps"])
        record["baseline_index"] = keep.astype(np.int64)
        record["close_region_points"] = (np.stack(close_sets)
                                         if close_sets else
                                         np.zeros((0, 3, 1024), np.float32))
        record["close_region_projection_maps"] = (
            np.stack(proj_maps) if proj_maps
            else np.zeros((0, 12, 60, 60), np.float32))

    if save_path:
        with open(save_path, "wb") as f:
            pickle.dump(record, f)
    return record
