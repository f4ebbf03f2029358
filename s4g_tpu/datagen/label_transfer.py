"""Label transfer: precomputed scene grasp labels -> single-view training data.

Re-design of TorchPrecomputedSingleViewPointCloud (reference:
pcd_classes/torch_precomputed_single_view_point_cloud.py:14-396):

1. processing_and_trace — workspace crop, voxel downsample with index trace
   (max original index per voxel, matching the reference's
   np.max(trace, axis=1) at :90), radius outlier removal;
2. match_to_scene — per view point, nearest scene point within
   CURVATURE_RADIUS; copy its Darboux frame/normal/scores; flip the frame
   (and swap in the inv scores) when the oriented view normal agrees with
   the frame x-axis (:162-170);
3. the "magic formula" validity filter (search > 50 & antipodal > 0.3 &
   z > SAMPLE_REGION, :172-185);
4. finger_hand — per candidate frame x (length x theta) search pose, check
   table collision (gripper bound corners), back/finger collision vs the
   dense scene cloud, close-region population and single-object membership,
   then copy the per-pose scores (:277-396).  Here ONE batched TPU program
   over (candidates x poses x scene points) replaces the per-frame loop.

Thresholds use the data-gen config (reference data_gen/configs/config.py):
BOTTOM_LENGTH 0.08, BACK/FINGER collision thresholds 0, close-region >= 10.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..configs import gripper_config as G
from ..pipeline.preprocessing import radius_outlier_mask, workspace_crop_mask
from .grading import (DATAGEN_BOTTOM_LENGTH, DATAGEN_CLOSE_REGION_MIN_POINTS,
                      DATAGEN_NUM_POINTS_THRESHOLD, LENGTH_SEARCH,
                      THETA_SEARCH, search_grid_transforms)

Array = jax.Array

TABLE_HEIGHT = 0.75
SAMPLE_REGION = TABLE_HEIGHT + 0.015
TABLE_COLLISION_OFFSET = 0.005
CURVATURE_RADIUS = 0.01
DATAGEN_WORKSPACE = (-0.4, 0.4, -0.35, 0.35, TABLE_HEIGHT - 0.001,
                     TABLE_HEIGHT + 0.45)
VOXEL_SIZE = 0.005
OUTLIER_RADIUS = 0.04
OUTLIER_MIN_NEIGHBORS = 8
MAGIC_SEARCH_MIN = 50
MAGIC_ANTIPODAL_MIN = 0.3
VALID_SEARCH_MIN = 1.0
VALID_ANTIPODAL_MIN = 0.1

NUM_L, NUM_T = len(LENGTH_SEARCH), len(THETA_SEARCH)


class TraceResult(NamedTuple):
    points: Array        # (capacity, 3) voxel-averaged view points
    index_in_ref: Array  # (capacity,) max original index per voxel
    valid: Array         # (capacity,) bool


@functools.partial(jax.jit, static_argnums=(1,))
def processing_and_trace(points: Array, capacity: int = 32768,
                         workspace=DATAGEN_WORKSPACE) -> TraceResult:
    """Crop -> voxel (with max-index trace) -> outlier removal.

    points: (N, 3) noisy view cloud.
    """
    n = points.shape[0]
    valid = workspace_crop_mask(points, workspace)

    # voxel downsample with trace
    big = jnp.array(jnp.iinfo(jnp.int32).max, jnp.int32)
    origin = jnp.min(jnp.where(valid[:, None], points, jnp.inf), axis=0)
    coords = jnp.floor((points - origin) / VOXEL_SIZE).astype(jnp.int32)
    ids = ((coords[:, 0] * 1_000_003 + coords[:, 1]) * 1_000_003
           + coords[:, 2])
    ids = jnp.where(valid, ids, big)
    order = jnp.argsort(ids)
    ids_s = ids[order]
    pts_s = points[order]
    orig_s = order.astype(jnp.int32)
    is_new = jnp.concatenate([jnp.ones((1,), bool), ids_s[1:] != ids_s[:-1]])
    is_new &= ids_s != big
    group = jnp.cumsum(is_new) - 1
    group = jnp.where(ids_s == big, capacity, group)

    sums = jnp.zeros((capacity + 1, 3), points.dtype).at[group].add(pts_s)
    counts = jnp.zeros((capacity + 1,), jnp.int32).at[group].add(1)
    max_idx = jnp.full((capacity + 1,), -1, jnp.int32).at[group].max(orig_s)
    mean = sums[:capacity] / jnp.maximum(counts[:capacity], 1)[:, None]
    num_voxels = jnp.sum(is_new.astype(jnp.int32))
    vox_valid = jnp.arange(capacity) < jnp.minimum(num_voxels, capacity)

    keep = radius_outlier_mask(mean, vox_valid, OUTLIER_RADIUS,
                               OUTLIER_MIN_NEIGHBORS)
    return TraceResult(mean, max_idx[:capacity], keep)


class MatchResult(NamedTuple):
    frames: Array          # (V, 3, 3) matched scene frames (flip applied)
    normals: Array         # (V, 3) oriented view normals
    search_score: Array    # (V, L, T)
    antipodal_score: Array # (V, L, T)
    matched: Array         # (V,) bool — scene neighbour within radius


@jax.jit
def match_to_scene(ref_points: Array, camera_location: Array,
                   scene_cloud: Array, scene_normals: Array,
                   scene_frames: Array, scene_inv_frames: Array,
                   scene_search: Array, scene_inv_search: Array,
                   scene_antipodal: Array, scene_inv_antipodal: Array
                   ) -> MatchResult:
    """1-NN match of view points into the labeled scene cloud.

    ref_points: (V, 3) clean reference positions of the view points.
    scene_*: labeled scene tensors (N, ...).
    """
    d = (jnp.sum(ref_points ** 2, -1)[:, None]
         + jnp.sum(scene_cloud ** 2, -1)[None, :]
         - 2.0 * ref_points @ scene_cloud.T)
    nn = jnp.argmin(d, axis=1)
    nn_d = jnp.take_along_axis(d, nn[:, None], axis=1)[:, 0]
    matched = nn_d <= CURVATURE_RADIUS ** 2

    frames = scene_frames[nn]
    normals = jnp.where(matched[:, None], scene_normals[nn],
                        jnp.asarray([0.0, 0.0, 1.0]))
    search = scene_search[nn]
    inv_search = scene_inv_search[nn]
    antipodal = scene_antipodal[nn]
    inv_antipodal = scene_inv_antipodal[nn]

    # Orient normals toward the camera, then flip frames whose x-axis agrees
    # with the oriented normal (the grasp must approach INTO the surface).
    to_cam = camera_location[None, :] - ref_points
    normals = normals / jnp.maximum(
        jnp.linalg.norm(normals, axis=1, keepdims=True), 1e-12)
    normals = jnp.where(
        jnp.sum(normals * to_cam, axis=1, keepdims=True) < 0, -normals,
        normals)
    flip = jnp.sum(normals * frames[:, :, 0], axis=1) > 0
    frames = jnp.where(flip[:, None, None],
                       frames.at[:, :, 0:2].multiply(-1.0), frames)
    search = jnp.where(flip[:, None, None], inv_search, search)
    antipodal = jnp.where(flip[:, None, None], inv_antipodal, antipodal)
    return MatchResult(frames, normals, search, antipodal, matched)


def magic_formula(search: Array, antipodal: Array, matched: Array,
                  z: Array) -> Array:
    """Candidate filter (reference :172-185): any (L, T) cell with
    search > 50 and antipodal > 0.3, matched, and above the sample region."""
    cell_ok = (search > MAGIC_SEARCH_MIN) & (antipodal > MAGIC_ANTIPODAL_MIN)
    return cell_ok.any(axis=(1, 2)) & matched & (z > SAMPLE_REGION)


class SceneGradeResult(NamedTuple):
    search_score: Array     # (C, L, T) copied where the pose is valid
    antipodal_score: Array  # (C, L, T)
    objects_label: Array    # (C, L, T) int32 (num_objects == table default)
    frames: Array           # (C, L, T, 4, 4) local_search -> global poses
    valid: Array            # (C,) any pose valid and score floors met
    close_counts: Array     # (C, L, T) close-region populations vs the scene


@functools.partial(jax.jit, static_argnums=(6, 7))
def grade_against_scene(points: Array, frames: Array, pre_search: Array,
                        pre_antipodal: Array, scene_homo: Array,
                        scene_labels: Array, chunk: int = 8,
                        back_threshold: float = 0.0) -> SceneGradeResult:
    """Vectorized finger_hand (reference :277-396) over candidate frames.

    Args:
        points: (C, 3) candidate grasp points; frames: (C, 3, 3).
        pre_search / pre_antipodal: (C, L, T) matched per-point scores.
        scene_homo: (4, N) dense labeled scene cloud.
        scene_labels: (N,) int32 object labels.
    """
    grid = jnp.asarray(search_grid_transforms())            # (LT, 4, 4)
    grid_inv = jnp.asarray(np.linalg.inv(
        search_grid_transforms().astype(np.float64)).astype(np.float32))
    # data-gen gripper bound corners use the short bottom (config.py:58-64)
    bound_dg = np.ones((4, 8), np.float32)
    i = 0
    for x in (G.FINGER_LENGTH, -DATAGEN_BOTTOM_LENGTH):
        for y in (G.HALF_BOTTOM_WIDTH, -G.HALF_BOTTOM_WIDTH):
            for z in (G.HALF_HAND_THICKNESS, -G.HALF_HAND_THICKNESS):
                bound_dg[0:3, i] = [x, y, z]
                i += 1
    bound = jnp.asarray(bound_dg)

    c = points.shape[0]
    pad = (-c) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    frs = jnp.pad(frames, ((0, pad), (0, 0), (0, 0)))
    num_chunks = (c + pad) // chunk

    def per_chunk(args):
        pts_c, frs_c = args
        cc = pts_c.shape[0]
        rot_t = jnp.swapaxes(frs_c, 1, 2)
        trans = -jnp.einsum("cij,cj->ci", rot_t, pts_c)
        g2l = jnp.concatenate([rot_t, trans[..., None]], axis=-1)
        bottom = jnp.broadcast_to(jnp.asarray([0., 0., 0., 1.], pts_c.dtype),
                                  (cc, 1, 4))
        g2l44 = jnp.concatenate([g2l, bottom], axis=1)       # (cc, 4, 4)
        l2g44 = jnp.concatenate(
            [jnp.concatenate([frs_c, pts_c[..., None]], axis=-1), bottom],
            axis=1)

        # Table collision: gripper bound corners of every search pose.
        pose_l2g = jnp.einsum("cij,gjk->cgik", l2g44, grid_inv)  # (cc,LT,4,4)
        corners = jnp.einsum("cgij,jk->cgik", pose_l2g, bound)   # (cc,LT,4,8)
        table_collision = jnp.any(
            corners[:, :, 2, :] < TABLE_HEIGHT + TABLE_COLLISION_OFFSET,
            axis=-1)                                             # (cc, LT)

        combined = jnp.einsum("gij,cjk->cgik", grid, g2l44)
        local = jnp.einsum("cgij,jn->cgin", combined[:, :, :3, :], scene_homo)
        x, y, z = local[..., 0, :], local[..., 1, :], local[..., 2, :]

        close_plane = (x < G.FINGER_LENGTH) & (x > -DATAGEN_BOTTOM_LENGTH)
        plane_ok = (jnp.sum(close_plane, axis=-1)
                    >= DATAGEN_NUM_POINTS_THRESHOLD)
        z_ok = ((z < G.HALF_HAND_THICKNESS) & (z > -G.HALF_HAND_THICKNESS))
        back = (close_plane & z_ok & (x < 0.0)
                & (y < G.HALF_BOTTOM_WIDTH) & (y > -G.HALF_BOTTOM_WIDTH))
        finger_y = (((y < G.HALF_BOTTOM_WIDTH) & (y > G.HALF_BOTTOM_SPACE))
                    | ((y > -G.HALF_BOTTOM_WIDTH)
                       & (y < -G.HALF_BOTTOM_SPACE)))
        finger = close_plane & z_ok & finger_y
        close_region = (close_plane & z_ok & (y < G.HALF_BOTTOM_SPACE)
                        & (y > -G.HALF_BOTTOM_SPACE))

        back_ok = jnp.sum(back, axis=-1) <= back_threshold
        finger_ok = jnp.sum(finger, axis=-1) <= 0
        count = jnp.sum(close_region, axis=-1)
        count_ok = count >= DATAGEN_CLOSE_REGION_MIN_POINTS

        # single-object check: min label == max label inside the close region
        lab = scene_labels[None, None, :]
        lab_min = jnp.min(jnp.where(close_region, lab, jnp.int32(2 ** 30)),
                          axis=-1)
        lab_max = jnp.max(jnp.where(close_region, lab, jnp.int32(-2 ** 30)),
                          axis=-1)
        single = lab_min == lab_max

        pose_valid = (plane_ok & ~table_collision & back_ok & finger_ok
                      & count_ok & single)                    # (cc, LT)
        label = jnp.where(pose_valid, lab_min, jnp.int32(-1))
        return (pose_valid.reshape(cc, NUM_L, NUM_T),
                label.reshape(cc, NUM_L, NUM_T),
                pose_l2g.reshape(cc, NUM_L, NUM_T, 4, 4),
                count.reshape(cc, NUM_L, NUM_T))

    pts_chunks = pts.reshape(num_chunks, chunk, 3)
    frs_chunks = frs.reshape(num_chunks, chunk, 3, 3)
    pose_valid, labels, pose_l2g, counts = lax.map(per_chunk,
                                                   (pts_chunks, frs_chunks))
    pose_valid = pose_valid.reshape(-1, NUM_L, NUM_T)[:c]
    labels = labels.reshape(-1, NUM_L, NUM_T)[:c]
    pose_l2g = pose_l2g.reshape(-1, NUM_L, NUM_T, 4, 4)[:c]
    counts = counts.reshape(-1, NUM_L, NUM_T)[:c]

    # zero frames never produce valid poses
    frame_ok = jnp.mean(jnp.abs(frames), axis=(1, 2)) > 1e-6
    pose_valid &= frame_ok[:, None, None]

    search = jnp.where(pose_valid, pre_search, 0.0)
    antipodal = jnp.where(pose_valid, pre_antipodal, 0.0)
    valid = ((jnp.max(search, axis=(1, 2)) >= VALID_SEARCH_MIN)
             & (jnp.max(antipodal, axis=(1, 2)) >= VALID_ANTIPODAL_MIN))
    close_counts = jnp.where(pose_valid, counts, 0).astype(jnp.float32)
    return SceneGradeResult(search, antipodal, labels, pose_l2g, valid,
                            close_counts)


def generate_view_labels(noise_points: np.ndarray, clean_points: np.ndarray,
                         camera_pose: np.ndarray, scene: dict,
                         capacity: int = 32768, chunk: int = 8) -> dict:
    """Full per-view label transfer (host orchestration of the TPU stages).

    Mirrors generate_fast_training_data's per-view body (reference:
    generate_fast_training_data.py:14-48): returns the training-data dict in
    the reference dump layout (:237-256), with the cloud and frames mapped to
    the camera frame.
    """
    camera_pose = np.asarray(camera_pose, np.float64)
    cam_inv = np.linalg.inv(camera_pose).astype(np.float32)
    cam_loc = camera_pose[:3, 3].astype(np.float32)

    trace = processing_and_trace(jnp.asarray(noise_points, jnp.float32),
                                 capacity=capacity)
    keep = np.asarray(trace.valid)
    view_points = np.asarray(trace.points)[keep]
    index_in_ref = np.asarray(trace.index_in_ref)[keep]
    ref_points = np.asarray(clean_points, np.float32)[index_in_ref]

    match = match_to_scene(
        jnp.asarray(ref_points), jnp.asarray(cam_loc),
        jnp.asarray(scene["cloud"], jnp.float32),
        jnp.asarray(scene["normal"], jnp.float32),
        jnp.asarray(scene["frame"], jnp.float32),
        jnp.asarray(scene["inv_frame"], jnp.float32),
        jnp.asarray(scene["search_score"], jnp.float32),
        jnp.asarray(scene["inv_search_score"], jnp.float32),
        jnp.asarray(scene["antipodal_score"], jnp.float32),
        jnp.asarray(scene["inv_antipodal_score"], jnp.float32))

    candidate = np.asarray(magic_formula(
        match.search_score, match.antipodal_score, match.matched,
        jnp.asarray(view_points[:, 2])))
    cand_idx = np.nonzero(candidate)[0]

    scene_homo = np.concatenate(
        [scene["cloud"].T, np.ones((1, len(scene["cloud"])))]).astype(
        np.float32)
    graded = grade_against_scene(
        jnp.asarray(view_points[cand_idx]),
        jnp.asarray(np.asarray(match.frames)[cand_idx]),
        jnp.asarray(np.asarray(match.search_score)[cand_idx]),
        jnp.asarray(np.asarray(match.antipodal_score)[cand_idx]),
        jnp.asarray(scene_homo),
        jnp.asarray(scene["label"], jnp.int32),
        chunk=chunk)

    valid = np.asarray(graded.valid)
    sel = cand_idx[valid]
    frames_cam = np.einsum(
        "ij,gltjk->gltik", cam_inv,
        np.asarray(graded.frames)[valid])                   # camera frame
    cloud_cam = (cam_inv[:3, :3] @ view_points.T
                 + cam_inv[:3, 3:4])                        # (3, V)
    return {
        "point_cloud": cloud_cam.astype(np.float32),
        "valid_index": sel.astype(np.int64),
        "valid_frame": frames_cam.astype(np.float32),
        "search_score": np.asarray(graded.search_score)[valid],
        "antipodal_score": np.asarray(graded.antipodal_score)[valid],
        "objects_label": np.asarray(graded.objects_label)[valid],
        "view_normals": np.asarray(match.normals),
    }


def generate_view_labels_online(noise_points: np.ndarray,
                                camera_pose: np.ndarray, scene: dict,
                                capacity: int = 32768, chunk: int = 8) -> dict:
    """Online variant: Darboux frames estimated on the VIEW cloud itself
    instead of matched from precomputed scene frames (reference:
    pcd_classes/torch_single_view_point_cloud.py:14-358).  Per-pose scores
    come from the scene grading's close-region populations, and the antipodal
    term is evaluated against the labeled scene via eval_frames.
    """
    from .grading import darboux_frames, estimate_normals
    from ..pipeline.eval_cloud import eval_frames
    from ..utils.math_utils import batch_transformation_inv

    camera_pose = np.asarray(camera_pose, np.float64)
    cam_inv = np.linalg.inv(camera_pose).astype(np.float32)
    cam_loc = camera_pose[:3, 3].astype(np.float32)

    trace = processing_and_trace(jnp.asarray(noise_points, jnp.float32),
                                 capacity=capacity)
    keep = np.asarray(trace.valid)
    view_points = np.asarray(trace.points)[keep]

    normals = np.asarray(estimate_normals(jnp.asarray(view_points),
                                          jnp.asarray(cam_loc)))
    frames_j, _ = darboux_frames(jnp.asarray(view_points),
                                 jnp.asarray(normals))
    frames = np.array(frames_j)  # writable copy
    # approach INTO the surface: flip frames agreeing with the camera-facing
    # normal (same rule as the precomputed path)
    flip = np.sum(normals * frames[:, :, 0], axis=1) > 0
    frames[flip, :, 0:2] *= -1.0

    candidate = ((np.abs(frames).mean(axis=(1, 2)) > 1e-6)
                 & (view_points[:, 2] > SAMPLE_REGION))
    cand_idx = np.nonzero(candidate)[0]
    if len(cand_idx) == 0:
        return {"point_cloud": (cam_inv[:3, :3] @ view_points.T
                                + cam_inv[:3, 3:4]).astype(np.float32),
                "valid_index": np.zeros(0, np.int64),
                "valid_frame": np.zeros((0, NUM_L, NUM_T, 4, 4), np.float32),
                "search_score": np.zeros((0, NUM_L, NUM_T), np.float32),
                "antipodal_score": np.zeros((0, NUM_L, NUM_T), np.float32),
                "objects_label": np.zeros((0, NUM_L, NUM_T), np.int32),
                "view_normals": normals}

    # antipodal per candidate against the labeled scene
    poses = np.tile(np.eye(4, dtype=np.float32), (len(cand_idx), 1, 1))
    poses[:, :3, :3] = frames[cand_idx]
    poses[:, :3, 3] = view_points[cand_idx]
    g2l = np.asarray(batch_transformation_inv(jnp.asarray(poses)))
    ev = eval_frames(jnp.asarray(g2l),
                     jnp.asarray(scene["cloud"], jnp.float32),
                     jnp.asarray(scene["normal"], jnp.float32),
                     jnp.asarray(scene["label"], jnp.int32))
    antipodal = np.asarray(ev.antipodal_score)

    scene_homo = np.concatenate(
        [scene["cloud"].T, np.ones((1, len(scene["cloud"])))]).astype(
        np.float32)
    pre = np.broadcast_to(antipodal[:, None, None],
                          (len(cand_idx), NUM_L, NUM_T)).copy()
    # pre_search is a placeholder; the true search score for the online
    # variant is the scene close-region count returned by the grading.
    graded = grade_against_scene(
        jnp.asarray(view_points[cand_idx]),
        jnp.asarray(frames[cand_idx]),
        jnp.asarray(pre) + VALID_SEARCH_MIN,
        jnp.asarray(pre),
        jnp.asarray(scene_homo),
        jnp.asarray(scene["label"], jnp.int32),
        chunk=chunk)

    valid = np.asarray(graded.valid)
    sel = cand_idx[valid]
    frames_cam = np.einsum("ij,gltjk->gltik", cam_inv,
                           np.asarray(graded.frames)[valid])
    cloud_cam = cam_inv[:3, :3] @ view_points.T + cam_inv[:3, 3:4]
    return {
        "point_cloud": cloud_cam.astype(np.float32),
        "valid_index": sel.astype(np.int64),
        "valid_frame": frames_cam.astype(np.float32),
        "search_score": np.asarray(graded.close_counts)[valid],
        "antipodal_score": np.asarray(graded.antipodal_score)[valid],
        "objects_label": np.asarray(graded.objects_label)[valid],
        "view_normals": normals,
    }
