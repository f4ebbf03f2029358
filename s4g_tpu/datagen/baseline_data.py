"""Baseline (GPD / PointNetGPD) training-data generation: gripper-frame
close-region point sets and the 12-channel GPD projection maps.

Re-design of the reference baseline generators (reference:
pcd_classes/torch_baseline_single_view_point_cloud.py:23-393 and
torch_precomputed_baseline.py): candidate grasps are graded against the
scene, their close-region points are shifted into the non-negative gripper
box ([0, FINGER_LENGTH] x [0, 2*HALF_BOTTOM_SPACE] x
[0, 2*HALF_HAND_THICKNESS], reference :313-315), sampled to a fixed budget,
and voxel-projected into the original GPD paper's 12 channels: for each of
the 3 axis orders, an average-height map + 3-channel averaged-normal map
(reference close_region_projection, :334-393).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import gripper_config as G

Array = jax.Array

PROJECTION_RESOLUTION = 60
PROJECTION_MARGIN = 1
X_DIM = G.FINGER_LENGTH
Y_DIM = G.HALF_BOTTOM_SPACE * 2
Z_DIM = G.HALF_HAND_THICKNESS * 2
_DIMS = np.array([X_DIM, Y_DIM, Z_DIM])
_UNITS = _DIMS / (PROJECTION_RESOLUTION - PROJECTION_MARGIN)


@jax.jit
def close_region_projection(points: Array, normals: Array,
                            valid: Array) -> Array:
    """12-channel GPD projection maps of one close region.

    Args:
        points: (3, N) close-region points in the SHIFTED gripper box
            (all coordinates >= 0); normals: (3, N); valid: (N,) mask.

    Returns:
        (12, R, R): for each axis order (xyz / yzx / zxy):
        [height map, mean normal x, y, z] projected along the last axis.
    """
    res = PROJECTION_RESOLUTION
    units = jnp.asarray(_UNITS, points.dtype)
    cor = jnp.floor(points / units[:, None]).astype(jnp.int32)  # (3, N)
    in_bounds = jnp.all((cor >= 0) & (cor < res), axis=0) & valid
    cor = jnp.clip(cor, 0, res - 1)

    flat = (cor[0] * res + cor[1]) * res + cor[2]
    flat = jnp.where(in_bounds, flat, res ** 3)  # overflow slot dropped

    ones = in_bounds.astype(points.dtype)
    occupancy = jnp.zeros(res ** 3 + 1, points.dtype).at[flat].add(ones)
    norm_sum = jnp.zeros((3, res ** 3 + 1), points.dtype).at[:, flat].add(
        normals * ones[None, :])
    occupancy = occupancy[:res ** 3].reshape(res, res, res)
    norm_map = (norm_sum[:, :res ** 3].reshape(3, res, res, res)
                / jnp.clip(occupancy, 1e-4)[None])
    occ = (occupancy > 0).astype(points.dtype)

    maps = []
    for i, order in enumerate(([0, 1, 2], [1, 2, 0], [2, 0, 1])):
        height = jnp.linspace(0.5 * _UNITS[order[-1]],
                              _DIMS[order[-1]] - 0.5 * _UNITS[order[-1]],
                              res)
        occ_t = jnp.transpose(occ, order)
        norm_t = jnp.transpose(norm_map, [0] + [o + 1 for o in order])
        proj_occ = occ_t.sum(-1)
        proj_norm = norm_t.sum(-1) / jnp.clip(proj_occ, 1e-4)[None]
        proj_height = ((occ_t * height[None, None, :]).sum(-1)
                       / jnp.clip(proj_occ, 1e-4))
        maps.append(proj_height[None])
        maps.append(proj_norm)
    return jnp.concatenate(maps, axis=0)


@functools.partial(jax.jit, static_argnums=(4,))
def extract_close_region(pose_g2l: Array, cloud: Array, normals: Array,
                         valid: Array, num_points: int = 1024
                         ) -> Tuple[Array, Array, Array]:
    """Close-region points/normals of one grasp in the shifted gripper box.

    Args:
        pose_g2l: (4, 4) global -> gripper-local transform.
        cloud: (N, 3) scene/view points; normals (N, 3); valid (N,).

    Returns:
        points (3, num_points) shifted into the box (padded by repetition),
        normals (3, num_points), count () int32.
    """
    homo = jnp.concatenate(
        [cloud.T, jnp.ones((1, cloud.shape[0]), cloud.dtype)])
    local = pose_g2l @ homo
    local_n = pose_g2l[:3, :3] @ normals.T
    x, y, z = local[0], local[1], local[2]
    inside = (valid
              & (x > 0) & (x < G.FINGER_LENGTH)
              & (y > -G.HALF_BOTTOM_SPACE) & (y < G.HALF_BOTTOM_SPACE)
              & (z > -G.HALF_HAND_THICKNESS) & (z < G.HALF_HAND_THICKNESS))
    count = jnp.sum(inside.astype(jnp.int32))

    # gather the first num_points inside-points (repeat-fill)
    n = cloud.shape[0]
    j = jnp.arange(n, dtype=jnp.int32)
    keys = jnp.where(inside, j, j + n)
    order = jnp.argsort(keys)[:num_points]
    take = jnp.minimum(jnp.maximum(count, 1), num_points)
    slot = jnp.arange(num_points, dtype=jnp.int32)
    idx = jnp.where(slot < take, order, order[0])

    pts = local[:3, idx]
    pts = pts.at[1].add(G.HALF_BOTTOM_SPACE)
    pts = pts.at[2].add(G.HALF_HAND_THICKNESS)
    return pts, local_n[:, idx], count


def baseline_grasp_data(pose_g2l: np.ndarray, cloud: np.ndarray,
                        normals: np.ndarray,
                        num_points: int = 1024) -> dict:
    """Host helper: one grasp -> close-region points + projection maps
    (the per-grasp payload of the baseline training pickles)."""
    valid = jnp.ones(len(cloud), bool)
    pts, nrm, count = extract_close_region(
        jnp.asarray(pose_g2l, jnp.float32), jnp.asarray(cloud, jnp.float32),
        jnp.asarray(normals, jnp.float32), valid, num_points)
    slot_valid = jnp.arange(num_points) < jnp.maximum(count, 1)
    proj = close_region_projection(pts, nrm, slot_valid)
    return {
        "close_region_points": np.asarray(pts),
        "close_region_normals": np.asarray(nrm),
        "close_region_projection_maps": np.asarray(proj),
        "num_close_points": int(count),
    }
