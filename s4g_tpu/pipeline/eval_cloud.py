"""Grasp evaluation against labeled scene clouds: collision + antipodal +
multi-object checks, batched.

Re-design of EvalExpCloud (reference:
eval_experiment/eval_point_cloud.py:10-144 and its baseline twin): the
per-pose eval_frame loop becomes one batched program returning, per pose,
{collision, multi_objects, antipodal_score} with the inference-side
thresholds (processing_config.py:33-46).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..configs import gripper_config as G
from ..configs import processing_config as P
from .collision import gripper_local_masks

Array = jax.Array


class EvalFrameResult(NamedTuple):
    collision: Array        # (G,) bool
    multi_objects: Array    # (G,) bool
    antipodal_score: Array  # (G,) float (0 when invalid)


def _antipodal(local: Array, local_normals: Array, close_region: Array
               ) -> Array:
    """Batched antipodal score (reference eval_point_cloud.py:39-62):
    product of mean |n . +-y| in the left/right contact bands."""
    y = local[..., 1, :]
    ninf = jnp.asarray(-jnp.inf, local.dtype)
    left_y = jnp.max(jnp.where(close_region, y, ninf), axis=-1)
    right_y = -jnp.max(jnp.where(close_region, -y, ninf), axis=-1)
    depth = jnp.minimum((left_y - right_y) / 3.0, P.NEIGHBOR_DEPTH)
    left_band = close_region & (y > (left_y - depth)[..., None])
    right_band = close_region & (y < (right_y + depth)[..., None])
    ny = jnp.abs(local_normals[..., 1, :])

    def mean_masked(mask):
        s = jnp.sum(jnp.where(mask, ny, 0.0), axis=-1)
        return s / jnp.maximum(jnp.sum(mask, axis=-1), 1)

    return mean_masked(left_band) * mean_masked(right_band)


@jax.jit
def eval_frames(global_to_local: Array, cloud: Array, normals: Array,
                labels: Array, valid: Array | None = None
                ) -> EvalFrameResult:
    """Evaluate G grasp poses against a labeled scene cloud.

    Args:
        global_to_local: (G, 4, 4); cloud: (N, 3); normals: (N, 3);
        labels: (N,) int object labels; valid: optional (N,) mask.

    Returns:
        EvalFrameResult — antipodal_score is zero for poses that collide,
        span multiple objects, or close on < CLOSE_REGION_MIN_POINTS points
        (reference eval_point_cloud.py:64-113).
    """
    homo = jnp.concatenate(
        [cloud.T, jnp.ones((1, cloud.shape[0]), cloud.dtype)])
    local = jnp.einsum("gij,jn->gin", global_to_local, homo)[:, :3]
    local_n = jnp.einsum("gij,jn->gin", global_to_local[:, :3, :3], normals.T)
    masks = gripper_local_masks(local, valid)

    back_count = jnp.sum(masks["back"], axis=-1)
    finger_count = jnp.sum(masks["fingers"], axis=-1)
    collision = ((back_count > P.BACK_COLLISION_THRESHOLD)
                 | (finger_count > P.FINGER_COLLISION_THRESHOLD))

    close = masks["close_region"]
    lab = labels[None, :]
    big = jnp.asarray(2 ** 30, labels.dtype)
    lab_min = jnp.min(jnp.where(close, lab, big), axis=-1)
    lab_max = jnp.max(jnp.where(close, lab, -big), axis=-1)
    multi_objects = lab_min != lab_max

    count = jnp.sum(close, axis=-1)
    enough = count >= P.CLOSE_REGION_MIN_POINTS
    score = _antipodal(local, local_n, close)
    score = jnp.where(enough & ~collision & ~multi_objects, score, 0.0)
    return EvalFrameResult(collision, multi_objects, score)
