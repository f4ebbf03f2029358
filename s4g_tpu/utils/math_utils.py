"""SE(3) math utilities (numpy + jnp twins).

Functional re-design of the reference's math helpers (reference:
inference/grasp_proposal/utils/math_utils.py:5-41): fast inverses for rigid
transforms and homogeneous point transforms.  The jnp variants are pure and
jittable; batched by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def transformation_inv(transformation: np.ndarray) -> np.ndarray:
    """Inverse of a single SE(3) matrix (numpy), avoiding a general inverse."""
    assert transformation.shape == (4, 4), transformation.shape
    result = np.eye(4, dtype=transformation.dtype)
    rot_inv = transformation[:3, :3].T
    result[:3, :3] = rot_inv
    result[:3, 3:4] = -rot_inv @ transformation[:3, 3:4]
    return result


def transform_numpy_points(cloud_array: np.ndarray, transformation_matrix) -> np.ndarray:
    """Apply a 4x4 transform to a (3, N) numpy cloud, returning (3, N)."""
    assert cloud_array.shape[0] == 3 and cloud_array.ndim == 2
    homo = np.concatenate(
        [cloud_array, np.ones([1, cloud_array.shape[1]], dtype=cloud_array.dtype)], axis=0)
    return (transformation_matrix @ homo)[:3, :]


def batch_transformation_inv(transformation: jnp.ndarray) -> jnp.ndarray:
    """Inverse of batched SE(3) matrices, (..., 4, 4) -> (..., 4, 4). Jittable."""
    rot_inv = jnp.swapaxes(transformation[..., :3, :3], -1, -2)
    t = transformation[..., :3, 3:]
    # HIGHEST: TPU default f32 matmul truncates operands to bf16.
    top = jnp.concatenate(
        [rot_inv, -jnp.matmul(rot_inv, t,
                              precision=jax.lax.Precision.HIGHEST)],
        axis=-1)                                             # (..., 3, 4)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=transformation.dtype),
        transformation.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def transform_points(points: jnp.ndarray, transformation: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 transform to (..., 3, N) points (jnp), returning (..., 3, N)."""
    rot = transformation[..., :3, :3]
    t = transformation[..., :3, 3:]
    return jnp.matmul(rot, points,
                      precision=jax.lax.Precision.HIGHEST) + t


def gram_schmidt_frames(rotation9: jnp.ndarray) -> jnp.ndarray:
    """Orthogonalize raw 9-D rotation predictions, batched.

    Args:
        rotation9: (..., 3, 3) raw rotation columns [x | y | z] (z ignored).

    Returns:
        (..., 3, 3) proper rotations: x normalized, y Gram-Schmidt vs x,
        z = x×y.  Matches the post-processing rule of the reference
        (grasp_detector.py:124-135 / file_logger_cls.py:206-214).
    """
    # Degenerate raw predictions (zero x, or y parallel to x — random-init
    # nets produce them) would divide by ~0 and yield NaN / non-orthonormal
    # frames; fall back to fixed basis vectors so the output is always a
    # proper rotation.
    eps = jnp.asarray(1e-6, rotation9.dtype)
    x = rotation9[..., :, 0]
    x_norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    e0 = jnp.zeros_like(x).at[..., 0].set(1.0)
    x = jnp.where(x_norm > eps, x / jnp.maximum(x_norm, eps), e0)
    y = rotation9[..., :, 1]
    y = y - jnp.sum(x * y, axis=-1, keepdims=True) * x
    y_norm = jnp.linalg.norm(y, axis=-1, keepdims=True)
    # Fallback y: whichever of e1/e2 is less aligned with x, re-orthogonalized.
    alt = jnp.zeros_like(x).at[..., 1].set(1.0)
    alt2 = jnp.zeros_like(x).at[..., 2].set(1.0)
    alt = jnp.where(
        jnp.abs(jnp.sum(x * alt, axis=-1, keepdims=True)) < 0.9, alt, alt2)
    alt = alt - jnp.sum(x * alt, axis=-1, keepdims=True) * x
    alt = alt / jnp.maximum(jnp.linalg.norm(alt, axis=-1, keepdims=True), eps)
    y = jnp.where(y_norm > eps, y / jnp.maximum(y_norm, eps), alt)
    # "Twice is enough" re-orthogonalization: when the raw y is nearly
    # parallel to x (common for untrained heads), the first projection
    # cancels catastrophically and leaves an O(eps_f32 * |y| / |residual|)
    # error (measured up to 4e-3); a second pass removes it (~4e-6).
    y = y - jnp.sum(x * y, axis=-1, keepdims=True) * x
    y = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), eps)
    z = jnp.cross(x, y)
    return jnp.stack([x, y, z], axis=-1)


def poses_from_rt(rotation: jnp.ndarray, translation: jnp.ndarray) -> jnp.ndarray:
    """Assemble (..., 4, 4) homogeneous poses from (..., 3, 3) R and (..., 3) t."""
    top = jnp.concatenate([rotation, translation[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=rotation.dtype),
        rotation.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)
