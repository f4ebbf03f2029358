"""Point-cloud training augmentations.

The reference exposes TRAIN.AUGMENTATION as '"method" or ("method", *args)'
tuples (reference: yacs_config.py:149-151, e.g. ("PointCloudRotate",
("PointCloudRotatePerturbation", 0.1, 0.2))) plus DATA.STD_R / STD_T noise
scales (yacs_config.py:28-29), but ships no augmentation implementations.
This module provides the implied standard PointNet++ set, applied
consistently to the points AND the SE(3) labels:

* PointCloudRotate           — random rotation about the camera/up axis
* PointCloudRotatePerturbation(angle_sigma, angle_clip) — small random
  rotations about all three axes
* PointCloudTranslate(std)   — global translation noise
* PointCloudJitter(std)      — per-point jitter (points only; frames keep
  their labels, matching the noise-vs-clean split of the data generator)

All transforms are pure jnp (jittable, batched) and rotate `best_frame_R`
(flattened row-major 3x3, channels-first) together with the cloud.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _rot_z(angle: Array) -> Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    zero, one = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([c, -s, zero], -1),
        jnp.stack([s, c, zero], -1),
        jnp.stack([zero, zero, one], -1)], -2)


def _rot_xyz(angles: Array) -> Array:
    """(..., 3) euler angles -> (..., 3, 3) Rz @ Ry @ Rx."""
    ax, ay, az = angles[..., 0], angles[..., 1], angles[..., 2]
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    zero, one = jnp.zeros_like(ax), jnp.ones_like(ax)
    rx = jnp.stack([jnp.stack([one, zero, zero], -1),
                    jnp.stack([zero, cx, -sx], -1),
                    jnp.stack([zero, sx, cx], -1)], -2)
    ry = jnp.stack([jnp.stack([cy, zero, sy], -1),
                    jnp.stack([zero, one, zero], -1),
                    jnp.stack([-sy, zero, cy], -1)], -2)
    rz = jnp.stack([jnp.stack([cz, -sz, zero], -1),
                    jnp.stack([sz, cz, zero], -1),
                    jnp.stack([zero, zero, one], -1)], -2)
    return rz @ ry @ rx


def _apply_rotation(batch: dict, rot: Array) -> dict:
    """rot: (B, 3, 3) applied to scene_points (B, 3, N) and best_frame_R
    (B, 9, Nf) / best_frame_t when present."""
    out = dict(batch)
    out["scene_points"] = jnp.einsum("bij,bjn->bin", rot,
                                     batch["scene_points"])
    if "best_frame_R" in batch:
        r = batch["best_frame_R"]
        b, _, nf = r.shape
        r33 = jnp.swapaxes(r, 1, 2).reshape(b, nf, 3, 3)
        r33 = jnp.einsum("bij,bnjk->bnik", rot, r33)
        out["best_frame_R"] = jnp.swapaxes(r33.reshape(b, nf, 9), 1, 2)
    if "best_frame_t" in batch and batch["best_frame_t"].ndim == 3:
        out["best_frame_t"] = jnp.einsum("bij,bjn->bin", rot,
                                         batch["best_frame_t"])
    return out


def point_cloud_rotate(key: Array, batch: dict) -> dict:
    """Uniform random rotation about the z (up) axis."""
    b = batch["scene_points"].shape[0]
    angle = jax.random.uniform(key, (b,), minval=0.0,
                               maxval=2.0 * jnp.pi)
    return _apply_rotation(batch, _rot_z(angle))


def point_cloud_rotate_perturbation(key: Array, batch: dict,
                                    angle_sigma: float = 0.06,
                                    angle_clip: float = 0.18) -> dict:
    b = batch["scene_points"].shape[0]
    angles = jnp.clip(
        angle_sigma * jax.random.normal(key, (b, 3)),
        -angle_clip, angle_clip)
    return _apply_rotation(batch, _rot_xyz(angles))


def point_cloud_translate(key: Array, batch: dict, std: float = 0.02) -> dict:
    b = batch["scene_points"].shape[0]
    shift = std * jax.random.normal(key, (b, 3))
    out = dict(batch)
    out["scene_points"] = batch["scene_points"] + shift[:, :, None]
    if "best_frame_t" in batch and batch["best_frame_t"].ndim == 3:
        out["best_frame_t"] = batch["best_frame_t"] + shift[:, :, None]
    return out


def point_cloud_jitter(key: Array, batch: dict, std: float = 0.002,
                       clip: float = 0.01) -> dict:
    pts = batch["scene_points"]
    noise = jnp.clip(std * jax.random.normal(key, pts.shape), -clip, clip)
    out = dict(batch)
    out["scene_points"] = pts + noise
    return out


_REGISTRY = {
    "PointCloudRotate": point_cloud_rotate,
    "PointCloudRotatePerturbation": point_cloud_rotate_perturbation,
    "PointCloudTranslate": point_cloud_translate,
    "PointCloudJitter": point_cloud_jitter,
}


def build_augmentation(spec: Sequence):
    """TRAIN.AUGMENTATION tuples -> one jittable (key, batch) -> batch fn.

    Accepts the reference format: each entry is "Method" or
    ("Method", arg0, arg1, ...)."""
    steps: list[Tuple] = []
    for entry in spec or ():
        if isinstance(entry, str):
            name, args = entry, ()
        else:
            name, args = entry[0], tuple(entry[1:])
        if name not in _REGISTRY:
            raise ValueError(f"unknown augmentation {name!r}; "
                             f"options: {sorted(_REGISTRY)}")
        steps.append((_REGISTRY[name], args))

    def apply(key: Array, batch: dict) -> dict:
        for fn, args in steps:
            key, sub = jax.random.split(key)
            batch = fn(sub, batch, *args)
        return batch

    return apply
