"""Contact-pair grasp labeling (the "contact" data flavour).

Re-design of GenerateContactObjectData (reference:
data_generator/data_object_contact_point_generator.py:21-221):

1. cache_contact_pairs — antipodal point pairs: within gripper opening
   (|p_i - p_j| < 2*HALF_BOTTOM_SPACE) and with the pair axis aligned to
   both normals (|cos_i * cos_j| > 0.95) (:103-123);
2. pair frames — y = pair axis, x = world-y Gram-Schmidt'd off it,
   z = x cross y, origin = pair midpoint (:137-152);
3. per frame x 12 thetas (rotation about the local y axis, with the gripper
   pulled back by FINGER_LENGTH - GASKET_RADIUS) x dz in {-0.015, +0.015, 0}:
   back/finger collision + close-region population, accumulated over dz and
   capped by the nominal dz (:167-221) — here one batched TPU program.

Output layout matches the reference pickle: cloud, normal, global_to_local
frames, search_score, antipodal_score, frame_point_index.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..configs import gripper_config as G
from .grading import DATAGEN_BOTTOM_LENGTH

Array = jax.Array

GASKET_RADIUS = 0.012
COS_THRESHOLD = 0.95
THETA_SEARCH = tuple(np.deg2rad(t) for t in range(0, 360, 30))
THETA_NUM = len(THETA_SEARCH)
DW_SEARCH = (-0.015, 0.015, 0.0)
CLOSE_MIN = 50


def contact_search_transforms() -> Tuple[np.ndarray, np.ndarray]:
    """(local_search_to_local, local_to_local_search), each (12, 4, 4):
    rotation about the local y axis composed with a pull-back of
    FINGER_LENGTH - GASKET_RADIUS along x (reference :28-40)."""
    move_back = np.eye(4)
    move_back[0, 3] = -(G.FINGER_LENGTH - GASKET_RADIUS)
    ls2l = np.tile(np.eye(4), (THETA_NUM, 1, 1))
    for i, theta in enumerate(THETA_SEARCH):
        c, s = np.cos(theta), np.sin(theta)
        ls2l[i, 0, 0] = c
        ls2l[i, 2, 2] = c
        ls2l[i, 0, 2] = s
        ls2l[i, 2, 0] = -s
    ls2l = ls2l @ move_back
    return (ls2l.astype(np.float32),
            np.linalg.inv(ls2l).astype(np.float32))


def cache_contact_pairs(points: np.ndarray, normals: np.ndarray,
                        max_pairs: int | None = None,
                        rng: np.random.RandomState | None = None
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Antipodal pair candidates (host numpy; O(N^2) on ~2k points).

    Returns (row_index, col_index, antipodal_score)."""
    diff = points[None, :, :] - points[:, None, :]
    dist = np.linalg.norm(diff, axis=2)
    within = dist < G.HALF_BOTTOM_SPACE * 2
    axis = diff / np.clip(dist[..., None], 1e-4, None)
    cos = np.einsum("ijk,ik->ij", axis, normals)     # cos at point i
    avg_cos = np.abs(cos * cos.T)
    valid = np.triu(within & (avg_cos > COS_THRESHOLD), k=1)
    row, col = np.nonzero(valid)
    score = avg_cos[row, col]
    if max_pairs is not None and len(row) > max_pairs:
        rng = rng or np.random.RandomState(0)
        keep = rng.choice(len(row), max_pairs, replace=False)
        row, col, score = row[keep], col[keep], score[keep]
    return row, col, score.astype(np.float32)


def pair_frames(points: np.ndarray, row: np.ndarray, col: np.ndarray
                ) -> np.ndarray:
    """(P, 4, 4) local-to-global pair frames (reference :137-152)."""
    y = points[col] - points[row]
    y = y / np.clip(np.linalg.norm(y, axis=1, keepdims=True), 1e-8, None)
    ref_x = np.array([0.0, 1.0, 0.0])
    x = ref_x[None, :] - np.sum(ref_x * y, axis=1, keepdims=True) * y
    x = x / np.clip(np.linalg.norm(x, axis=1, keepdims=True), 1e-8, None)
    z = np.cross(x, y)
    frames = np.tile(np.eye(4, dtype=np.float32), (len(row), 1, 1))
    frames[:, :3, 0] = x
    frames[:, :3, 1] = y
    frames[:, :3, 2] = z
    frames[:, :3, 3] = (points[row] + points[col]) / 2
    return frames


@functools.partial(jax.jit, static_argnums=(2,))
def grade_contact_pairs(g2l: Array, points_homo: Array, chunk: int = 32):
    """Grade P pair frames x 12 thetas against the object cloud.

    Args:
        g2l: (P, 4, 4) global -> pair-local transforms.
        points_homo: (4, N).

    Returns:
        search (P, 12) float, valid (P, 12) bool — pose accepted when the
        dz-accumulated close count >= 50 AND the nominal-dz count >= 50
        (reference :212-217).
    """
    ls2l, l2ls = contact_search_transforms()
    l2ls = jnp.asarray(l2ls)                               # (12, 4, 4)

    p = g2l.shape[0]
    pad = (-p) % chunk
    g2l_p = jnp.pad(g2l, ((0, pad), (0, 0), (0, 0)))
    num_chunks = (p + pad) // chunk

    def per_chunk(g2l_c):
        local = jnp.einsum("cij,jn->cin", g2l_c, points_homo)   # (C, 4, N)
        y = local[:, 1, :]
        close_plane = (y < G.HALF_BOTTOM_SPACE) & (y > -G.HALF_BOTTOM_SPACE)
        plane_ok = jnp.sum(close_plane, axis=-1) >= CLOSE_MIN   # (C,)
        finger_plane = (((y < G.HALF_BOTTOM_WIDTH) & (y > G.HALF_BOTTOM_SPACE))
                        | ((y > -G.HALF_BOTTOM_WIDTH)
                           & (y < -G.HALF_BOTTOM_SPACE)))
        back_plane = finger_plane | close_plane

        search = jnp.einsum("tij,cjn->ctin", l2ls, local)       # (C,12,4,N)
        x, z = search[:, :, 0, :], search[:, :, 2, :]
        back_x = (x < 0.0) & (x > -DATAGEN_BOTTOM_LENGTH)
        finger_x = (x > 0.0) & (x < G.FINGER_LENGTH)

        acc = jnp.zeros(x.shape[:2])
        last_count = jnp.zeros(x.shape[:2])
        for dw in DW_SEARCH:
            z_ok = (z < G.HALF_HAND_THICKNESS + dw) & \
                   (z > -G.HALF_HAND_THICKNESS + dw)
            back = back_x & z_ok & back_plane[:, None, :]
            back_ok = jnp.sum(back, axis=-1) <= 0
            finger = finger_x & z_ok & finger_plane[:, None, :]
            finger_ok = jnp.sum(finger, axis=-1) <= 0
            close = finger_x & z_ok & close_plane[:, None, :]
            count = jnp.sum(close, axis=-1).astype(acc.dtype)
            count_ok = count >= CLOSE_MIN
            ok = back_ok & finger_ok & count_ok
            acc = acc + jnp.where(ok, count / 3.0, 0.0)
            last_count = jnp.where(back_ok & finger_ok, count, last_count)
        valid = (acc >= CLOSE_MIN) & (last_count >= CLOSE_MIN) \
            & plane_ok[:, None]
        return jnp.minimum(acc, last_count), valid

    chunks = g2l_p.reshape(num_chunks, chunk, 4, 4)
    search, valid = lax.map(per_chunk, chunks)
    return (search.reshape(-1, THETA_NUM)[:p],
            valid.reshape(-1, THETA_NUM)[:p])


def generate_contact_object_data(points: np.ndarray, normals: np.ndarray,
                                 max_pairs: int = 4096,
                                 rng: np.random.RandomState | None = None
                                 ) -> dict:
    """Full per-object contact labeling -> reference pickle layout
    (:66-76)."""
    rng = rng or np.random.RandomState(0)
    row, col, pair_score = cache_contact_pairs(points, normals,
                                               max_pairs=max_pairs, rng=rng)
    if len(row) == 0:
        return {"cloud": points, "normal": normals,
                "global_to_local": np.zeros((0, 4, 4), np.float32),
                "search_score": np.zeros((0,), np.float32),
                "antipodal_score": np.zeros((0,), np.float32),
                "frame_point_index": np.zeros((0,), np.int64)}
    frames_l2g = pair_frames(points, row, col)
    g2l = np.linalg.inv(frames_l2g.astype(np.float64)).astype(np.float32)
    homo = np.concatenate(
        [points.T, np.ones((1, len(points)))]).astype(np.float32)
    search, valid = grade_contact_pairs(jnp.asarray(g2l), jnp.asarray(homo))
    search, valid = np.asarray(search), np.asarray(valid)

    ls2l, l2ls = contact_search_transforms()
    out_frames, out_search, out_antip, out_index = [], [], [], []
    centers_l2g = frames_l2g[:, :3, 3]
    for pi, ti in zip(*np.nonzero(valid)):
        final_g2l = l2ls[ti] @ g2l[pi]
        out_frames.append(final_g2l)
        out_search.append(search[pi, ti])
        out_antip.append(pair_score[pi])
        # nearest cloud point to the frame centre (reference :80-86)
        center = np.linalg.inv(final_g2l)[0:3, 3]
        out_index.append(int(np.argmin(
            np.sum((points - center) ** 2, axis=1))))
    return {
        "cloud": points, "normal": normals,
        "global_to_local": (np.stack(out_frames)
                            if out_frames else np.zeros((0, 4, 4), np.float32)),
        "search_score": np.asarray(out_search, np.float32),
        "antipodal_score": np.asarray(out_antip, np.float32),
        "frame_point_index": np.asarray(out_index, np.int64),
    }
