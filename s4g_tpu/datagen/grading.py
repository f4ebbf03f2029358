"""Grasp-quality grading kernels (TPU, fully vectorized).

Re-design of the reference's per-point python loops:
* normal estimation + Darboux frames (reference:
  data_generator/data_object_darboux_generator.py:62-92) — batched 3x3
  eigendecompositions over fixed-capacity neighbourhoods;
* gripper-pose grading "finger_hand_view" (reference:
  data_object_darboux_generator.py:131-221) — ONE program over
  (points x lengths x thetas x dz) instead of a triple python loop: the
  scene cloud is transformed into every candidate gripper frame by a single
  batched einsum, and every collision/close-region/antipodal term is a
  masked reduction.

Stateful quirks of the reference dz loop are reproduced exactly (documented
at _reduce_dz): contributions average over dz in {-0.02, +0.02, 0} and are
capped by the LAST dz that reached the corresponding stage.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..configs import gripper_config as G

Array = jax.Array

# Data-gen geometry constants (reference: data_gen/configs/config.py:17-56).
# The data-gen gripper uses a SHORTER bottom (0.08 vs inference 0.16) and
# looser thresholds.
DATAGEN_BOTTOM_LENGTH = 0.08
DATAGEN_NUM_POINTS_THRESHOLD = 8
DATAGEN_BACK_COLLISION_THRESHOLD = 0.0
DATAGEN_FINGER_COLLISION_THRESHOLD = 0
DATAGEN_CLOSE_REGION_MIN_POINTS = 10
NEIGHBOR_DEPTH = 0.005
LENGTH_SEARCH = (-0.08, -0.06, -0.04, -0.02)
THETA_SEARCH = tuple(t / 57.29578 for t in range(-90, 90, 15))
DZ_SEARCH = (-0.02, 0.02, 0.0)


def search_grid_transforms(length_search=LENGTH_SEARCH,
                           theta_search=THETA_SEARCH) -> np.ndarray:
    """LOCAL_TO_LOCAL_SEARCH grid (reference: data_gen/configs/config.py:67-85):
    translate -length along x, rotate theta about x.  (L*T, 4, 4)."""
    grids = []
    for length in length_search:
        for theta in theta_search:
            m = np.eye(4)
            m[0, 3] = -length
            c, s = np.cos(theta), np.sin(theta)
            m[1, 1] = c
            m[2, 2] = c
            m[1, 2] = s
            m[2, 1] = -s
            grids.append(m)
    return np.asarray(grids, np.float32)


# -----------------------------------------------------------------------------
# Normals + Darboux frames
# -----------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(1, 2))
def _radius_neighbors(points: Array, radius: float, k: int):
    """First-k neighbours within radius (scan order), slot-0 fill.

    points: (N, 3) -> (index (N, k), count (N,)).
    """
    from ..ops.neighbors import ball_query
    pts_cf = points.T[None]
    return jax.tree.map(lambda x: x[0],
                        tuple(ball_query(pts_cf, pts_cf, radius, k)))


@functools.partial(jax.jit, static_argnums=(2, 3))
def estimate_normals(points: Array, camera_location: Array,
                     radius: float = 0.01, max_nn: int = 30) -> Array:
    """Normal estimation via local covariance (Open3D-equivalent semantics:
    smallest-eigenvector of the neighbourhood covariance, oriented TOWARD the
    camera location).  points (N, 3) -> normals (N, 3)."""
    idx, count = _radius_neighbors(points, radius, max_nn)
    nbr = points[idx]                              # (N, k, 3)
    k = idx.shape[1]
    slot_valid = (jnp.arange(k)[None, :] < count[:, None])[..., None]
    w = slot_valid.astype(points.dtype)
    denom = jnp.maximum(count[:, None, None], 1).astype(points.dtype)
    mean = jnp.sum(nbr * w, axis=1, keepdims=True) / denom
    diff = (nbr - mean) * w
    cov = jnp.einsum("nki,nkj->nij", diff, diff)
    _, vecs = jnp.linalg.eigh(cov)
    normal = vecs[:, :, 0]                         # smallest eigenvalue
    to_cam = camera_location[None, :] - points
    sign = jnp.where(jnp.sum(normal * to_cam, axis=1, keepdims=True) < 0,
                     -1.0, 1.0)
    return normal * sign


@functools.partial(jax.jit, static_argnums=(2, 3))
def darboux_frames(points: Array, normals: Array,
                   curvature_radius: float = 0.01, max_nn: int = 64
                   ) -> Tuple[Array, Array]:
    """Darboux frame per point (reference:
    data_object_darboux_generator.py:62-92).

    Columns are [x, y, z] = [-normal, -principal_curvature, minor_curvature];
    inv_frame negates x and y.  Points with < 5 neighbours inside
    curvature_radius get zero frames.

    Args:
        points: (N, 3); normals: (N, 3) (unit, any orientation convention).
    Returns:
        frames (N, 3, 3), inv_frames (N, 3, 3).
    """
    idx, count = _radius_neighbors(points, curvature_radius, max_nn)
    nbr_normals = normals[idx]                      # (N, k, 3)
    k = idx.shape[1]
    w = ((jnp.arange(k)[None, :] < count[:, None])[..., None]
         .astype(points.dtype))
    denom = jnp.maximum(count, 1).astype(points.dtype)       # (N,)

    mean_n = jnp.sum(nbr_normals * w, axis=1) / denom[:, None]
    mean_n = mean_n / jnp.maximum(
        jnp.linalg.norm(mean_n, axis=1, keepdims=True), 1e-12)

    # M = I - n n^T projects neighbour normals off the mean normal.
    eye = jnp.eye(3, dtype=points.dtype)
    m_proj = eye[None] - mean_n[:, :, None] * mean_n[:, None, :]
    projected = jnp.einsum("nij,nkj->nki", m_proj, nbr_normals)  # (N, k, 3)
    centroid = (jnp.sum(projected * w, axis=1, keepdims=True)
                / denom[:, None, None])
    diff = (projected - centroid) * w
    cov = jnp.einsum("nki,nkj->nij", diff, diff)
    vals, vecs = jnp.linalg.eigh(cov)

    # Minor-curvature axis = in-plane eigenvector with the SMALLEST in-plane
    # eigenvalue.  The projected covariance is rank-2 with its null space
    # along the mean normal; the reference literally takes eigvec[:, 0]
    # (data_object_darboux_generator.py:86), which IS that null direction, so
    # its minor axis is the normalized numerical residue of (n - (n.n)n) —
    # noise.  We implement the clear intent: skip eigenvectors parallel to
    # the normal and take the smallest remaining one.
    align = jnp.abs(jnp.einsum("nij,ni->nj", vecs, mean_n))  # (N, 3)
    big = jnp.max(vals, axis=1, keepdims=True) + 1.0
    penalized = jnp.where(align > 0.5, vals + big, vals)
    col = jnp.argmin(penalized, axis=1)
    minor = jnp.take_along_axis(vecs, col[:, None, None], axis=2)[:, :, 0]
    minor = minor - jnp.sum(minor * mean_n, axis=1, keepdims=True) * mean_n
    minor = minor / jnp.maximum(
        jnp.linalg.norm(minor, axis=1, keepdims=True), 1e-12)
    principal = jnp.cross(minor, mean_n)

    frames = jnp.stack([-mean_n, -principal, minor], axis=2)
    inv_frames = jnp.stack([mean_n, principal, minor], axis=2)
    ok = (count >= 5)[:, None, None]
    return jnp.where(ok, frames, 0.0), jnp.where(ok, inv_frames, 0.0)


# -----------------------------------------------------------------------------
# Vectorized finger_hand_view grading
# -----------------------------------------------------------------------------

def _region_masks(local: Array, dl: Array, dz: Array,
                  bottom_length: float):
    """Region booleans for gripper-local points.

    local: (..., 3, N); dl, dz broadcastable to (...).
    Returns close_plane, back, finger, close_region masks (..., N)."""
    x, y, z = local[..., 0, :], local[..., 1, :], local[..., 2, :]
    dl = dl[..., None]
    dz = dz[..., None]
    close_plane = (x < dl + G.FINGER_LENGTH) & (x > dl - bottom_length)
    z_ok = (z < G.HALF_HAND_THICKNESS + dz) & (z > -G.HALF_HAND_THICKNESS + dz)
    back = (close_plane & z_ok
            & (y < G.HALF_BOTTOM_WIDTH) & (y > -G.HALF_BOTTOM_WIDTH)
            & (x < 0.0))
    finger_y = (((y < G.HALF_BOTTOM_WIDTH) & (y > G.HALF_BOTTOM_SPACE))
                | ((y > -G.HALF_BOTTOM_WIDTH) & (y < -G.HALF_BOTTOM_SPACE)))
    finger = close_plane & z_ok & finger_y
    close_region = (close_plane & z_ok
                    & (y < G.HALF_BOTTOM_SPACE) & (y > -G.HALF_BOTTOM_SPACE))
    return close_plane, back, finger, close_region


def _antipodal_from_masks(local: Array, local_normals: Array,
                          close_region: Array) -> Array:
    """Vectorized antipodal score (reference:
    data_object_darboux_generator.py:223-247): product of mean |n . +-y|
    within the left/right contact bands of the close region.

    local: (..., 3, N); local_normals: (..., 3, N); close_region: (..., N).
    """
    y = local[..., 1, :]
    ninf = jnp.asarray(-jnp.inf, local.dtype)
    left_y = jnp.max(jnp.where(close_region, y, ninf), axis=-1)
    right_y = -jnp.max(jnp.where(close_region, -y, ninf), axis=-1)
    depth = jnp.minimum((left_y - right_y) / 3.0, NEIGHBOR_DEPTH)
    left_band = close_region & (y > (left_y - depth)[..., None])
    right_band = close_region & (y < (right_y + depth)[..., None])
    ny = jnp.abs(local_normals[..., 1, :])

    def mean_masked(mask):
        s = jnp.sum(jnp.where(mask, ny, 0.0), axis=-1)
        c = jnp.maximum(jnp.sum(mask, axis=-1), 1)
        return s / c

    return mean_masked(left_band) * mean_masked(right_band)


def _reduce_dz(reach, valid, counts, antipodals):
    """Reproduce the reference's stateful dz loop reduction
    (data_object_darboux_generator.py:179-218):

    * `count_last` / `antipodal_last` are the values of the LAST dz (in order
      [-0.02, +0.02, 0]) that reached the close-region stage (reach) /
      passed all checks (valid);
    * sums accumulate only over valid dz, divided by 3;
    * final search = min(sum/3, count_last); antipodal likewise.

    All inputs are (..., 3) over the dz axis.
    """
    def last_where(mask, values):
        out = jnp.zeros_like(values[..., 0])
        for d in range(mask.shape[-1]):
            out = jnp.where(mask[..., d], values[..., d], out)
        return out

    count_last = last_where(reach, counts)
    antip_last = last_where(valid, antipodals)
    sum_counts = jnp.sum(jnp.where(valid, counts, 0.0), axis=-1) / 3.0
    sum_antip = jnp.sum(jnp.where(valid, antipodals, 0.0), axis=-1) / 3.0
    search = jnp.minimum(sum_counts, count_last)
    antipodal = jnp.minimum(sum_antip, antip_last)
    return search, antipodal


@functools.partial(jax.jit, static_argnums=(4, 5))
def grade_frames(points: Array, normals: Array, frames: Array,
                 eval_points_homo: Array, chunk: int = 64,
                 bottom_length: float = DATAGEN_BOTTOM_LENGTH
                 ) -> Tuple[Array, Array]:
    """Grade every (point, frame) against the L x T x dz search grid.

    Args:
        points: (P, 3) grasp points (origins of the local frames).
        normals: (3, N) normals of the evaluated cloud.
        frames: (P, 3, 3) local frames (columns x/y/z).
        eval_points_homo: (4, N) homogeneous cloud to grade against.

    Returns:
        search_score (P, L, T) float, antipodal_score (P, L, T) float —
        the reference's per-point grading tensors
        (data_object_darboux_generator.py:104-128).
    """
    num_l, num_t, num_dz = len(LENGTH_SEARCH), len(THETA_SEARCH), len(DZ_SEARCH)
    grid = jnp.asarray(search_grid_transforms())           # (L*T, 4, 4)

    p = points.shape[0]
    pad = (-p) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    frs = jnp.pad(frames, ((0, pad), (0, 0), (0, 0)))
    num_chunks = (p + pad) // chunk

    def per_chunk(args):
        pts_c, frs_c = args                                 # (C,3), (C,3,3)
        # global->local: R^T, -R^T t
        rot_t = jnp.swapaxes(frs_c, 1, 2)                   # (C, 3, 3)
        trans = -jnp.einsum("cij,cj->ci", rot_t, pts_c)
        # local -> local_search for all grid poses: (C, LT, 3, 4)
        # combined = grid @ [R^T | t; 0 1]
        g2l = jnp.concatenate([rot_t, trans[..., None]], axis=-1)  # (C,3,4)
        bottom = jnp.broadcast_to(
            jnp.asarray([0., 0., 0., 1.], pts_c.dtype), (pts_c.shape[0], 1, 4))
        g2l44 = jnp.concatenate([g2l, bottom], axis=1)      # (C,4,4)
        combined = jnp.einsum("gij,cjk->cgik", grid, g2l44)  # (C,LT,4,4)
        local = jnp.einsum("cgij,jn->cgin", combined[:, :, :3, :],
                           eval_points_homo)                 # (C,LT,3,N)
        loc_norm = jnp.einsum("cgij,jn->cgin", combined[:, :, :3, :3],
                              normals)

        valid_frame = jnp.mean(jnp.abs(frs_c), axis=(1, 2)) > 1e-6  # (C,)

        search_dz, antip_dz, reach_dz, valid_dz = [], [], [], []
        # NOTE: `local` is already in the SEARCH frame (the grid translates by
        # -length along x), so the close-plane bounds use dl = 0 here; the
        # reference computes the same mask pre-rotation in the local frame
        # (x is invariant under the theta rotation about x).
        zero_dl = jnp.zeros((1, num_l * num_t), pts_c.dtype)
        for dz in list(np.asarray(DZ_SEARCH, np.float32)):
            dz_arr = jnp.full((1, num_l * num_t), dz, pts_c.dtype)
            close_plane, back, finger, close_region = _region_masks(
                local, zero_dl, dz_arr, bottom_length)
            plane_count = jnp.sum(close_plane, axis=-1)
            plane_ok = plane_count >= DATAGEN_NUM_POINTS_THRESHOLD
            back_ok = jnp.sum(back, axis=-1) <= DATAGEN_BACK_COLLISION_THRESHOLD
            finger_ok = (jnp.sum(finger, axis=-1)
                         <= DATAGEN_FINGER_COLLISION_THRESHOLD)
            count = jnp.sum(close_region, axis=-1).astype(pts_c.dtype)
            count_ok = count >= DATAGEN_CLOSE_REGION_MIN_POINTS
            reach = plane_ok & back_ok & finger_ok
            valid = reach & count_ok
            antip = _antipodal_from_masks(local, loc_norm, close_region)
            search_dz.append(count)
            antip_dz.append(jnp.where(valid, antip, 0.0))
            reach_dz.append(reach)
            valid_dz.append(valid)

        counts = jnp.stack(search_dz, axis=-1)              # (C, LT, 3)
        antips = jnp.stack(antip_dz, axis=-1)
        reach = jnp.stack(reach_dz, axis=-1)
        valid = jnp.stack(valid_dz, axis=-1)
        search, antipodal = _reduce_dz(reach, valid, counts, antips)
        search = jnp.where(valid_frame[:, None], search, 0.0)
        antipodal = jnp.where(valid_frame[:, None], antipodal, 0.0)
        return (search.reshape(-1, num_l, num_t),
                antipodal.reshape(-1, num_l, num_t))

    pts_chunks = pts.reshape(num_chunks, chunk, 3)
    frs_chunks = frs.reshape(num_chunks, chunk, 3, 3)
    search, antipodal = lax.map(per_chunk, (pts_chunks, frs_chunks))
    search = search.reshape(-1, num_l, num_t)[:p]
    antipodal = antipodal.reshape(-1, num_l, num_t)[:p]
    return search, antipodal


def antipodal_scores(local: Array, local_normals: Array,
                     close_region: Array) -> Array:
    """Public alias of the vectorized antipodal score."""
    return _antipodal_from_masks(local, local_normals, close_region)
