"""Numpy oracles transcribing the reference data-gen grading semantics
(data_object_darboux_generator.py:62-247) for differential tests."""

import numpy as np

from s4g_tpu.datagen.grading import (DATAGEN_BACK_COLLISION_THRESHOLD,
                                     DATAGEN_BOTTOM_LENGTH,
                                     DATAGEN_CLOSE_REGION_MIN_POINTS,
                                     DATAGEN_FINGER_COLLISION_THRESHOLD,
                                     DATAGEN_NUM_POINTS_THRESHOLD,
                                     DZ_SEARCH, LENGTH_SEARCH, NEIGHBOR_DEPTH,
                                     THETA_SEARCH, search_grid_transforms)
from s4g_tpu.configs import gripper_config as G


def np_antipodal(close_cloud, close_normals):
    """reference: data_object_darboux_generator.py:223-247."""
    left_y = close_cloud[1].max()
    right_y = close_cloud[1].min()
    depth = min((left_y - right_y) / 3.0, NEIGHBOR_DEPTH)
    left = close_cloud[1] > left_y - depth
    right = close_cloud[1] < right_y + depth
    lt = np.abs(close_normals[1, left]).mean()
    rt = np.abs(close_normals[1, right]).mean()
    return lt * rt


def np_finger_hand_view(point, frame, cloud, normals):
    """reference: data_object_darboux_generator.py:131-221 (stateful dz loop
    reproduced; the released double-unpack bug at :179-180 is read as
    initializing all four accumulators to zero)."""
    num_l, num_t = len(LENGTH_SEARCH), len(THETA_SEARCH)
    search = np.zeros((num_l, num_t))
    antip = np.zeros((num_l, num_t))
    if np.mean(np.abs(frame)) < 1e-6:
        return search, antip

    t_l2g = np.eye(4)
    t_l2g[:3, :3] = frame
    t_l2g[:3, 3] = point
    g2l = np.linalg.inv(t_l2g)
    homo = np.concatenate([cloud.T, np.ones((1, cloud.shape[0]))])
    local = g2l @ homo
    local_n = g2l[:3, :3] @ normals.T
    grid = search_grid_transforms()

    for dl_num, dl in enumerate(LENGTH_SEARCH):
        close = ((local[0] < dl + G.FINGER_LENGTH)
                 & (local[0] > dl - DATAGEN_BOTTOM_LENGTH))
        if close.sum() < DATAGEN_NUM_POINTS_THRESHOLD:
            continue
        pts_close = local[:, close]
        n_close = local_n[:, close]
        for t_num in range(num_t):
            g = grid[dl_num * num_t + t_num]
            sp = (g @ pts_close)[:3]
            back_xy = ((sp[1] < G.HALF_BOTTOM_WIDTH)
                       & (sp[1] > -G.HALF_BOTTOM_WIDTH) & (sp[0] < 0.0))
            band_y = (((sp[1] < G.HALF_BOTTOM_WIDTH)
                       & (sp[1] > G.HALF_BOTTOM_SPACE))
                      | ((sp[1] > -G.HALF_BOTTOM_WIDTH)
                         & (sp[1] < -G.HALF_BOTTOM_SPACE)))
            temp_search = temp_antip = 0.0
            crpn = single_antip = 0.0
            for dz in DZ_SEARCH:
                z_ok = ((sp[2] < G.HALF_HAND_THICKNESS + dz)
                        & (sp[2] > -G.HALF_HAND_THICKNESS + dz))
                if (back_xy & z_ok).sum() > DATAGEN_BACK_COLLISION_THRESHOLD:
                    continue
                if (band_y & z_ok).sum() > DATAGEN_FINGER_COLLISION_THRESHOLD:
                    continue
                close_region = (z_ok & (sp[1] < G.HALF_BOTTOM_SPACE)
                                & (sp[1] > -G.HALF_BOTTOM_SPACE))
                crpn = float(close_region.sum())
                if crpn < DATAGEN_CLOSE_REGION_MIN_POINTS:
                    continue
                cr_normals = (g[:3, :3] @ n_close)[:, close_region]
                cr_cloud = sp[:, close_region]
                single_antip = np_antipodal(cr_cloud, cr_normals)
                temp_antip += single_antip / 3.0
                temp_search += crpn / 3.0
            search[dl_num, t_num] = min(temp_search, crpn)
            antip[dl_num, t_num] = min(temp_antip, single_antip)
    return search, antip


def np_darboux_frame(points, normals, index, radius):
    """reference: data_object_darboux_generator.py:62-92 for one point."""
    d = np.linalg.norm(points - points[index], axis=1)
    idx = np.nonzero(d <= radius)[0]
    if len(idx) < 5:
        return np.zeros((3, 3)), np.zeros((3, 3))
    normal = normals[idx].mean(0)
    normal /= np.linalg.norm(normal)
    m = np.eye(3) - np.outer(normal, normal)
    projected = m @ normals[idx].T
    centroid = projected.mean(1, keepdims=True)
    diff = projected - centroid
    cov = diff @ diff.T
    vals, vecs = np.linalg.eigh(cov)
    # The released reference takes vecs[:, 0] — the null-space eigenvector of
    # the projected covariance (parallel to the normal), making the minor
    # axis pure numerical noise.  The oracle encodes the intended semantics
    # (smallest IN-PLANE eigenvector), matching the implementation's
    # documented divergence.
    align = np.abs(vecs.T @ normal)
    vals_pen = np.where(align > 0.5, vals + vals.max() + 1.0, vals)
    minor = vecs[:, np.argmin(vals_pen)]
    minor = minor - (minor @ normal) * normal
    minor /= np.linalg.norm(minor)
    principal = np.cross(minor, normal)
    frame = np.stack([-normal, -principal, minor], axis=1)
    inv_frame = np.stack([normal, principal, minor], axis=1)
    return frame, inv_frame
