"""Differential tests for contact-object refinement + smoothing.

The oracle transcribes the reference per-frame python loop
(data_gen/utils/refine_contact_object.py:71-97) in numpy; the subject is the
batched implementation in s4g_tpu.datagen.refine_contact.
"""

import numpy as np
import pytest

from s4g_tpu.configs import gripper_config as G
from s4g_tpu.datagen.grading import DATAGEN_BOTTOM_LENGTH
from s4g_tpu.datagen.refine_contact import (
    HEIGHT_SEARCH, LENGTH_SEARCH, MIN_REFINE_SCORE, WIDTH_SEARCH,
    SMOOTH_FRAME_PER_POINT, SMOOTH_MAX_NEIGHBOR_FRAME,
    SMOOTH_MIN_SEARCH_SCORE, refine_contact_object, smooth_contact_object)


def oracle_refine_one(frame, homo_cloud):
    """Transcription of check_single_collision (refine_contact_object.py:71-97)."""
    result = 9999
    local_cloud = frame @ homo_cloud
    for dz in HEIGHT_SEARCH:
        z_bool = ((local_cloud[2] < G.HALF_HAND_THICKNESS + dz)
                  & (local_cloud[2] > -G.HALF_HAND_THICKNESS + dz))
        for dy in WIDTH_SEARCH:
            y_bool = ((local_cloud[1] < G.HALF_BOTTOM_SPACE + dy)
                      & (local_cloud[1] > -G.HALF_BOTTOM_SPACE + dy))
            abs_y = np.abs(local_cloud[1] + dy)
            y_col = (abs_y > G.HALF_BOTTOM_SPACE) & (abs_y < G.HALF_BOTTOM_WIDTH)
            for dx in LENGTH_SEARCH:
                x_bool = ((local_cloud[0] > -DATAGEN_BOTTOM_LENGTH + dx)
                          & (local_cloud[0] < G.FINGER_LENGTH + dx))
                if (z_bool & x_bool & y_col).sum() > 0:
                    return None
                close = x_bool & z_bool & y_bool
                n = close.sum()
                if n < MIN_REFINE_SCORE:
                    return None
                if local_cloud[0, close].min() < 0:
                    return None
                result = min(result, n)
    return result


@pytest.fixture(scope="module")
def dense_object():
    """A dense flat slab graspable from above, plus candidate frames."""
    rng = np.random.RandomState(0)
    n = 4000
    # Slab sized so frames are judged mostly by the min-x (behind-palm) and
    # close-region-count rules: x in [0.005, 0.05] (inside the finger sweep),
    # |y| <= 0.02 (inside the 0.034 m half-space, clear of the 0.034-0.057
    # collision band), |z| <= 0.003 (inside the +-0.012 hand thickness).
    cloud = np.stack([
        rng.uniform(0.005, 0.05, n),
        rng.uniform(-0.02, 0.02, n),
        rng.uniform(-0.003, 0.003, n),
    ], axis=1).astype(np.float32)
    normal = np.tile(np.array([0, 0, 1.0], np.float32), (n, 1))

    frames = []
    rng2 = np.random.RandomState(1)
    for _ in range(48):
        # global->local: small rotation about z + x/z offsets. Negative x
        # offsets push slab points behind the palm (min-x rejection);
        # z offsets shrink the close region (count rejection).
        th = rng2.uniform(-0.1, 0.1)
        c, s = np.cos(th), np.sin(th)
        f = np.eye(4, dtype=np.float32)
        f[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        f[0, 3] = rng2.uniform(-0.02, 0.02)
        f[2, 3] = rng2.uniform(-0.006, 0.006)
        frames.append(f)
    frames = np.stack(frames)
    return cloud, normal, frames


def test_refine_matches_oracle(dense_object):
    cloud, normal, frames = dense_object
    homo = np.concatenate([cloud.T, np.ones((1, len(cloud)))])
    data = {
        "cloud": cloud, "normal": normal, "global_to_local": frames,
        "search_score": np.full(len(frames), MIN_REFINE_SCORE + 1.0),
        "antipodal_score": np.linspace(0.3, 0.9, len(frames)),
        "frame_point_index": np.arange(len(frames)),
    }
    out = refine_contact_object(data, chunk=16)

    expected_scores, expected_idx = [], []
    for i, f in enumerate(frames):
        r = oracle_refine_one(f, homo)
        if r:
            expected_scores.append(r)
            expected_idx.append(i)
    assert len(expected_idx) > 0, "fixture produced no surviving frames"
    assert len(expected_idx) < len(frames), "fixture rejected nothing"
    np.testing.assert_array_equal(out["frame_point_index"],
                                  np.asarray(expected_idx))
    np.testing.assert_array_equal(out["search_score"],
                                  np.asarray(expected_scores, np.float64))
    np.testing.assert_allclose(
        out["antipodal_score"],
        data["antipodal_score"][np.asarray(expected_idx)])


def test_refine_prefilters_low_search_score(dense_object):
    cloud, normal, frames = dense_object
    data = {
        "cloud": cloud, "normal": normal, "global_to_local": frames,
        "search_score": np.full(len(frames), 1.0),  # all below threshold
        "antipodal_score": np.ones(len(frames)),
        "frame_point_index": np.arange(len(frames)),
    }
    out = refine_contact_object(data)
    assert len(out["global_to_local"]) == 0
    assert out["search_score"].shape == (0,)


def test_smooth_caps_and_redistributes():
    # 3 points: p0 carries 12 frames (> cap, > 5 extras), p1 within 1 cm
    # (receives extras), p2 far away (untouched, keeps its 2 frames).
    cloud = np.array([[0, 0, 0], [0.005, 0, 0], [1, 1, 1.0]])
    normal = np.tile([0, 0, 1.0], (3, 1))
    f_count = 14
    frames = np.tile(np.eye(4), (f_count, 1, 1))
    frames[:, 0, 3] = np.arange(f_count)  # distinguishable
    point_index = np.array([0] * 12 + [2] * 2)
    search = np.full(f_count, SMOOTH_MIN_SEARCH_SCORE + 10.0)
    data = {"cloud": cloud, "normal": normal, "global_to_local": frames,
            "search_score": search,
            "antipodal_score": np.arange(f_count, dtype=float),
            "frame_point_index": point_index}
    out = smooth_contact_object(data)

    idx = out["frame_point_index"]
    # p0 keeps exactly the budget
    assert (idx == 0).sum() == SMOOTH_FRAME_PER_POINT
    # p1 had none; receives redistributed extras up to MAX_NEIGHBOR_FRAME
    assert 1 <= (idx == 1).sum() <= SMOOTH_MAX_NEIGHBOR_FRAME
    # p2 keeps its own 2
    assert (idx == 2).sum() == 2
    # the reference quirks: extras start at frame FRAME_PER_POINT of p0's
    # list, AND the extra index is keyed to the KD-neighbour slot (self
    # occupies slot 0), so the first real neighbour gets extra #1.
    first_extra = out["global_to_local"][idx == 1][0]
    assert first_extra[0, 3] == SMOOTH_FRAME_PER_POINT + 1
    # every redistributed frame is one of p0's originals
    assert set(out["global_to_local"][idx == 1][:, 0, 3]) <= set(range(12))


def test_smooth_filters_min_search():
    cloud = np.zeros((2, 3))
    frames = np.tile(np.eye(4), (3, 1, 1))
    data = {"cloud": cloud, "normal": cloud.copy(),
            "global_to_local": frames,
            "search_score": np.array([10.0, 60.0, 60.0]),
            "antipodal_score": np.ones(3),
            "frame_point_index": np.array([0, 0, 1])}
    out = smooth_contact_object(data)
    assert len(out["global_to_local"]) == 2
    np.testing.assert_array_equal(out["frame_point_index"], [0, 1])
