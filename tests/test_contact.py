"""Contact-pair labeling + grasp post-processing tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from s4g_tpu.configs import gripper_config as G
from s4g_tpu.datagen.contact import (cache_contact_pairs,
                                     contact_search_transforms,
                                     generate_contact_object_data,
                                     pair_frames)
from s4g_tpu.datagen.postprocess_grasps import (inverse_batch_pose,
                                                normalized_point_score,
                                                postprocess_single_object_grasps)
from test_datagen_grading import make_box_cloud


@pytest.fixture(scope="module")
def box():
    rng = np.random.RandomState(21)
    return make_box_cloud(rng, n_per_face=150, half=0.025)


class TestContactPairs:
    def test_pairs_are_antipodal(self, box):
        cloud, normals = box
        row, col, score = cache_contact_pairs(cloud, normals, max_pairs=512)
        assert len(row) > 0
        # pair axis aligned with both normals
        axis = cloud[col] - cloud[row]
        axis /= np.linalg.norm(axis, axis=1, keepdims=True)
        c1 = np.abs(np.sum(axis * normals[row], axis=1))
        c2 = np.abs(np.sum(axis * normals[col], axis=1))
        assert (c1 * c2 > 0.95).all()
        # within gripper opening
        d = np.linalg.norm(cloud[col] - cloud[row], axis=1)
        assert (d < 2 * G.HALF_BOTTOM_SPACE).all()
        np.testing.assert_allclose(score, c1 * c2, atol=1e-5)

    def test_pair_frames_orthonormal(self, box):
        cloud, normals = box
        row, col, _ = cache_contact_pairs(cloud, normals, max_pairs=128)
        frames = pair_frames(cloud, row, col)
        r = frames[:, :3, :3]
        eye = np.einsum("nij,nkj->nik", r, r)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (len(r), 1, 1)),
                                   atol=1e-5)
        # y column is the pair axis
        axis = cloud[col] - cloud[row]
        axis /= np.linalg.norm(axis, axis=1, keepdims=True)
        np.testing.assert_allclose(frames[:, :3, 1], axis, atol=1e-5)

    def test_search_transforms_roundtrip(self):
        ls2l, l2ls = contact_search_transforms()
        assert ls2l.shape == (12, 4, 4)
        np.testing.assert_allclose(
            np.einsum("tij,tjk->tik", ls2l, l2ls),
            np.tile(np.eye(4), (12, 1, 1)), atol=1e-5)

    def test_generate_contact_object_data(self, box):
        cloud, normals = box
        data = generate_contact_object_data(cloud, normals, max_pairs=512,
                                            rng=np.random.RandomState(0))
        g = len(data["search_score"])
        assert data["global_to_local"].shape == (g, 4, 4)
        assert data["frame_point_index"].shape == (g,)
        if g:
            assert data["search_score"].min() >= 50
            assert (data["frame_point_index"] >= 0).all()
            assert (data["frame_point_index"] < len(cloud)).all()


class TestPostProcess:
    def test_inverse_batch_pose(self):
        rng = np.random.RandomState(0)
        q, _ = np.linalg.qr(rng.randn(3, 3))
        pose = np.eye(4)
        pose[:3, :3] = q
        pose[:3, 3] = [0.1, 0.2, 0.3]
        inv = inverse_batch_pose(pose[None])[0]
        np.testing.assert_allclose(inv @ pose, np.eye(4), atol=1e-6)

    def test_normalized_score_range(self):
        s = normalized_point_score(np.array([10.0, 100.0, 400.0]),
                                   np.array([0.5, 0.9, 0.7]))
        assert s.min() == 0.0 and s.max() == 1.0

    def test_postprocess_caps_frames_per_point(self, box):
        cloud, normals = box
        rng = np.random.RandomState(1)
        g = 40
        frames = np.tile(np.eye(4, dtype=np.float32), (g, 1, 1))
        point_index = np.zeros(g, np.int64)  # all claim point 0
        out = postprocess_single_object_grasps({
            "cloud": cloud, "normal": normals,
            "global_to_local": frames,
            "search_score": np.full(g, 100.0),
            "frame_point_index": point_index})
        counts = np.bincount(out["grasp_point_index"],
                             minlength=len(cloud))
        assert counts.max() <= 1  # FRAME_PER_POINT/MAX_NEIGHBOR_FRAME = 1
        assert len(out["grasp_pose"]) >= 1
