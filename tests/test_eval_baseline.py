"""Tests: eval_frames batched evaluation, close-region extraction, GPD
projection maps, eval-view generation, baseline payloads."""

import numpy as np
import pytest

import jax.numpy as jnp

from s4g_tpu.configs import gripper_config as G
from s4g_tpu.datagen.baseline_data import (PROJECTION_RESOLUTION,
                                           baseline_grasp_data,
                                           close_region_projection,
                                           extract_close_region)
from s4g_tpu.pipeline.eval_cloud import eval_frames
from test_datagen_grading import make_box_cloud


@pytest.fixture(scope="module")
def box_scene():
    rng = np.random.RandomState(9)
    cloud, normals = make_box_cloud(rng, n_per_face=200, half=0.025)
    labels = np.zeros(len(cloud), np.int32)
    return cloud, normals, labels


class TestEvalFrames:
    def test_graspable_pose_scores(self, box_scene):
        cloud, normals, labels = box_scene
        # approach along -z onto the box top, fingers along y
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 0] = [0, 0, -1]   # x: approach down
        pose[:3, 1] = [0, 1, 0]    # y: finger axis
        pose[:3, 2] = [1, 0, 0]
        pose[:3, 3] = [0, 0, 0.025]  # at the top face
        g2l = np.linalg.inv(pose)[None].astype(np.float32)
        res = eval_frames(jnp.asarray(g2l), jnp.asarray(cloud),
                          jnp.asarray(normals), jnp.asarray(labels))
        assert not bool(np.asarray(res.multi_objects)[0])
        assert float(np.asarray(res.antipodal_score)[0]) > 0.3

    def test_far_pose_scores_zero(self, box_scene):
        cloud, normals, labels = box_scene
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [5, 5, 5]
        g2l = np.linalg.inv(pose)[None].astype(np.float32)
        res = eval_frames(jnp.asarray(g2l), jnp.asarray(cloud),
                          jnp.asarray(normals), jnp.asarray(labels))
        assert float(np.asarray(res.antipodal_score)[0]) == 0.0

    def test_multi_object_detected(self, box_scene):
        cloud, normals, _ = box_scene
        labels = (cloud[:, 1] > 0).astype(np.int32)  # two half-labels
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 0] = [0, 0, -1]
        pose[:3, 1] = [0, 1, 0]
        pose[:3, 2] = [1, 0, 0]
        pose[:3, 3] = [0, 0, 0.025]
        g2l = np.linalg.inv(pose)[None].astype(np.float32)
        res = eval_frames(jnp.asarray(g2l), jnp.asarray(cloud),
                          jnp.asarray(normals), jnp.asarray(labels))
        assert bool(np.asarray(res.multi_objects)[0])


class TestCloseRegion:
    def test_extraction_shifts_into_box(self, box_scene):
        cloud, normals, _ = box_scene
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 0] = [0, 0, -1]
        pose[:3, 1] = [0, 1, 0]
        pose[:3, 2] = [1, 0, 0]
        pose[:3, 3] = [0, 0, 0.025]
        g2l = np.linalg.inv(pose).astype(np.float32)
        pts, nrm, count = extract_close_region(
            jnp.asarray(g2l), jnp.asarray(cloud), jnp.asarray(normals),
            jnp.ones(len(cloud), bool), num_points=256)
        count = int(count)
        assert count > 10
        pts = np.asarray(pts)
        assert pts.shape == (3, 256)
        valid = pts[:, :min(count, 256)]
        assert (valid[0] >= 0).all() and (valid[0] <= G.FINGER_LENGTH).all()
        assert (valid[1] >= 0).all() and (valid[1] <= 2 * G.HALF_BOTTOM_SPACE + 1e-6).all()
        assert (valid[2] >= 0).all() and (valid[2] <= 2 * G.HALF_HAND_THICKNESS + 1e-6).all()

    def test_projection_maps(self):
        rng = np.random.RandomState(0)
        n = 200
        pts = np.stack([rng.uniform(0, G.FINGER_LENGTH, n),
                        rng.uniform(0, 2 * G.HALF_BOTTOM_SPACE, n),
                        rng.uniform(0, 2 * G.HALF_HAND_THICKNESS, n)])
        nrm = rng.randn(3, n)
        nrm /= np.linalg.norm(nrm, axis=0, keepdims=True)
        proj = np.asarray(close_region_projection(
            jnp.asarray(pts, jnp.float32), jnp.asarray(nrm, jnp.float32),
            jnp.ones(n, bool)))
        assert proj.shape == (12, PROJECTION_RESOLUTION, PROJECTION_RESOLUTION)
        assert np.isfinite(proj).all()
        # height channels are bounded by the gripper dims
        assert proj[0].max() <= G.FINGER_LENGTH + 1e-6
        # normal channels bounded by 1
        assert np.abs(proj[1:4]).max() <= 1.0 + 1e-5
        assert proj[0].max() > 0  # some occupancy

    def test_baseline_payload(self, box_scene):
        cloud, normals, _ = box_scene
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 0] = [0, 0, -1]
        pose[:3, 1] = [0, 1, 0]
        pose[:3, 2] = [1, 0, 0]
        pose[:3, 3] = [0, 0, 0.025]
        payload = baseline_grasp_data(np.linalg.inv(pose), cloud, normals)
        assert payload["close_region_points"].shape == (3, 1024)
        assert payload["close_region_projection_maps"].shape == (12, 60, 60)
        assert payload["num_close_points"] > 10


def test_generate_eval_view(box_scene):
    from s4g_tpu.datagen.eval_data import generate_eval_view
    cloud, normals, labels = box_scene
    # lift the box onto the table so SAMPLE_REGION passes
    world = cloud + np.array([0, 0, 0.78], np.float32)
    scene = {"cloud": world, "normal": normals, "label": labels}
    record = generate_eval_view(world, np.array([0, 0, 2.0]), scene,
                                num_grasp_points=64,
                                rng=np.random.RandomState(0))
    assert record["frames"].shape == (64, 4, 4)
    assert record["antipodal_score"].shape == (64,)
    assert record["non_collision_bool"].dtype == bool
    assert record["single_label_bool"].all()
