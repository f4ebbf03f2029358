"""Integration test of the full label factory: object grading -> scene
composition -> view label transfer -> training collation (the reference
pipeline generate_scene -> generate_fast_training_data, SURVEY §3.3)."""

import numpy as np
import pytest

import jax.numpy as jnp

from s4g_tpu.datagen.grading import darboux_frames, grade_frames
from s4g_tpu.datagen.label_transfer import (TABLE_HEIGHT, generate_view_labels,
                                            magic_formula, match_to_scene,
                                            processing_and_trace)
from s4g_tpu.datagen.scene_compose import compose_scene
from test_datagen_grading import make_box_cloud


@pytest.fixture(scope="module")
def graded_object():
    rng = np.random.RandomState(2)
    cloud, normals = make_box_cloud(rng, n_per_face=200, half=0.03)
    frames, inv_frames = darboux_frames(jnp.asarray(cloud),
                                        jnp.asarray(normals))
    homo = np.concatenate([cloud.T, np.ones((1, len(cloud)))]).astype(
        np.float32)
    search, antipodal = grade_frames(jnp.asarray(cloud),
                                     jnp.asarray(normals.T),
                                     frames, jnp.asarray(homo), chunk=64)
    inv_search, inv_antipodal = grade_frames(jnp.asarray(cloud),
                                             jnp.asarray(normals.T),
                                             inv_frames, jnp.asarray(homo),
                                             chunk=64)
    return {
        "cloud": cloud, "normal": normals,
        "frame": np.asarray(frames), "inv_frame": np.asarray(inv_frames),
        "search_score": np.asarray(search),
        "inv_search_score": np.asarray(inv_search),
        "antipodal_score": np.asarray(antipodal),
        "inv_antipodal_score": np.asarray(inv_antipodal),
    }


@pytest.fixture(scope="module")
def scene(graded_object):
    # box resting on the table
    pose = np.array([0.05, -0.02, TABLE_HEIGHT + 0.03, 1.0, 0, 0, 0])
    return compose_scene({"box": pose}, {"box": graded_object},
                         name_to_index={"box": 0})


def test_object_grading_finds_grasps(graded_object):
    assert graded_object["search_score"].max() > 50
    assert graded_object["antipodal_score"].max() > 0.3


def test_trace_and_match(scene):
    rng = np.random.RandomState(1)
    clean = scene["cloud"].astype(np.float32)
    noise = clean * (1.0 + rng.randn(*clean.shape).astype(np.float32) * 0.001)
    trace = processing_and_trace(jnp.asarray(noise), capacity=4096)
    keep = np.asarray(trace.valid)
    assert keep.sum() > 100
    idx = np.asarray(trace.index_in_ref)[keep]
    assert (idx >= 0).all() and (idx < len(clean)).all()

    cam = np.array([0.0, 0.0, 2.0], np.float32)
    match = match_to_scene(
        jnp.asarray(clean[idx]), jnp.asarray(cam),
        jnp.asarray(scene["cloud"], jnp.float32),
        jnp.asarray(scene["normal"], jnp.float32),
        jnp.asarray(scene["frame"], jnp.float32),
        jnp.asarray(scene["inv_frame"], jnp.float32),
        jnp.asarray(scene["search_score"], jnp.float32),
        jnp.asarray(scene["inv_search_score"], jnp.float32),
        jnp.asarray(scene["antipodal_score"], jnp.float32),
        jnp.asarray(scene["inv_antipodal_score"], jnp.float32))
    assert np.asarray(match.matched).mean() > 0.9
    # oriented normals point toward the camera
    dots = np.sum(np.asarray(match.normals)
                  * (cam[None] - clean[idx]), axis=1)
    assert (dots >= -1e-5).mean() > 0.99
    # frames never approach OUT of the surface after the flip
    approach = np.sum(np.asarray(match.normals)
                      * np.asarray(match.frames)[:, :, 0], axis=1)
    assert (approach <= 1e-5).all()


def test_full_view_label_generation(scene):
    rng = np.random.RandomState(4)
    clean = scene["cloud"].astype(np.float32)
    noise = clean * (1.0 + rng.randn(*clean.shape).astype(np.float32) * 0.001)
    cam_pose = np.eye(4)
    cam_pose[:3, 3] = [0.0, 0.0, 2.0]

    data = generate_view_labels(noise, clean, cam_pose, scene,
                                capacity=4096, chunk=8)
    assert data["point_cloud"].shape[0] == 3
    g = len(data["valid_index"])
    assert data["valid_frame"].shape == (g, 4, 12, 4, 4)
    assert data["search_score"].shape == (g, 4, 12)
    assert data["antipodal_score"].shape == (g, 4, 12)
    assert data["objects_label"].shape == (g, 4, 12)
    assert g > 0, "no valid grasps found on a graspable box"
    # valid frames carry orthonormal rotations
    rots = data["valid_frame"][..., :3, :3].reshape(-1, 3, 3)
    # only check poses whose score cell is valid
    valid_cells = (data["search_score"] > 0).reshape(-1)
    rv = rots[valid_cells]
    eye = np.einsum("nij,nkj->nik", rv, rv)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (len(rv), 1, 1)),
                               atol=1e-3)
    # labels of valid cells are the single box object (0)
    labels = data["objects_label"].reshape(-1)[valid_cells]
    assert (labels == 0).all()

    # collates into the training format
    from s4g_tpu.train.dataset import collate_scene
    sample = collate_scene(data, num_points=512, score_classes=3,
                           rng=np.random.RandomState(0))
    assert sample["scene_points"].shape == (3, 512)
    assert sample["num_frame_points"] == min(g, 512)
    assert sample["scene_score"].max() <= 1.0


def test_online_view_label_generation(scene):
    """Online variant: frames estimated on the view cloud itself
    (reference torch_single_view_point_cloud.py)."""
    from s4g_tpu.datagen.label_transfer import generate_view_labels_online
    rng = np.random.RandomState(6)
    clean = scene["cloud"].astype(np.float32)
    noise = clean * (1.0 + rng.randn(*clean.shape).astype(np.float32) * 0.001)
    cam_pose = np.eye(4)
    cam_pose[:3, 3] = [0.0, 0.0, 2.0]
    data = generate_view_labels_online(noise, cam_pose, scene,
                                       capacity=4096, chunk=8)
    g = len(data["valid_index"])
    assert data["valid_frame"].shape == (g, 4, 12, 4, 4)
    assert data["search_score"].shape == (g, 4, 12)
    assert g > 0
    # search scores are close-region populations: integral-valued, >= 10
    nz = data["search_score"][data["search_score"] > 0]
    assert nz.min() >= 10
