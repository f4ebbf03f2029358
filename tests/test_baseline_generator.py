"""Baseline training-data generator tests: end-to-end view -> GPD records ->
one GPD/PointNetGPD train step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s4g_tpu.datagen.baseline_generator import (collate_baseline_batch,
                                                generate_baseline_view,
                                                scene_from_ply)
from test_datagen_grading import make_box_cloud

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def scene():
    rng = np.random.RandomState(5)
    cloud, normals = make_box_cloud(rng, n_per_face=200, half=0.03)
    world = cloud + np.array([0, 0, 0.80], np.float32)
    return {"cloud": world, "normal": normals,
            "label": np.zeros(len(world), np.int32)}


@pytest.fixture(scope="module")
def record(scene):
    return generate_baseline_view(scene["cloud"], np.array([0, 0, 2.0]),
                                  scene, grasp_num=40,
                                  rng=np.random.RandomState(0))


def test_generate_baseline_view(record):
    g = len(record["grasp_score_labels"])
    assert g > 0, "no baseline grasps found on a graspable box"
    assert record["close_region_points"].shape == (g, 3, 1024)
    assert record["close_region_projection_maps"].shape == (g, 12, 60, 60)
    assert record["baseline_frame"].shape == (g, 4, 4)
    assert (record["antipodal_score"] > 1e-4).all()
    assert record["grasp_score_labels"].max() <= 2
    r = record["baseline_frame"][:, :3, :3]
    eye = np.einsum("nij,nkj->nik", r, r)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (g, 1, 1)), atol=1e-3)


def test_baseline_records_train_gpd(record):
    from s4g_tpu.configs.config import load_cfg_from_dict
    from s4g_tpu.models import build_model
    batch_np = collate_baseline_batch([record], batch_grasps=8,
                                      rng=np.random.RandomState(1))
    cfg = load_cfg_from_dict({
        "MODEL": {"TYPE": "GPD", "COMPUTE_DTYPE": "float32"},
        "DATA": {"SCORE_CLASSES": 3, "GPD_IN_CHANNELS": 12}})
    net, loss_fn, metric_fn = build_model(cfg)
    batch = {"close_region_projection_maps": jnp.asarray(
        batch_np["close_region_projection_maps"])}
    variables = net.init(jax.random.key(0), batch, train=False)
    preds = net.apply(variables, batch, train=False)
    labels = {"grasp_score_labels": jnp.asarray(
        batch_np["grasp_score_labels"])}
    loss = loss_fn(preds, labels)
    assert np.isfinite(float(loss["cls_loss"]))

    # PointNetGPD consumes the close-region point sets
    cfg2 = load_cfg_from_dict({
        "MODEL": {"TYPE": "PointNetGPD", "COMPUTE_DTYPE": "float32"},
        "DATA": {"SCORE_CLASSES": 3}})
    net2, loss2, _ = build_model(cfg2)
    batch2 = {"close_region_points": jnp.asarray(
        batch_np["close_region_points"])}
    v2 = net2.init(jax.random.key(1), batch2, train=False)
    preds2 = net2.apply(v2, batch2, train=False)
    assert np.isfinite(float(loss2(preds2, labels)["cls_loss"]))


def test_scene_from_ply_roundtrip(tmp_path, scene):
    from s4g_tpu.datagen.mesh_tools import scene_ply
    from test_datagen_pipeline import _box_mesh
    meshes = {"004_sugar_box#0": _box_mesh(0.03)}
    poses = {"004_sugar_box#0": np.array([0.0, 0.0, 0.78, 1, 0, 0, 0])}
    path = str(tmp_path / "scene.ply")
    scene_ply(meshes, poses, path, samples_per_object=400,
              rng=np.random.RandomState(0))
    loaded = scene_from_ply(path)
    assert loaded["cloud"].shape[0] == 800
    assert loaded["normal"].shape == loaded["cloud"].shape
    # object + table labels present
    labels = np.unique(loaded["label"])
    assert len(labels) >= 2
