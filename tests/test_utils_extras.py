"""Tests for the inference extras: PLY I/O, gripper visualizer meshes,
freezer masks, file logger artifact dump."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from s4g_tpu.utils.io_ply import (read_ply_points, write_ply_mesh,
                                  write_ply_points)
from s4g_tpu.utils.grasp_visualizer import GraspVisualizer, gripper_hand_mesh
from s4g_tpu.models.freezer import (freeze_by_patterns, frozen_param_names,
                                    make_freeze_mask)


def test_ply_roundtrip(tmp_path):
    pts = np.random.RandomState(0).rand(100, 3).astype(np.float32)
    path = str(tmp_path / "cloud.ply")
    write_ply_points(path, pts, colors=np.ones((100, 3)) * 0.5)
    back = read_ply_points(path)
    np.testing.assert_allclose(back, pts, atol=1e-4)


def test_ply_mesh_writes(tmp_path):
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    f = np.array([[0, 1, 2]])
    path = str(tmp_path / "mesh.ply")
    write_ply_mesh(path, v, f)
    assert os.path.getsize(path) > 0
    assert b"element face 1" in open(path, "rb").read()


def test_gripper_mesh_geometry():
    from s4g_tpu.configs import gripper_config as G
    verts, tris = gripper_hand_mesh(np.eye(4))
    assert verts.shape == (24, 3) and tris.shape == (36, 3)
    # geometry must span the gripper bound box
    assert np.isclose(verts[:, 0].min(), -G.BOTTOM_LENGTH)
    assert np.isclose(verts[:, 0].max(), G.FINGER_LENGTH)
    assert np.isclose(verts[:, 1].max(), G.HALF_BOTTOM_WIDTH)
    # a transform moves it
    pose = np.eye(4)
    pose[:3, 3] = [1, 2, 3]
    verts2, _ = gripper_hand_mesh(pose)
    np.testing.assert_allclose(verts2, verts + np.array([1, 2, 3]), atol=1e-6)


def test_visualizer_save(tmp_path):
    viz = GraspVisualizer(np.random.rand(50, 3))
    viz.add_multiple_poses(np.tile(np.eye(4), (3, 1, 1)))
    viz.save(str(tmp_path / "c.ply"), str(tmp_path / "h.ply"))
    assert os.path.exists(tmp_path / "c.ply")
    assert os.path.exists(tmp_path / "h.ply")


class TestFreezer:
    def _params(self):
        return {"backbone": {"sa0": {"conv": {"kernel": jnp.ones(3)}}},
                "head_seg": {"logit": {"kernel": jnp.ones(3),
                                       "bias": jnp.zeros(2)}}}

    def test_mask(self):
        params = self._params()
        mask = make_freeze_mask(params, ["backbone"])
        assert mask["backbone"]["sa0"]["conv"]["kernel"] is False
        assert mask["head_seg"]["logit"]["kernel"] is True

    def test_frozen_names(self):
        names = frozen_param_names(self._params(), ["backbone"])
        assert names == ["backbone.sa0.conv.kernel"]

    def test_frozen_params_get_zero_updates(self):
        params = self._params()
        opt = freeze_by_patterns(optax.sgd(0.1), params, ["backbone"])
        state = opt.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, _ = opt.update(grads, state, params)
        assert float(jnp.abs(
            updates["backbone"]["sa0"]["conv"]["kernel"]).sum()) == 0.0
        assert float(jnp.abs(
            updates["head_seg"]["logit"]["kernel"]).sum()) > 0.0

    def test_negative_lookahead_pattern(self):
        """The reference's 'everything except X' idiom (freezer.py:4-6)."""
        params = self._params()
        names = frozen_param_names(params, ["^((?!head_seg).)*$"])
        assert "backbone.sa0.conv.kernel" in names
        assert all("head_seg" not in n for n in names)


def test_file_logger_unlabeled(tmp_path, monkeypatch):
    from s4g_tpu.pipeline.file_logger import log_to_file
    monkeypatch.chdir(tmp_path)
    rng = np.random.RandomState(0)
    n = 200
    data_batch = {"scene_points": jnp.asarray(
        rng.uniform(-0.2, 0.2, (1, 3, n)).astype(np.float32))}
    preds = {
        "score": jnp.asarray(rng.randn(1, 3, n).astype(np.float32)),
        "frame_R": jnp.asarray(rng.randn(1, 9, n).astype(np.float32)),
        "frame_t": jnp.asarray(rng.randn(1, 4, n).astype(np.float32)),
        "movable_logits": jnp.asarray(rng.rand(1, 5, n).astype(np.float32)),
    }
    result = log_to_file(data_batch, preds, 0, str(tmp_path), prefix="t",
                         with_label=False, top_k=20)
    assert result is not None
    top_h, scores = result
    assert len(top_h) == len(scores)
    step_dir = tmp_path / "t_step00000"
    for fname in ["scene_points.xyz", "scene_score_logits.txt",
                  "pred_frame_R.txt", "pred_frame_t.txt",
                  "pred_scene_score.txt", "pred_pts.ply"]:
        assert (step_dir / fname).exists(), fname
    if len(top_h):
        assert (tmp_path / "top_frames.npy").exists()


class TestHtmlViewer:
    def _fake_training_pickle(self, path, n=400, g=5, seed=0):
        import pickle
        rng = np.random.RandomState(seed)
        cloud = rng.rand(3, n)
        valid_index = rng.choice(n, g, replace=False)
        frames = np.tile(np.eye(4), (g, 4, 12, 1, 1))
        frames[..., :3, 3] = rng.rand(g, 4, 12, 3)
        data = {
            "point_cloud": cloud,
            "valid_index": valid_index,
            "search_score": rng.rand(g, 4, 12) * 200,
            "antipodal_score": rng.rand(g, 4, 12),
            "valid_frame": frames,
        }
        with open(path, "wb") as f:
            pickle.dump(data, f)
        return data

    def test_export_viewer_html(self, tmp_path):
        from s4g_tpu.utils.html_viewer import export_interactive_viewer
        rng = np.random.RandomState(1)
        pts = rng.rand(300, 3)
        out = export_interactive_viewer(
            str(tmp_path / "v.html"), pts, scores=rng.rand(300),
            grasp_point_indices=np.array([3, 7]),
            frames_per_point=[np.eye(4)[None], np.eye(4)[None].repeat(2, 0)])
        html = open(out).read()
        assert "shift-click" in html
        import json as _json
        import re
        data = _json.loads(
            re.search(r"const DATA = (\{.*?\});\n", html, re.S).group(1))
        assert len(data["points"]) == 300
        assert data["labeled"] == [3, 7]
        assert [len(f) for f in data["frames"]] == [1, 2]
        assert len(data["gripper"]) == 36  # 3 boxes x 12 edges

    def test_subsample_keeps_labeled(self, tmp_path):
        from s4g_tpu.utils.html_viewer import export_interactive_viewer
        rng = np.random.RandomState(2)
        pts = rng.rand(5000, 3)
        labeled = np.array([4999, 0])
        out = export_interactive_viewer(
            str(tmp_path / "v.html"), pts, grasp_point_indices=labeled,
            frames_per_point=[np.eye(4)[None]] * 2, max_points=100)
        import json as _json
        import re
        data = _json.loads(
            re.search(r"const DATA = (\{.*?\});\n", open(out).read(),
                      re.S).group(1))
        assert len(data["points"]) <= 102
        for li, orig in zip(data["labeled"], labeled):
            np.testing.assert_allclose(data["points"][li], pts[orig],
                                       atol=1e-4)

    def test_pick_grasp_viewer_cli(self, tmp_path):
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "tools"))
        from pick_grasp_viewer import build_viewer
        pkl = str(tmp_path / "scene_view_0.p")
        self._fake_training_pickle(pkl)
        out = build_viewer(pkl, str(tmp_path / "viewer.html"),
                           max_frames_per_point=3)
        import json as _json
        import re
        data = _json.loads(
            re.search(r"const DATA = (\{.*?\});\n", open(out).read(),
                      re.S).group(1))
        assert len(data["labeled"]) == 5
        assert all(1 <= len(f) <= 3 for f in data["frames"])
