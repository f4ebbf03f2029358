"""Tests for the completeness-tier components: mesh tools, scene PLY,
GraspEnv, robot client payloads, profiling helpers."""

import os

import numpy as np
import pytest

from s4g_tpu.datagen.mesh_tools import (load_mesh, load_obj, load_stl,
                                        save_stl, scale_variants, scene_ply)
from s4g_tpu.robot.grasp_client import (EE_TO_HAND, HAND_TO_EE, GraspClient,
                                        mat_pose_to_pose_stamped)
from s4g_tpu.robot.vision_client import VisionClient
from s4g_tpu.utils.profiling import StageTimer, append_timing, timed_scalar
from test_datagen_pipeline import _box_mesh


class TestMeshTools:
    def test_stl_roundtrip(self, tmp_path):
        verts, tris = _box_mesh(0.03)
        path = str(tmp_path / "box.stl")
        save_stl(path, verts, tris)
        v2, t2 = load_stl(path)
        assert t2.shape == (12, 3)
        # vertex sets match
        a = np.sort(verts.round(6).view([("", float)] * 3).ravel())
        b = np.sort(v2.round(6).view([("", float)] * 3).ravel())
        np.testing.assert_array_equal(a, b)

    def test_obj_loader(self, tmp_path):
        path = tmp_path / "tri.obj"
        path.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\nf 1 2 3 4\n")
        v, f = load_obj(str(path))
        assert v.shape == (4, 3)
        assert f.shape == (2, 3)  # quad fan-triangulated

    def test_load_mesh_dispatch(self, tmp_path):
        verts, tris = _box_mesh(0.01)
        p = str(tmp_path / "m.stl")
        save_stl(p, verts, tris)
        v, f = load_mesh(p)
        assert len(f) == 12

    def test_scale_variants(self):
        verts, _ = _box_mesh(0.03)
        variants = scale_variants(verts)
        assert set(variants) == {0, 1, 2}
        np.testing.assert_allclose(variants[1], verts * 0.85)

    def test_procedural_inventory_has_all_classes(self):
        from s4g_tpu.datagen import mesh_tools
        assert len(mesh_tools.PROCEDURAL_CLASSES) >= 10

    @pytest.mark.parametrize("maker", ["make_icosphere", "make_box",
                                       "make_cylinder", "make_torus",
                                       "make_cone", "make_wedge",
                                       "make_pyramid", "make_ellipsoid",
                                       "make_capsule", "make_lshape",
                                       "make_cup"])
    def test_procedural_meshes_watertight(self, maker):
        from s4g_tpu.datagen import mesh_tools
        v, f = getattr(mesh_tools, maker)()
        # every directed edge appears exactly once, with its reverse present
        edges = {}
        for a, b, c in f:
            for e in ((a, b), (b, c), (c, a)):
                edges[e] = edges.get(e, 0) + 1
        assert all(n == 1 for n in edges.values())
        assert all((e[1], e[0]) in edges for e in edges)
        # consistent outward winding: positive signed volume
        vol = np.einsum("ij,ij->", v[f[:, 0]],
                        np.cross(v[f[:, 1]], v[f[:, 2]])) / 6
        assert vol > 0
        assert np.all(np.ptp(v, axis=0) < 0.15)  # graspable scale, metres

    def test_scene_ply(self, tmp_path):
        meshes = {"boxA": _box_mesh(0.02)}
        poses = {"boxA": np.array([0.0, 0.0, 0.78, 1, 0, 0, 0])}
        path = str(tmp_path / "scene.ply")
        cloud = scene_ply(meshes, poses, path, samples_per_object=500,
                          rng=np.random.RandomState(0))
        assert os.path.exists(path)
        assert len(cloud) == 1000  # object + table samples


class TestPathRegistry:
    def test_priority_order(self, tmp_path, monkeypatch):
        from s4g_tpu.configs import path_registry as pr
        monkeypatch.setenv("S4G_DATA_ROOT", str(tmp_path / "env_root"))
        assert pr.data_root() == str(tmp_path / "env_root")
        # explicit argument beats the environment
        assert pr.data_root(str(tmp_path / "arg")) == str(tmp_path / "arg")

    def test_hostname_switch(self, monkeypatch):
        import socket
        from s4g_tpu.configs import path_registry as pr
        monkeypatch.delenv("S4G_DATA_ROOT", raising=False)
        host = socket.gethostname()
        monkeypatch.setenv("S4G_HOST_ROOTS",
                           f"zzz=/nowhere,{host[:3]}=/cluster/ycb")
        assert pr.data_root() == "/cluster/ycb"
        monkeypatch.setenv("S4G_HOST_ROOTS", "zzz=/nowhere")
        assert pr.data_root().endswith("s4g_data")   # fallback

    def test_layout_matches_generator(self, tmp_path):
        """The helpers must agree with generate_end_to_end's on-disk layout
        (single_object_data/<obj>.p, merged_data/<scene>_view_<v>.p,
        <scene>.npy at the root)."""
        from s4g_tpu.configs import path_registry as pr
        root = str(tmp_path)
        assert pr.object_grade_path("cam0", root) == os.path.join(
            root, "single_object_data", "cam0.p")
        npy, views = pr.npy_and_training_data_path(0, 2, root)
        assert npy == os.path.join(root, "0.npy")
        assert views == [os.path.join(root, "merged_data", "0_view_0.p"),
                         os.path.join(root, "merged_data", "0_view_1.p")]
        d = pr.resource_dir("merged_data", root)
        assert os.path.isdir(d)


@pytest.mark.slow
def test_grasp_env_lift():
    pytest.importorskip("mujoco")
    from s4g_tpu.datagen.grasp_env import GraspEnv
    from s4g_tpu.datagen.scene_sim import ObjectSpec

    env = GraspEnv([ObjectSpec(name="box0", size="0.02 0.02 0.04")],
                   percentage=1.1, random_seed=5)
    poses = env.prepare()
    assert "box0" in poses
    obj = poses["box0"]
    # grasp straight down onto the box: x approach = -z
    pose = np.eye(4)
    pose[:3, 0] = [0, 0, -1]
    pose[:3, 1] = [0, 1, 0]
    pose[:3, 2] = [1, 0, 0]
    pose[:3, 3] = obj[:3] + np.array([0, 0, 0.06])
    result = env.evaluate_single_grasp(pose)
    assert "success" in result and "lift_heights" in result
    # a miss far away must fail
    miss = pose.copy()
    miss[:3, 3] = [0.3, 0.3, 1.0]
    result_miss = env.evaluate_single_grasp(miss)
    assert not result_miss["success"]


class TestRobotClients:
    def test_calibration_roundtrip(self):
        np.testing.assert_allclose(HAND_TO_EE @ EE_TO_HAND, np.eye(4),
                                   atol=1e-8)

    def test_pose_stamped_payload(self):
        pose = np.eye(4)
        pose[:3, 3] = [0.1, 0.2, 0.3]
        msg = mat_pose_to_pose_stamped(pose, "cam")
        assert msg["header"]["frame_id"] == "cam"
        assert msg["pose"]["position"] == {"x": 0.1, "y": 0.2, "z": 0.3}
        assert abs(msg["pose"]["orientation"]["w"] - 1.0) < 1e-9

    def test_grasp_request_applies_calibration(self):
        client = GraspClient()
        pose = np.eye(4)[None]
        req = client.build_request(pose)
        assert len(req["grasp"]) == 1
        pos = req["grasp"][0]["pose_stamped"]["pose"]["position"]
        np.testing.assert_allclose([pos["x"], pos["y"], pos["z"]],
                                   HAND_TO_EE[:3, 3], atol=1e-9)

    def test_vision_parse(self):
        res = {"points": [{"x": 1, "y": 2, "z": 3}, {"x": 4, "y": 5, "z": 6}]}
        cloud = VisionClient.parse_cloud_response(res)
        assert cloud.shape == (2, 3)


class TestProfiling:
    def test_stage_timer(self):
        timer = StageTimer()
        timer.stage("preprocess")
        timer.stage("predict")
        assert set(timer.stages) == {"preprocess", "predict"}
        assert timer.overall() >= 0

    def test_append_timing(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        append_timing("inference_time_ours.txt", 12.3456)
        append_timing("inference_time_ours.txt", 7.0)
        lines = open("inference_time_ours.txt").read().splitlines()
        assert lines == ["12.3456", "7.0000"]

    def test_timed_scalar(self):
        import jax.numpy as jnp
        import jax
        f = jax.jit(lambda x: jnp.sum(x * 2))
        dt = timed_scalar(f, jnp.ones(128), iters=3)
        assert dt > 0


class TestJsonToPcd:
    def _write_json(self, path, n=5, seed=0):
        import json
        rng = np.random.RandomState(seed)
        pts = rng.rand(n, 3)
        nrm = rng.randn(n, 3)
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        records = [{"v": list(map(float, p)), "n": list(map(float, m))}
                   for p, m in zip(pts, nrm)]
        with open(path, "w") as f:
            json.dump(records, f)
        return pts, nrm

    def test_convert_scales_points_not_normals(self, tmp_path):
        from s4g_tpu.datagen.json_to_pcd import convert_json_dir
        from s4g_tpu.utils.io_ply import read_ply_points
        jdir = tmp_path / "json"
        pdir = tmp_path / "pcd"
        jdir.mkdir()
        pts, nrm = self._write_json(jdir / "025_mug.json")
        # hidden + unknown objects are skipped (reference json_to_pcd.py:22-26)
        self._write_json(jdir / ".hidden.json")
        self._write_json(jdir / "unknown_object.json")
        written = convert_json_dir(str(jdir), str(pdir),
                                   name_scale={"025_mug": [0.8, 1.0, 2.0]})
        assert [os.path.basename(w) for w in written] == [
            "025_mug#0.ply", "025_mug#1.ply", "025_mug#2.ply"]
        got = read_ply_points(str(pdir / "025_mug#2.ply"))
        np.testing.assert_allclose(got, pts * 2.0, atol=1e-6)
        # normals written unscaled
        body = open(pdir / "025_mug#2.ply").read().splitlines()
        first = body[body.index("end_header") + 1].split()
        np.testing.assert_allclose([float(x) for x in first[3:6]],
                                   nrm[0], atol=1e-6)

    def test_name_scale_table(self):
        from s4g_tpu.datagen.json_to_pcd import NAME_SCALE
        assert NAME_SCALE["026_sponge"] == [1.0, 1.2, 1.5, 2.0, 3.0, 4.0]
        assert len(NAME_SCALE) == 55
