"""MuJoCo scene simulation, depth rendering, movability, and the merged
end-to-end data-generation slice (the reference pipeline of SURVEY §3.3 /
BASELINE config #5) on primitive objects."""

import numpy as np
import pytest

from s4g_tpu.datagen.movability import DirectionGenerator
from s4g_tpu.datagen.render import (camera_pose_matrix, depth_to_clouds,
                                    render_depth_mesh, render_scene_views,
                                    table_mesh, CAMERA_POSE)
from s4g_tpu.datagen.scene_sim import (ObjectSpec, TableEnv, build_arena_xml,
                                       generate_scenes)
from s4g_tpu.datagen.merge import (DIRECTION_CHANGE_LIST,
                                   build_direction_table, merge_scene)

mujoco = pytest.importorskip("mujoco")

BOXES = [ObjectSpec(name=f"box{i}", geom_type="box",
                    size="0.025 0.02 0.03") for i in range(4)]


class TestSceneSim:
    def test_drop_settles_on_table(self):
        env = TableEnv(BOXES, percentage=1.1, random_seed=0)
        poses = env.run()
        assert poses is not None and len(poses) >= 2
        top = env.table_top_height
        for name, pose in poses.items():
            assert pose.shape == (7,)
            # resting near the table surface (com within a few cm)
            assert top - 0.05 < pose[2] < top + 0.3
            np.testing.assert_allclose(np.linalg.norm(pose[3:7]), 1.0,
                                       atol=1e-3)

    def test_generate_scenes_idempotent(self, tmp_path):
        done = generate_scenes(BOXES[:2], str(tmp_path), 0, 2,
                               percentage=1.1)
        assert done == [0, 1]
        # second run skips
        done2 = generate_scenes(BOXES[:2], str(tmp_path), 0, 2,
                                percentage=1.1)
        assert done2 == [0, 1]
        data = np.load(tmp_path / "npy" / "0.npy", allow_pickle=True)[()]
        assert isinstance(data, dict)


class TestRenderer:
    def test_depth_of_known_plane(self):
        # a large quad 1m in front of the camera (camera at origin, -z fwd)
        z = -1.0
        verts = np.array([[-2, -2, z], [2, -2, z], [-2, 2, z], [2, 2, z]],
                         np.float64)
        tris = np.array([[0, 1, 2], [1, 3, 2]])
        depth = render_depth_mesh(verts, tris, np.eye(4), width=64, height=48)
        assert np.isfinite(depth).all()
        np.testing.assert_allclose(depth, 1.0, atol=1e-6)

    def test_backprojection_roundtrip(self):
        rng = np.random.RandomState(0)
        z = -0.8
        verts = np.array([[-2, -2, z], [2, -2, z], [-2, 2, z], [2, 2, z]])
        tris = np.array([[0, 1, 2], [1, 3, 2]])
        cam = np.eye(4)
        depth = render_depth_mesh(verts, tris, cam, width=64, height=48)
        clean, noisy = depth_to_clouds(depth, cam, rng=rng)
        # every back-projected point lies on the plane z = -0.8
        np.testing.assert_allclose(clean[:, 2], -0.8, atol=1e-5)
        assert np.abs(noisy - clean).max() < 0.03  # 0.5% noise at 0.8-1m

    def test_scene_views_cover_table(self):
        meshes = {"box0": _box_mesh(0.03)}
        pose = {"box0": np.array([0.0, 0.0, 0.78, 1.0, 0, 0, 0])}
        views = render_scene_views(meshes, pose, table_mesh=table_mesh(),
                                   rng=np.random.RandomState(0),
                                   width=160, height=120)
        assert len(views) == len(CAMERA_POSE)
        clean, noisy, cam = views[0]
        assert len(clean) > 500
        # points lie on table (z~0.75) or on the box (z up to ~0.81)
        assert clean[:, 2].min() > 0.74
        assert clean[:, 2].max() < 0.83
        assert (np.abs(clean[:, 0]) < 0.5).all()


def _box_mesh(half):
    corners = np.array([[x, y, z] for x in (-half, half)
                        for y in (-half, half) for z in (-half, half)])
    tris = np.array([
        [0, 1, 2], [1, 3, 2], [4, 6, 5], [5, 6, 7],
        [0, 4, 1], [1, 4, 5], [2, 3, 6], [3, 7, 6],
        [0, 2, 4], [2, 6, 4], [1, 5, 3], [3, 5, 7]])
    return corners, tris


class TestMovability:
    def test_free_object_moves_far(self):
        # single box on the table: every direction should be free
        specs = [ObjectSpec(name="box0", size="0.03 0.03 0.03")]
        env = TableEnv(specs, percentage=1.1, random_seed=1)
        poses = env.run()
        assert poses and "box0" in poses
        gen = DirectionGenerator(env.xml, poses)
        dist = gen.get_all_valid_direction()
        assert dist.shape == (1, 5)
        # +z (last direction) is always free; sideways should be mostly free
        assert dist[0, 4] > 0.15

    def test_blocked_object_moves_less(self):
        # two boxes in contact along x: pushing one into the other triggers
        # the other's velocity tolerance quickly
        xml = build_arena_xml(
            [ObjectSpec(name="a", size="0.03 0.03 0.03"),
             ObjectSpec(name="b", size="0.03 0.03 0.03")],
            poses=[(0.0, 0.0, 0.781), (0.065, 0.0, 0.781)],
            quats=[(1, 0, 0, 0), (1, 0, 0, 0)], walls=False)
        pose_dict = {
            "a": np.array([0.0, 0.0, 0.781, 1, 0, 0, 0]),
            "b": np.array([0.065, 0.0, 0.781, 1, 0, 0, 0])}
        gen = DirectionGenerator(xml, pose_dict)
        dist = gen.get_all_valid_direction()
        # pushing a in +x hits b almost immediately; -x is free
        assert dist[0, 0] < 0.05
        assert dist[0, 1] > 0.15


class TestMerge:
    def test_direction_table_and_permutation(self):
        direction_data = {
            "move_distance": np.array([[0.1, 0.2, 0.05, 0.2, 0.2]]),
            "obj_list": ["obj_a"],
        }
        table = build_direction_table(direction_data, {"obj_a": 0}, 2)
        assert table.shape == (3, 5)
        np.testing.assert_allclose(table[0], [0.1, 0.2, 0.05, 0.2, 0.2])
        assert (table[1] == -1).all()
        assert (table[2] == 0).all()

        merged = merge_scene({"point_cloud": np.zeros((3, 4))}, table, view=2)
        want = table[:, DIRECTION_CHANGE_LIST[2]]
        np.testing.assert_allclose(merged["direction"], want)
        assert "point_cloud" in merged
