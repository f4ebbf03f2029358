"""Differential tests for the data-gen grading kernels vs numpy oracles
transcribing the reference semantics."""

import numpy as np
import pytest

import jax.numpy as jnp

from s4g_tpu.datagen.grading import (darboux_frames, estimate_normals,
                                     grade_frames)
from s4g_tpu.datagen.scene_compose import compose_scene, quat_to_mat

from reference_datagen import np_darboux_frame, np_finger_hand_view


def make_box_cloud(rng, n_per_face=120, half=0.03):
    """Box surface point cloud with outward normals — graspable geometry."""
    pts, nrm = [], []
    for axis in range(3):
        for sign in (-1.0, 1.0):
            uv = rng.uniform(-half, half, (n_per_face, 2))
            p = np.zeros((n_per_face, 3))
            p[:, axis] = sign * half
            other = [a for a in range(3) if a != axis]
            p[:, other[0]] = uv[:, 0]
            p[:, other[1]] = uv[:, 1]
            n = np.zeros((n_per_face, 3))
            n[:, axis] = sign
            pts.append(p)
            nrm.append(n)
    return (np.concatenate(pts).astype(np.float32),
            np.concatenate(nrm).astype(np.float32))


@pytest.fixture(scope="module")
def box():
    rng = np.random.RandomState(11)
    return make_box_cloud(rng)


class TestGradeFrames:
    def test_matches_oracle_on_box(self, box):
        cloud, normals = box
        rng = np.random.RandomState(5)
        # candidate frames: surface points with x = -normal (approach into
        # the surface), plus a couple of zero (invalid) frames
        num_p = 6
        sel = rng.choice(len(cloud), num_p, replace=False)
        frames = np.zeros((num_p, 3, 3), np.float32)
        for i, s in enumerate(sel):
            n = normals[s]
            x = -n
            up = np.array([0.0, 0.0, 1.0])
            if abs(x @ up) > 0.9:
                up = np.array([0.0, 1.0, 0.0])
            z = np.cross(x, up)
            z /= np.linalg.norm(z)
            y = np.cross(z, x)
            frames[i] = np.stack([x, y, z], axis=1)
        frames[-1] = 0.0  # invalid frame must grade to zero

        homo = np.concatenate([cloud.T, np.ones((1, len(cloud)))]).astype(
            np.float32)
        search, antip = grade_frames(
            jnp.asarray(cloud[sel]), jnp.asarray(normals.T),
            jnp.asarray(frames), jnp.asarray(homo), chunk=8)
        search, antip = np.asarray(search), np.asarray(antip)

        for i, s in enumerate(sel):
            want_s, want_a = np_finger_hand_view(
                cloud[s].astype(np.float64), frames[i].astype(np.float64),
                cloud.astype(np.float64), normals.astype(np.float64))
            np.testing.assert_allclose(search[i], want_s, atol=1e-3,
                                       err_msg=f"search mismatch point {i}")
            np.testing.assert_allclose(antip[i], want_a, atol=1e-4,
                                       err_msg=f"antipodal mismatch point {i}")

    def test_good_grasp_scores_positive(self, box):
        """A frame aligned with a box face must produce some valid grasps."""
        cloud, normals = box
        s = 0  # first point: on a face
        n = normals[s]
        x = -n
        up = np.array([0.0, 0.0, 1.0]) if abs(x[2]) < 0.9 else np.array(
            [0.0, 1.0, 0.0])
        z = np.cross(x, up)
        z /= np.linalg.norm(z)
        y = np.cross(z, x)
        frame = np.stack([x, y, z], axis=1).astype(np.float32)
        homo = np.concatenate([cloud.T, np.ones((1, len(cloud)))]).astype(
            np.float32)
        search, antip = grade_frames(
            jnp.asarray(cloud[s][None]), jnp.asarray(normals.T),
            jnp.asarray(frame[None]), jnp.asarray(homo), chunk=1)
        assert float(np.asarray(search).max()) > 0
        assert float(np.asarray(antip).max()) > 0


class TestDarboux:
    def test_frames_match_oracle(self):
        """Compare on an ellipsoid (distinct principal curvatures, so the
        normal-covariance eigenvectors are well-conditioned; flat/spherical
        geometry makes the minor-curvature direction mathematically
        arbitrary in the reference too)."""
        rng = np.random.RandomState(7)
        u = rng.uniform(0, 2 * np.pi, 800)
        v = np.arccos(rng.uniform(-1, 1, 800))
        axes = np.array([0.03, 0.05, 0.09])
        cloud = np.stack([axes[0] * np.sin(v) * np.cos(u),
                          axes[1] * np.sin(v) * np.sin(u),
                          axes[2] * np.cos(v)], axis=1).astype(np.float32)
        # outward ellipsoid normals: grad(x^2/a^2 + ...) normalized
        grad = cloud / (axes ** 2)
        normals = (grad / np.linalg.norm(grad, axis=1, keepdims=True)
                   ).astype(np.float32)

        frames, _ = darboux_frames(jnp.asarray(cloud), jnp.asarray(normals),
                                   curvature_radius=0.015, max_nn=64)
        frames = np.asarray(frames)

        def eigengap(idx):
            d = np.linalg.norm(cloud.astype(np.float64)
                               - cloud[idx].astype(np.float64), axis=1)
            nbr = normals[d <= 0.015].astype(np.float64)
            n = nbr.mean(0)
            n /= np.linalg.norm(n)
            proj = (np.eye(3) - np.outer(n, n)) @ nbr.T
            diff = proj - proj.mean(1, keepdims=True)
            vals = np.linalg.eigvalsh(diff @ diff.T)
            return vals[1] - vals[0]

        checked, tight = 0, 0
        for idx in rng.choice(len(cloud), 60, replace=False):
            want_f, _ = np_darboux_frame(
                cloud.astype(np.float64), normals.astype(np.float64),
                idx, 0.015)
            if np.allclose(want_f, 0) or np.allclose(frames[idx], 0):
                continue
            if np.linalg.norm(frames[idx][:, 1]) < 0.5:  # degenerate point
                continue
            if eigengap(idx) < 1e-3:
                # near-degenerate curvature directions: the eigenvector is
                # arbitrary under f32 rounding (in the reference too)
                continue
            cosines = [abs(float(frames[idx][:, c] @ want_f[:, c]))
                       for c in range(3)]
            assert min(cosines) > 0.9, (idx, cosines)
            checked += 1
            tight += min(cosines) > 0.99
        assert checked >= 15  # enough well-conditioned comparisons
        assert tight >= 0.6 * checked

    def test_frame_x_is_negative_normal(self, box):
        cloud, normals = box
        frames, inv = darboux_frames(jnp.asarray(cloud), jnp.asarray(normals))
        frames = np.asarray(frames)
        ok = np.abs(frames).mean(axis=(1, 2)) > 1e-6
        # x column ~ -mean neighbourhood normal ~ -point normal on flat faces
        dots = np.sum(frames[ok][:, :, 0] * normals[ok], axis=1)
        assert (dots < 0).mean() > 0.95

    def test_normal_estimation_on_plane(self):
        rng = np.random.RandomState(0)
        pts = np.zeros((300, 3), np.float32)
        pts[:, :2] = rng.uniform(-0.05, 0.05, (300, 2))
        cam = np.array([0.0, 0.0, 1.0], np.float32)
        normals = np.asarray(estimate_normals(jnp.asarray(pts),
                                              jnp.asarray(cam)))
        # points with a real neighbourhood must get the plane normal +z;
        # isolated points (<3 neighbours) have an undefined normal — same
        # as any covariance-based estimator.
        from s4g_tpu.datagen.grading import _radius_neighbors
        _, count = _radius_neighbors(jnp.asarray(pts), 0.01, 30)
        good = np.asarray(count) >= 3
        assert good.mean() > 0.9
        np.testing.assert_allclose(np.abs(normals[good, 2]), 1.0, atol=1e-3)
        assert (normals[good, 2] > 0).all()  # oriented toward camera


class TestSceneCompose:
    def test_quat_identity(self):
        np.testing.assert_allclose(quat_to_mat(np.array([1.0, 0, 0, 0])),
                                   np.eye(3), atol=1e-8)

    def test_compose_transforms(self):
        rng = np.random.RandomState(0)
        obj = {
            "cloud": rng.rand(10, 3),
            "normal": rng.rand(10, 3),
            "frame": np.tile(np.eye(3), (10, 1, 1)),
            "inv_frame": np.tile(np.eye(3), (10, 1, 1)),
            "search_score": rng.rand(10, 4, 12),
            "inv_search_score": rng.rand(10, 4, 12),
            "antipodal_score": rng.rand(10, 4, 12),
            "inv_antipodal_score": rng.rand(10, 4, 12),
        }
        pose = np.array([0.1, 0.2, 0.3, 1.0, 0, 0, 0])  # pure translation
        scene = compose_scene({"a": pose}, {"a": obj})
        np.testing.assert_allclose(scene["cloud"],
                                   obj["cloud"] + pose[:3], atol=1e-8)
        np.testing.assert_allclose(scene["normal"], obj["normal"], atol=1e-8)
        assert scene["frame"].shape == (10, 3, 3)
        assert scene["label"].shape == (10,)


class TestGradeObjectStride:
    def test_frame_stride_matches_full_on_graded_rows(self):
        """frame_stride grades a subset against the SAME full-density cloud:
        graded rows match the stride-1 run exactly, ungraded rows are zero
        (they fail the label-transfer magic formula downstream)."""
        from s4g_tpu.datagen.generate import grade_object
        from s4g_tpu.datagen.mesh_tools import make_box

        verts, tris = make_box()
        full = grade_object(verts, tris, rng=np.random.RandomState(3))
        strided = grade_object(verts, tris, rng=np.random.RandomState(3),
                               frame_stride=3)
        n = len(full["cloud"])
        assert len(strided["cloud"]) == n
        np.testing.assert_array_equal(strided["cloud"], full["cloud"])
        np.testing.assert_array_equal(strided["frame"], full["frame"])
        idx = np.arange(0, n, 3)
        mask = np.zeros(n, bool)
        mask[idx] = True
        for key in ("search_score", "inv_search_score",
                    "antipodal_score", "inv_antipodal_score"):
            np.testing.assert_allclose(strided[key][idx], full[key][idx],
                                       rtol=0, atol=0, err_msg=key)
            assert not strided[key][~mask].any(), key
        # the graded subset must actually carry signal on a graspable box
        assert full["search_score"][idx].max() > 0
