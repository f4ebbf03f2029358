"""Pipeline tests: preprocessing vs numpy oracles, batched collision checker
vs a direct transcription of the reference's per-pose logic, post-processing
invariants, and an end-to-end GraspDetector smoke test on the bundled scene
(reference test strategy: grasp_proposal_test.py:36-91)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s4g_tpu.configs import gripper_config as G
from s4g_tpu.configs import processing_config as P
from s4g_tpu.pipeline.collision import batch_view_non_collision
from s4g_tpu.pipeline.postprocessing import (expected_score,
                                             importance_sample,
                                             post_process_predictions)
from s4g_tpu.pipeline.preprocessing import (radius_outlier_mask,
                                            random_sample_fixed,
                                            voxel_downsample,
                                            workspace_crop_mask)

REFERENCE_SCENE = "/root/reference/inference/2638_view_0.p"


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(3)


class TestPreprocessing:
    def test_workspace_crop(self, rng):
        pts = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
        ws = [-0.5, 0.5, -0.4, 0.4, -0.3, 0.3]
        got = np.asarray(workspace_crop_mask(jnp.asarray(pts), ws))
        want = ((pts[:, 0] > -0.5) & (pts[:, 0] < 0.5)
                & (pts[:, 1] > -0.4) & (pts[:, 1] < 0.4)
                & (pts[:, 2] > -0.3) & (pts[:, 2] < 0.3))
        np.testing.assert_array_equal(got, want)

    def test_voxel_downsample_averages(self, rng):
        pts = rng.uniform(0, 0.1, (400, 3)).astype(np.float32)
        valid = np.ones(400, bool)
        res = voxel_downsample(jnp.asarray(pts), jnp.asarray(valid), 0.02, 256)
        got = np.asarray(res.points)[np.asarray(res.valid)]

        origin = pts.min(0)
        coords = np.floor((pts - origin) / 0.02).astype(np.int64)
        keys = {}
        for p, c in zip(pts, coords):
            keys.setdefault(tuple(c), []).append(p)
        want = np.stack([np.mean(v, axis=0) for v in keys.values()])
        assert got.shape[0] == len(keys)
        # compare as sets (ordering differs)
        got_sorted = got[np.lexsort(got.T)]
        want_sorted = want[np.lexsort(want.T)]
        np.testing.assert_allclose(got_sorted, want_sorted, atol=1e-5)

    def test_voxel_ignores_invalid(self, rng):
        pts = rng.uniform(0, 0.1, (100, 3)).astype(np.float32)
        valid = np.zeros(100, bool)
        valid[:10] = True
        res = voxel_downsample(jnp.asarray(pts), jnp.asarray(valid), 0.5, 64)
        assert int(res.num_voxels) >= 1
        assert int(np.asarray(res.valid).sum()) == int(res.num_voxels)

    def test_radius_outlier(self, rng):
        # dense cluster + isolated point
        cluster = rng.normal(0, 0.002, (50, 3)).astype(np.float32)
        lone = np.array([[1.0, 1.0, 1.0]], np.float32)
        pts = np.concatenate([cluster, lone])
        valid = np.ones(51, bool)
        keep = np.asarray(radius_outlier_mask(
            jnp.asarray(pts), jnp.asarray(valid), 0.02, 10, chunk=16))
        assert keep[:50].all()
        assert not keep[50]

    def test_random_sample_without_replacement(self, rng):
        valid = np.zeros(100, bool)
        valid[20:80] = True
        idx = np.asarray(random_sample_fixed(jax.random.key(0),
                                             jnp.asarray(valid), 40))
        assert len(np.unique(idx)) == 40
        assert valid[idx].all()

    def test_random_sample_with_replacement(self, rng):
        valid = np.zeros(100, bool)
        valid[5:15] = True   # only 10 valid, ask for 32
        idx = np.asarray(random_sample_fixed(jax.random.key(1),
                                             jnp.asarray(valid), 32))
        assert valid[idx].all()
        assert idx.shape == (32,)


def np_view_non_collision(g2l, cloud):
    """Direct transcription of the reference collision rule
    (view_collision_checker.py:37-65) for one pose."""
    homo = np.concatenate([cloud.T, np.ones((1, cloud.shape[0]))], 0)
    local = g2l @ homo
    close = (local[0] < G.FINGER_LENGTH) & (local[0] > -G.BOTTOM_LENGTH)
    pts = local[:3, close]
    z_ok = (pts[2] < G.HALF_HAND_THICKNESS) & (pts[2] > -G.HALF_HAND_THICKNESS)
    back = ((pts[1] < G.HALF_BOTTOM_WIDTH) & (pts[1] > -G.HALF_BOTTOM_WIDTH)
            & (pts[0] < -P.BACK_COLLISION_MARGIN) & z_ok)
    if back.sum() > P.BACK_COLLISION_THRESHOLD:
        return False
    fingers = (((pts[1] < G.HALF_BOTTOM_WIDTH) & (pts[1] > G.HALF_BOTTOM_SPACE))
               | ((pts[1] > -G.HALF_BOTTOM_WIDTH) & (pts[1] < -G.HALF_BOTTOM_SPACE)))
    if (z_ok & fingers).sum() > P.FINGER_COLLISION_THRESHOLD:
        return False
    return True


class TestCollision:
    def test_matches_reference_rule(self, rng):
        cloud = rng.uniform(-0.3, 0.3, (2000, 3)).astype(np.float32)
        poses = []
        for _ in range(16):
            # random rigid inverse transforms near the cloud
            a = rng.randn(3, 3)
            q, _ = np.linalg.qr(a)
            if np.linalg.det(q) < 0:
                q[:, 0] *= -1
            t = rng.uniform(-0.2, 0.2, 3)
            m = np.eye(4)
            m[:3, :3] = q
            m[:3, 3] = t
            poses.append(m)
        poses = np.stack(poses).astype(np.float32)

        got = np.asarray(batch_view_non_collision(
            jnp.asarray(poses), jnp.asarray(cloud)))
        want = np.array([np_view_non_collision(p.astype(np.float64),
                                               cloud.astype(np.float64))
                         for p in poses])
        np.testing.assert_array_equal(got, want)

    def test_empty_space_no_collision(self):
        cloud = np.full((100, 3), 10.0, np.float32)
        pose = np.eye(4, dtype=np.float32)[None]
        got = np.asarray(batch_view_non_collision(
            jnp.asarray(pose), jnp.asarray(cloud)))
        assert got[0]


class TestPostProcessing:
    def test_expected_score_bins(self):
        logits = jnp.zeros((3, 4))  # uniform softmax
        s = np.asarray(expected_score(logits))
        np.testing.assert_allclose(s, np.mean([1 / 3, 2 / 3, 1.0]), atol=1e-6)
        s_low = np.asarray(expected_score(logits, upper_bins=False))
        np.testing.assert_allclose(s_low, np.mean([0, 1 / 3, 2 / 3]), atol=1e-6)

    def test_poses_orthonormal_and_sorted(self, rng):
        n, k = 200, 32
        points = jnp.asarray(rng.uniform(-0.2, 0.2, (3, n)).astype(np.float32))
        score_logits = jnp.asarray(rng.randn(3, n).astype(np.float32))
        frame_r = jnp.asarray(rng.randn(9, n).astype(np.float32))
        t_logits = jnp.asarray(rng.randn(4, n).astype(np.float32))
        res = post_process_predictions(points, score_logits, frame_r, t_logits,
                                       0.5, -1.0, num_candidates=k)
        scores = np.asarray(res.scores)
        assert np.all(np.diff(scores) <= 1e-6)  # descending
        r = np.asarray(res.poses)[:, :3, :3]
        eye = np.einsum("nij,nkj->nik", r, r)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (k, 1, 1)), atol=1e-4)

    def test_valid_respects_threshold(self, rng):
        n = 100
        points = jnp.asarray(rng.uniform(-0.2, 0.2, (3, n)).astype(np.float32))
        score_logits = jnp.asarray(np.full((3, n), 0.0, np.float32))
        # all scores equal 2/3 -> a threshold of 0.9 kills everything
        frame_r = jnp.asarray(rng.randn(9, n).astype(np.float32))
        t_logits = jnp.asarray(rng.randn(4, n).astype(np.float32))
        res = post_process_predictions(points, score_logits, frame_r, t_logits,
                                       0.9, -1.0, num_candidates=16)
        assert not np.asarray(res.valid).any()

    def test_importance_sample_prefers_high_scores(self, rng):
        scores = jnp.asarray(np.linspace(0, 1, 50).astype(np.float32))
        valid = jnp.ones(50, bool)
        idx = np.asarray(importance_sample(jax.random.key(0), scores, valid,
                                           200))
        # exp(5x) strongly favours the top: mean selected index near the top
        assert idx.mean() > 35

    def test_importance_sample_skips_invalid(self, rng):
        scores = jnp.asarray(np.ones(20, np.float32))
        valid = jnp.zeros(20, bool).at[7].set(True)
        idx = np.asarray(importance_sample(jax.random.key(1), scores, valid, 8))
        assert (idx == 7).all()


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(REFERENCE_SCENE),
                    reason="bundled scene not available")
def test_detector_end_to_end_tiny(tmp_path, rng):
    """End-to-end smoke test on the bundled real scene with a tiny random
    model (the reference's install check, grasp_proposal_test.py:36-91)."""
    import yaml
    cfg = {
        "MODEL": {"TYPE": "PN2_CLS", "COMPUTE_DTYPE": "float32", "PN2": {
            "NUM_INPUT": 512,
            "NUM_CENTROIDS": "(128, 32)",
            "RADIUS": "(0.02, 0.08)",
            "NUM_NEIGHBOURS": "(16, 16)",
            "SA_CHANNELS": "((16, 32), (32, 64))",
            "FP_CHANNELS": "((32, 32), (32, 32))",
            "NUM_FP_NEIGHBOURS": "(3, 3)",
            "SEG_CHANNELS": "(32,)",
        }},
        "DATA": {"SCORE_CLASSES": 3},
        "TEST": {"BATCH_SIZE": 1},
    }
    cfg_file = tmp_path / "tiny.yaml"
    cfg_file.write_text(yaml.safe_dump(cfg))

    from s4g_tpu.pipeline.detector import GraspDetector
    det = GraspDetector(model=str(cfg_file), output_dir=str(tmp_path),
                        cloud_capacity=8192, num_candidates=64)

    scene = np.load(REFERENCE_SCENE, allow_pickle=True)
    cloud = scene["point_cloud"].T.astype(np.float32)  # (n, 3)
    poses, scores = det.detect(cloud, num_selected=5, score_threshold=0.0,
                               verticalness_threshold=-1.0,
                               collision_check=True, debug=False)
    assert poses.ndim == 3 and poses.shape[1:] == (4, 4)
    assert len(poses) == len(scores)
    if len(poses):
        r = poses[:, :3, :3]
        eye = np.einsum("nij,nkj->nik", r, r)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (len(r), 1, 1)),
                                   atol=1e-3)


@pytest.mark.skipif(not os.path.exists(REFERENCE_SCENE),
                    reason="bundled scene not available")
@pytest.mark.slow
def test_detector_batched_multi_scene(tmp_path, rng):
    """Batched multi-scene inference (BASELINE config #3)."""
    import yaml
    cfg = {
        "MODEL": {"TYPE": "PN2_CLS", "COMPUTE_DTYPE": "float32", "PN2": {
            "NUM_INPUT": 256,
            "NUM_CENTROIDS": "(64, 16)",
            "RADIUS": "(0.02, 0.08)",
            "NUM_NEIGHBOURS": "(16, 16)",
            "SA_CHANNELS": "((16, 16), (16, 32))",
            "FP_CHANNELS": "((16, 16), (16, 16))",
            "NUM_FP_NEIGHBOURS": "(3, 3)",
            "SEG_CHANNELS": "(16,)",
        }},
        "DATA": {"SCORE_CLASSES": 3},
        "TEST": {"BATCH_SIZE": 1},
    }
    cfg_file = tmp_path / "tiny.yaml"
    cfg_file.write_text(yaml.safe_dump(cfg))
    from s4g_tpu.pipeline.detector import GraspDetector
    det = GraspDetector(model=str(cfg_file), output_dir=str(tmp_path),
                        cloud_capacity=4096, num_candidates=32)

    scene = np.load(REFERENCE_SCENE, allow_pickle=True)
    cloud = scene["point_cloud"].T.astype(np.float32)
    sel = np.random.RandomState(0).choice(len(cloud), (2, 2048), replace=True)
    clouds = cloud[sel]                       # (2, 2048, 3)
    results = det.detect_batch(clouds, num_selected=3, score_threshold=0.0,
                               verticalness_threshold=-1.0)
    assert len(results) == 2
    for poses, scores in results:
        assert poses.ndim == 3 and poses.shape[1:] == (4, 4)
        assert len(poses) == len(scores)


@pytest.mark.skipif(not os.path.exists(REFERENCE_SCENE),
                    reason="bundled scene not available")
@pytest.mark.slow
def test_detector_stream_matches_sequential(tmp_path, rng):
    """detect_stream consumes the same RNG sequence as sequential detect()
    calls, so a fresh detector must produce identical poses frame-for-frame
    — only the dispatch overlap differs."""
    import yaml
    cfg = {
        "MODEL": {"TYPE": "PN2_CLS", "COMPUTE_DTYPE": "float32", "PN2": {
            "NUM_INPUT": 256,
            "NUM_CENTROIDS": "(64, 16)",
            "RADIUS": "(0.02, 0.08)",
            "NUM_NEIGHBOURS": "(16, 16)",
            "SA_CHANNELS": "((16, 16), (16, 32))",
            "FP_CHANNELS": "((16, 16), (16, 16))",
            "NUM_FP_NEIGHBOURS": "(3, 3)",
            "SEG_CHANNELS": "(16,)",
        }},
        "DATA": {"SCORE_CLASSES": 3},
        "TEST": {"BATCH_SIZE": 1},
    }
    cfg_file = tmp_path / "tiny.yaml"
    cfg_file.write_text(yaml.safe_dump(cfg))
    from s4g_tpu.pipeline.detector import GraspDetector

    scene = np.load(REFERENCE_SCENE, allow_pickle=True)
    cloud = scene["point_cloud"].T.astype(np.float32)
    sel = np.random.RandomState(0).choice(len(cloud), (3, 2048), replace=True)
    frames = [cloud[s] for s in sel]
    kwargs = dict(num_selected=3, score_threshold=0.0,
                  verticalness_threshold=-1.0)

    det = GraspDetector(model=str(cfg_file), output_dir=str(tmp_path),
                        cloud_capacity=4096, num_candidates=32)
    seq = [det.detect(f, **kwargs) for f in frames]

    # Fresh detector: same seed=0 -> same init variables and RNG sequence.
    det2 = GraspDetector(model=str(cfg_file), output_dir=str(tmp_path),
                         cloud_capacity=4096, num_candidates=32)
    streamed = list(det2.detect_stream(frames, depth=2, **kwargs))

    assert len(streamed) == len(seq)
    for (pa, sa), (pb, sb) in zip(seq, streamed):
        np.testing.assert_array_equal(pa, pb)
        np.testing.assert_array_equal(sa, sb)


@pytest.mark.skipif(not os.path.exists(REFERENCE_SCENE),
                    reason="bundled scene not available")
@pytest.mark.slow
def test_detector_contact_model_regression_t(tmp_path, rng):
    """The contact (PN2 regression-t) model must run through the detector."""
    import yaml
    cfg = {
        "MODEL": {"TYPE": "PN2", "COMPUTE_DTYPE": "float32", "PN2": {
            "NUM_INPUT": 256,
            "NUM_CENTROIDS": "(64, 16)",
            "RADIUS": "(0.02, 0.08)",
            "NUM_NEIGHBOURS": "(16, 16)",
            "SA_CHANNELS": "((16, 16), (16, 32))",
            "FP_CHANNELS": "((16, 16), (16, 16))",
            "NUM_FP_NEIGHBOURS": "(3, 3)",
            "SEG_CHANNELS": "(16,)",
        }},
        "DATA": {"SCORE_CLASSES": 3},
        "TEST": {"BATCH_SIZE": 1},
    }
    cfg_file = tmp_path / "contact_tiny.yaml"
    cfg_file.write_text(yaml.safe_dump(cfg))
    from s4g_tpu.pipeline.detector import GraspDetector
    det = GraspDetector(model=str(cfg_file), output_dir=str(tmp_path),
                        cloud_capacity=4096, num_candidates=32)
    scene = np.load(REFERENCE_SCENE, allow_pickle=True)
    cloud = scene["point_cloud"].T.astype(np.float32)[:3000]
    poses, scores = det.detect(cloud, num_selected=3, score_threshold=0.0,
                               verticalness_threshold=-1.0)
    assert poses.shape[1:] == (4, 4)
    if len(poses):
        r = poses[:, :3, :3]
        eye = np.einsum("nij,nkj->nik", r, r)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (len(r), 1, 1)),
                                   atol=1e-3)


@pytest.mark.skipif(not os.path.exists(REFERENCE_SCENE),
                    reason="bundled scene not available")
def test_detector_sorted_fast_path(tmp_path, rng):
    """Detector integration of MODEL.PN2.SORT_POINTS (the deployment
    configuration): sorted backbone + slab-pruned ball query must produce
    valid orthonormal poses end-to-end."""
    import yaml
    cfg = {
        "MODEL": {"TYPE": "PN2_CLS", "COMPUTE_DTYPE": "float32", "PN2": {
            "NUM_INPUT": 512,
            "SORT_POINTS": True,
            "NUM_CENTROIDS": "(128, 32)",
            "RADIUS": "(0.05, 0.2)",
            "NUM_NEIGHBOURS": "(16, 16)",
            "SA_CHANNELS": "((16, 32), (32, 64))",
            "FP_CHANNELS": "((32, 32), (32, 32))",
            "NUM_FP_NEIGHBOURS": "(3, 3)",
            "SEG_CHANNELS": "(32,)",
        }},
        "DATA": {"SCORE_CLASSES": 3},
        "TEST": {"BATCH_SIZE": 1},
    }
    cfg_file = tmp_path / "sorted.yaml"
    cfg_file.write_text(yaml.safe_dump(cfg))
    from s4g_tpu.pipeline.detector import GraspDetector
    det = GraspDetector(model=str(cfg_file), output_dir=str(tmp_path),
                        cloud_capacity=4096, num_candidates=64)
    scene = np.load(REFERENCE_SCENE, allow_pickle=True)
    cloud = scene["point_cloud"].T.astype(np.float32)[:4000]
    poses, scores = det.detect(cloud, num_selected=4, score_threshold=0.0,
                               verticalness_threshold=-1.0)
    assert poses.shape[1:] == (4, 4) and len(poses) == len(scores)
    if len(poses):
        r = poses[:, :3, :3]
        eye = np.einsum("nij,nkj->nik", r, r)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (len(r), 1, 1)),
                                   atol=1e-3)


@pytest.mark.skipif(not os.path.exists(REFERENCE_SCENE),
                    reason="bundled scene not available")
def test_detector_batched_sorted_deployment_path(tmp_path, rng):
    """detect_batch with the deployment flags (SORT_POINTS + sharded FPS):
    the model runs on a REAL (B, 3, N) batch axis and each scene's result
    must match the single-scene detect_batch of just that scene (the
    batched program may not couple scenes)."""
    import yaml
    cfg = {
        "MODEL": {"TYPE": "PN2_CLS", "COMPUTE_DTYPE": "float32", "PN2": {
            "NUM_INPUT": 256,
            "SORT_POINTS": True,
            "FPS_SHARDS": 4,
            "NUM_CENTROIDS": "(64, 16)",
            "RADIUS": "(0.05, 0.2)",
            "NUM_NEIGHBOURS": "(16, 16)",
            "SA_CHANNELS": "((16, 16), (16, 32))",
            "FP_CHANNELS": "((16, 16), (16, 16))",
            "NUM_FP_NEIGHBOURS": "(3, 3)",
            "SEG_CHANNELS": "(16,)",
        }},
        "DATA": {"SCORE_CLASSES": 3},
        "TEST": {"BATCH_SIZE": 1},
    }
    cfg_file = tmp_path / "sorted_batch.yaml"
    cfg_file.write_text(yaml.safe_dump(cfg))
    from s4g_tpu.pipeline.detector import GraspDetector

    scene = np.load(REFERENCE_SCENE, allow_pickle=True)
    cloud = scene["point_cloud"].T.astype(np.float32)
    sel = np.random.RandomState(0).choice(len(cloud), (2, 2048), replace=True)
    clouds = cloud[sel]                       # (2, 2048, 3)
    # Give scene 1 a DIFFERENT widest axis than scene 0 (roll coordinates):
    # with per-scene sort axes, co-batching it must not perturb scene 0
    # (the shared-batch-axis bug ADVICE r3 flagged).
    clouds[1] = clouds[1][:, [2, 0, 1]]
    spreads = clouds.max(axis=1) - clouds.min(axis=1)      # (2, 3)
    assert np.argmax(spreads[0]) != np.argmax(spreads[1])

    det = GraspDetector(model=str(cfg_file), output_dir=str(tmp_path),
                        cloud_capacity=4096, num_candidates=32, seed=3)
    results = det.detect_batch(clouds, num_selected=3, score_threshold=0.0,
                               verticalness_threshold=-1.0)
    assert len(results) == 2
    for poses, scores in results:
        assert poses.ndim == 3 and poses.shape[1:] == (4, 4)
        assert len(poses) == len(scores)

    # Per-scene independence: rebuild (fresh RNG stream), batch of ONE scene.
    det2 = GraspDetector(model=str(cfg_file), output_dir=str(tmp_path),
                        cloud_capacity=4096, num_candidates=32, seed=3)
    solo = det2.detect_batch(clouds[:1], num_selected=3, score_threshold=0.0,
                             verticalness_threshold=-1.0)
    np.testing.assert_allclose(solo[0][0], results[0][0], atol=1e-5)
    np.testing.assert_allclose(solo[0][1], results[0][1], atol=1e-5)


@pytest.mark.skipif(not os.path.exists(REFERENCE_SCENE),
                    reason="bundled scene not available")
@pytest.mark.slow
def test_detect_batch_sharded_over_mesh_matches_single(tmp_path, rng):
    """Mesh-sharded batch serving (shard_map over the 8-device CPU mesh)
    must produce exactly the single-device batched program's results —
    scenes are independent, so sharding the batch axis is a pure layout
    change (the throughput analog of nn.DataParallel,
    grasp_detector.py:62-63)."""
    import yaml
    cfg = {
        "MODEL": {"TYPE": "PN2_CLS", "COMPUTE_DTYPE": "float32", "PN2": {
            "NUM_INPUT": 256,
            "NUM_CENTROIDS": "(64, 16)",
            "RADIUS": "(0.02, 0.08)",
            "NUM_NEIGHBOURS": "(16, 16)",
            "SA_CHANNELS": "((16, 16), (16, 32))",
            "FP_CHANNELS": "((16, 16), (16, 16))",
            "NUM_FP_NEIGHBOURS": "(3, 3)",
            "SEG_CHANNELS": "(16,)",
        }},
        "DATA": {"SCORE_CLASSES": 3},
        "TEST": {"BATCH_SIZE": 1},
    }
    cfg_file = tmp_path / "tiny.yaml"
    cfg_file.write_text(yaml.safe_dump(cfg))
    from s4g_tpu.parallel.mesh import make_mesh
    from s4g_tpu.pipeline.detector import GraspDetector

    scene = np.load(REFERENCE_SCENE, allow_pickle=True)
    cloud = scene["point_cloud"].T.astype(np.float32)
    sel = np.random.RandomState(1).choice(len(cloud), (8, 1024), replace=True)
    clouds = cloud[sel]                               # (8, 1024, 3)

    det = GraspDetector(model=str(cfg_file), output_dir=str(tmp_path),
                        cloud_capacity=2048, num_candidates=32, seed=5)
    base = det.detect_batch(clouds, num_selected=3, score_threshold=0.0,
                            verticalness_threshold=-1.0)

    mesh = make_mesh(jax.devices()[:8])
    det_sh = GraspDetector(model=str(cfg_file), output_dir=str(tmp_path),
                           cloud_capacity=2048, num_candidates=32, seed=5,
                           variables=det.variables, mesh=mesh)
    shard = det_sh.detect_batch(clouds, num_selected=3, score_threshold=0.0,
                                verticalness_threshold=-1.0)

    assert len(base) == len(shard) == 8
    for (p0, s0), (p1, s1) in zip(base, shard):
        np.testing.assert_allclose(p1, p0, atol=1e-5)
        np.testing.assert_allclose(s1, s0, atol=1e-5)

    # Uneven batch must be rejected up front.
    with pytest.raises(AssertionError):
        det_sh.detect_batch(clouds[:3], num_selected=3, score_threshold=0.0,
                            verticalness_threshold=-1.0)
