"""Native runtime tests: C++ host ops vs numpy fallbacks vs the JAX ops,
and the async prefetching loaders."""

import os
import pickle

import numpy as np
import pytest

from s4g_tpu.runtime.host_ops import (native_available, nearest_neighbor_match,
                                      radius_outlier_mask,
                                      voxel_downsample_trace)
from s4g_tpu.runtime.loader import AsyncSceneLoader, FileBackedSceneLoader

REFERENCE_SCENE = "/root/reference/inference/2638_view_0.p"


def test_native_library_builds():
    assert native_available(), "g++ toolchain expected in this image"


class TestVoxelTrace:
    def test_matches_bruteforce(self):
        rng = np.random.RandomState(0)
        pts = rng.uniform(0, 0.1, (500, 3)).astype(np.float32)
        out_pts, trace = voxel_downsample_trace(pts, 0.02)
        # brute force voxel map
        origin = pts.min(0)
        coords = np.floor((pts - origin) / 0.02).astype(np.int64)
        cells = {}
        for i, c in enumerate(coords):
            cells.setdefault(tuple(c), []).append(i)
        assert len(out_pts) == len(cells)
        want = {tuple(np.round(np.mean(pts[v], 0), 5)): max(v)
                for v in cells.values()}
        got = {tuple(np.round(p, 5)): t for p, t in zip(out_pts, trace)}
        assert got == want

    def test_trace_points_into_original(self):
        rng = np.random.RandomState(1)
        pts = rng.uniform(0, 0.05, (200, 3)).astype(np.float32)
        out_pts, trace = voxel_downsample_trace(pts, 0.01)
        assert (trace >= 0).all() and (trace < 200).all()
        # traced point lies in the same voxel as the mean
        origin = pts.min(0)
        c_mean = np.floor((out_pts - origin) / 0.01).astype(np.int64)
        c_src = np.floor((pts[trace] - origin) / 0.01).astype(np.int64)
        np.testing.assert_array_equal(c_mean, c_src)


class TestRadiusOutlier:
    def test_matches_bruteforce(self):
        rng = np.random.RandomState(2)
        pts = np.concatenate([
            rng.normal(0, 0.002, (60, 3)),
            np.array([[1.0, 1, 1], [2, 2, 2]])]).astype(np.float32)
        keep = radius_outlier_mask(pts, 0.02, 10)
        d2 = np.sum((pts[:, None] - pts[None]) ** 2, -1)
        want = (d2 < 0.02 ** 2).sum(1) >= 10
        np.testing.assert_array_equal(keep, want)


class TestGarbageCoordinates:
    def test_sentinel_points_do_not_corrupt_grids(self):
        """Invalid-depth sentinel points (1e4 m, -1e8 m) must neither crash
        the flat-hash grids nor perturb results for the sane points — the
        float->int32 cell cast saturates and cells compare exactly."""
        from s4g_tpu.runtime.host_ops import voxel_downsample_trace

        rng = np.random.RandomState(0)
        pts = (rng.rand(3000, 3) * 0.05).astype(np.float32)  # dense cluster
        dirty = pts.copy()
        dirty[:30] = 1e4
        dirty[30:60] = -9.9e3
        dirty[60:70] = np.array([1e8, -1e8, 5e7], np.float32)

        keep = radius_outlier_mask(dirty, 0.01, 5)
        assert keep[70:].mean() > 0.95          # sane points unaffected
        v, t = voxel_downsample_trace(dirty, 0.004)
        assert len(v) > 100                     # no far-origin collapse

        # sane subset: exact numpy-oracle agreement
        sane = dirty[70:]
        d2 = np.sum((sane[:, None] - sane[None]) ** 2, -1)
        want = (d2 < 0.01 ** 2).sum(1) >= 5
        np.testing.assert_array_equal(
            radius_outlier_mask(sane, 0.01, 5).astype(bool), want)


class TestNNMatch:
    def test_matches_bruteforce(self):
        rng = np.random.RandomState(3)
        ref = rng.uniform(0, 0.2, (300, 3)).astype(np.float32)
        query = ref[:50] + rng.normal(0, 0.001, (50, 3)).astype(np.float32)
        idx, dist2 = nearest_neighbor_match(query, ref, 0.01)
        d2 = np.sum((query[:, None] - ref[None]) ** 2, -1)
        want = d2.argmin(1)
        matched = idx >= 0
        assert matched.all()
        np.testing.assert_array_equal(idx, want)

    def test_out_of_range_gives_minus_one(self):
        ref = np.zeros((5, 3), np.float32)
        query = np.full((3, 3), 10.0, np.float32)
        idx, dist2 = nearest_neighbor_match(query, ref, 0.05)
        assert (idx == -1).all()
        assert (dist2 == -1).all()


@pytest.mark.skipif(not os.path.exists(REFERENCE_SCENE),
                    reason="bundled scene not available")
class TestLoaders:
    def _dataset(self, tmp_path, n_files=6, batch=2):
        from s4g_tpu.train.dataset import SceneGraspDataset
        data = dict(np.load(REFERENCE_SCENE, allow_pickle=True))
        d = tmp_path / "data"
        d.mkdir()
        for i in range(n_files):
            with open(d / f"{i}_view_0.p", "wb") as f:
                pickle.dump(data, f)
        return SceneGraspDataset(str(d), num_points=128, batch_size=batch,
                                 num_frame_points=16, seed=0)

    def test_async_loader_yields_all(self, tmp_path):
        ds = self._dataset(tmp_path)
        batches = list(AsyncSceneLoader(ds, num_workers=2, prefetch=2))
        assert len(batches) == len(ds)
        assert batches[0]["scene_points"].shape == (2, 3, 128)

    def test_file_backed_loader(self, tmp_path):
        ds = self._dataset(tmp_path)
        batches = list(FileBackedSceneLoader(ds, num_workers=3))
        assert len(batches) == len(ds)
        for b in batches:
            assert np.isfinite(b["scene_points"]).all()


class TestGuard:
    """Infra guards for the driver artifacts (runtime/guard.py)."""

    def test_scrubbed_cpu_env_overrides_platform(self, monkeypatch):
        from s4g_tpu.runtime import guard
        monkeypatch.setenv("JAX_PLATFORMS", "axon")
        monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
        monkeypatch.setenv("PALLAS_AXON_REMOTE_COMPILE", "1")
        monkeypatch.setenv(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=2 --foo=1")
        env = guard.scrubbed_cpu_env(8)
        assert env["JAX_PLATFORMS"] == "cpu"          # override, not setdefault
        assert "PALLAS_AXON_POOL_IPS" not in env
        assert "PALLAS_AXON_REMOTE_COMPILE" not in env
        assert env["XLA_FLAGS"].count("device_count") == 1
        assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
        assert "--foo=1" in env["XLA_FLAGS"]
        assert os.environ["JAX_PLATFORMS"] == "axon"  # caller env untouched

    def test_run_subprocess_deadline_kills_hang(self):
        import time
        from s4g_tpu.runtime import guard
        t0 = time.monotonic()
        rc, _ = guard.run_subprocess(
            "import time; time.sleep(60)", timeout_s=2.0)
        assert rc is None                              # deadline, not success
        assert time.monotonic() - t0 < 20

    def test_run_subprocess_captures_output(self):
        from s4g_tpu.runtime import guard
        rc, out = guard.run_subprocess("print('hi'); raise SystemExit(3)",
                                       timeout_s=30.0)
        assert rc == 3 and "hi" in out

    def test_backend_reachable_reports_cpu(self):
        from s4g_tpu.runtime import guard
        # under the test env (CPU platform) the backend must be reachable
        ok, info = guard.backend_reachable(timeout_s=120.0)
        assert ok, info
        assert "BACKEND_OK" in info
