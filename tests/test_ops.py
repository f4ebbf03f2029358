"""Differential tests: s4g_tpu ops vs the numpy oracles implementing the
reference CUDA semantics (the reference's own testing pattern, cf.
gather_knn.py:27-60)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s4g_tpu import ops
from s4g_tpu.ops.sampling import farthest_point_sample

from reference_ops import (np_ball_query, np_ball_query_stratified,
                           np_farthest_point_sample,
                           np_feature_interpolate, np_group_points,
                           np_three_nn)


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(0)


def _cloud(rng, b, n):
    # table-like cluttered scene scale: points in a ~0.8m cube
    return (rng.rand(b, 3, n) * 0.8 - 0.4).astype(np.float32)


class TestFPS:
    @pytest.mark.parametrize("impl", ["xla", "pallas_interpret"])
    @pytest.mark.parametrize("b,n,m", [(1, 256, 64), (2, 1000, 128)])
    def test_matches_oracle(self, rng, impl, b, n, m):
        pts = _cloud(rng, b, n)
        got = np.asarray(farthest_point_sample(jnp.asarray(pts), m, impl=impl))
        want = np_farthest_point_sample(pts.astype(np.float64), m)
        np.testing.assert_array_equal(got, want)

    def test_first_index_is_zero(self, rng):
        pts = _cloud(rng, 1, 128)
        got = np.asarray(farthest_point_sample(jnp.asarray(pts), 16, impl="xla"))
        assert got[0, 0] == 0

    def test_no_duplicates(self, rng):
        pts = _cloud(rng, 1, 512)
        got = np.asarray(farthest_point_sample(jnp.asarray(pts), 128, impl="xla"))
        assert len(np.unique(got[0])) == 128


class TestShardedFPS:
    """Sharded FPS (deployment divergence): exact FPS per contiguous
    N/G-point shard, M/G centroids each (docs/divergences.md)."""

    def test_per_shard_exactness_vs_oracle(self, rng):
        # Each shard's selections == the f64 oracle FPS run on that shard.
        pts = _cloud(rng, 2, 512)
        g, m = 8, 64
        got = np.asarray(farthest_point_sample(
            jnp.asarray(pts), m, impl="xla", num_shards=g))
        ns, m_g = 512 // g, m // g
        for b in range(2):
            for s in range(g):
                shard = pts[b:b + 1, :, s * ns:(s + 1) * ns]
                want = np_farthest_point_sample(shard.astype(np.float64), m_g)
                np.testing.assert_array_equal(
                    got[b, s * m_g:(s + 1) * m_g] - s * ns, want[0])

    @pytest.mark.parametrize("g", [4, 128])
    def test_pallas_matches_xla(self, rng, g):
        # Chain-interleave (G<128) and lane-parallel (G=128) kernels vs the
        # sharded XLA oracle.
        n, m = (1280, 256) if g == 128 else (512, 64)
        pts = _cloud(rng, 2, n)
        got = np.asarray(farthest_point_sample(
            jnp.asarray(pts), m, impl="pallas_interpret", num_shards=g))
        want = np.asarray(farthest_point_sample(
            jnp.asarray(pts), m, impl="xla", num_shards=g))
        np.testing.assert_array_equal(got, want)

    def test_sort_local_yields_ascending_indices(self, rng):
        pts = np.sort(_cloud(rng, 1, 1280), axis=2)
        got = np.asarray(farthest_point_sample(
            jnp.asarray(pts), 256, impl="xla", num_shards=128,
            sort_local=True))
        assert (np.diff(got[0]) > 0).all()

    def test_indivisible_sizes_fall_back_to_exact(self, rng):
        pts = _cloud(rng, 1, 500)   # 500 % 8 != 0
        got = np.asarray(farthest_point_sample(
            jnp.asarray(pts), 64, impl="xla", num_shards=8))
        want = np_farthest_point_sample(pts.astype(np.float64), 64)
        np.testing.assert_array_equal(got, want)


class TestBallQuery:
    @pytest.mark.parametrize("b,n,m,k,r", [
        (1, 512, 64, 16, 0.1),
        (2, 1024, 128, 64, 0.05),
        (1, 300, 50, 8, 0.02),   # many empty balls
    ])
    def test_matches_oracle(self, rng, b, n, m, k, r):
        pts = _cloud(rng, b, n)
        cent_idx = rng.choice(n, size=m, replace=False)
        cents = pts[:, :, cent_idx]
        got_idx, got_cnt = ops.ball_query(
            jnp.asarray(pts), jnp.asarray(cents), r, k, chunk=32)
        want_idx, want_cnt = np_ball_query(
            pts.astype(np.float64), cents.astype(np.float64), r, k)
        np.testing.assert_array_equal(np.asarray(got_cnt), want_cnt)
        np.testing.assert_array_equal(np.asarray(got_idx), want_idx)

    def test_empty_ball_gives_zero(self, rng):
        pts = np.ones((1, 3, 8), dtype=np.float32)
        cents = np.zeros((1, 3, 4), dtype=np.float32)
        idx, cnt = ops.ball_query(jnp.asarray(pts), jnp.asarray(cents), 0.1, 4)
        assert np.all(np.asarray(idx) == 0)
        assert np.all(np.asarray(cnt) == 0)


class TestBallQueryStratified:
    """Rank-stratified overfull-ball selection (the sorted-deployment
    semantics; see _first_k_in_range).  Every route must match the numpy
    oracle, and count <= K inputs must be bit-identical to first-K."""

    @pytest.mark.parametrize("b,n,m,k,r", [
        (1, 700, 48, 8, 0.35),        # heavily overfull balls
        (2, 1200, 64, 16, 0.2),
    ])
    def test_matches_oracle(self, rng, b, n, m, k, r):
        pts = _cloud(rng, b, n)
        cents = pts[:, :, rng.choice(n, size=m, replace=False)]
        got_idx, got_cnt = ops.ball_query(
            jnp.asarray(pts), jnp.asarray(cents), r, k, chunk=32,
            stratified=True)
        want_idx, want_cnt = np_ball_query_stratified(
            pts.astype(np.float64), cents.astype(np.float64), r, k)
        np.testing.assert_array_equal(np.asarray(got_cnt), want_cnt)
        np.testing.assert_array_equal(np.asarray(got_idx), want_idx)

    def test_sorted_pruned_route_matches_oracle(self, rng):
        b, n, m, k, r = 2, 3000, 96, 16, 0.04
        pts = np.sort(_cloud(rng, b, n), axis=2)  # ascending on every axis
        cents = pts[:, :, ::17][:, :, :m].copy()
        got_idx, got_cnt = ops.ball_query(
            jnp.asarray(pts), jnp.asarray(cents), r, k,
            sorted_axis=jnp.int32(0), slab_capacity=1024, stratified=True)
        want_idx, want_cnt = np_ball_query_stratified(
            pts.astype(np.float64), cents.astype(np.float64), r, k)
        np.testing.assert_array_equal(np.asarray(got_cnt), want_cnt)
        np.testing.assert_array_equal(np.asarray(got_idx), want_idx)

    def test_underfull_identical_to_first_k(self, rng):
        # radius small enough that no ball exceeds K -> both modes equal.
        pts = _cloud(rng, 1, 600)
        cents = pts[:, :, :64]
        a = ops.ball_query(jnp.asarray(pts), jnp.asarray(cents), 0.03, 64)
        s = ops.ball_query(jnp.asarray(pts), jnp.asarray(cents), 0.03, 64,
                           stratified=True)
        assert np.asarray(a[1]).max() < 64
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(s[0]))
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(s[1]))


class TestThreeNN:
    @pytest.mark.parametrize("b,n1,n2", [(1, 200, 64), (2, 513, 100)])
    def test_matches_oracle(self, rng, b, n1, n2):
        q = _cloud(rng, b, n1)
        k = _cloud(rng, b, n2)
        got_idx, got_d = ops.three_nn(jnp.asarray(q), jnp.asarray(k), chunk=64)
        want_idx, want_d = np_three_nn(q.astype(np.float64), k.astype(np.float64))
        np.testing.assert_array_equal(np.asarray(got_idx), want_idx)
        np.testing.assert_allclose(np.asarray(got_d), want_d, rtol=1e-4, atol=1e-6)


class TestGatherGroup:
    def test_gather_points(self, rng):
        pts = _cloud(rng, 2, 100)
        idx = rng.randint(0, 100, size=(2, 30))
        got = ops.gather_points(jnp.asarray(pts), jnp.asarray(idx))
        want = np.stack([pts[b][:, idx[b]] for b in range(2)])
        np.testing.assert_allclose(np.asarray(got), want)

    def test_group_points(self, rng):
        pts = rng.randn(2, 7, 100).astype(np.float32)
        idx = rng.randint(0, 100, size=(2, 20, 5))
        got = ops.group_points(jnp.asarray(pts), jnp.asarray(idx))
        want = np_group_points(pts, idx)
        np.testing.assert_allclose(np.asarray(got), want)

    def test_group_points_grad_is_scatter_add(self, rng):
        """Backward of group_points must scatter-add grads into the source
        (reference: grouping_kernel.cu:57-96)."""
        pts = rng.randn(1, 2, 10).astype(np.float32)
        idx = np.array([[[0, 0, 1], [1, 2, 2]]])  # repeated indices
        f = lambda p: jnp.sum(ops.group_points(p, jnp.asarray(idx)) * 2.0)
        grad = np.asarray(jax.grad(f)(jnp.asarray(pts)))
        want = np.zeros_like(pts)
        for m in range(2):
            for k in range(3):
                want[0, :, idx[0, m, k]] += 2.0
        np.testing.assert_allclose(grad, want)


class TestInterpolate:
    def test_matches_oracle(self, rng):
        feat = rng.randn(2, 8, 50).astype(np.float32)
        idx = rng.randint(0, 50, size=(2, 70, 3))
        w = rng.rand(2, 70, 3).astype(np.float32)
        w /= w.sum(-1, keepdims=True)
        got = ops.feature_interpolate(
            jnp.asarray(feat), jnp.asarray(idx), jnp.asarray(w))
        want = np_feature_interpolate(feat, idx, w)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)

    def test_weights_from_distance(self):
        from s4g_tpu.ops.interpolate import interpolation_weights
        d = jnp.array([[[1.0, 2.0, 4.0]]])
        w = np.asarray(interpolation_weights(d))
        inv = np.array([1.0, 0.5, 0.25])
        np.testing.assert_allclose(w[0, 0], inv / inv.sum(), rtol=1e-6)

    def test_grad_flows(self, rng):
        feat = rng.randn(1, 4, 20).astype(np.float32)
        idx = rng.randint(0, 20, size=(1, 10, 3))
        w = rng.rand(1, 10, 3).astype(np.float32)
        f = lambda x: jnp.sum(ops.feature_interpolate(x, jnp.asarray(idx), jnp.asarray(w)))
        grad = np.asarray(jax.grad(f)(jnp.asarray(feat)))
        assert np.isfinite(grad).all() and np.abs(grad).sum() > 0


class TestBallQuerySortedPruned:
    """Slab-pruned ball query must match the full scan EXACTLY when points
    are sorted along the hint axis (s4g_tpu/ops/neighbors.py)."""

    @pytest.mark.parametrize("axis", [0, 1, 2])
    def test_matches_full_scan(self, rng, axis):
        n, m = 9000, 700
        pts = rng.rand(1, 3, n).astype(np.float32) * 0.6
        pts[0, 2] *= 0.2
        order = np.argsort(pts[0, axis], kind="stable")
        pts = pts[:, :, order]
        cents = pts[:, :, rng.choice(n, m, replace=False)]
        full_i, full_c = ops.ball_query(jnp.asarray(pts), jnp.asarray(cents),
                                        0.03, 32)
        pr_i, pr_c = ops.ball_query(jnp.asarray(pts), jnp.asarray(cents),
                                    0.03, 32, sorted_axis=jnp.int32(axis),
                                    slab_capacity=4096)
        np.testing.assert_array_equal(np.asarray(pr_i), np.asarray(full_i))
        np.testing.assert_array_equal(np.asarray(pr_c), np.asarray(full_c))

    def test_degenerate_overflow_falls_back(self, rng):
        """All points share one axis value: every slab overflows and the
        cond fallback must still give the exact full-scan result."""
        n, m = 9000, 256
        pts = rng.rand(1, 3, n).astype(np.float32)
        pts[0, 0] = 0.5                      # constant sort axis
        order = np.argsort(pts[0, 0], kind="stable")
        pts = pts[:, :, order]
        cents = pts[:, :, rng.choice(n, m, replace=False)]
        full_i, full_c = ops.ball_query(jnp.asarray(pts), jnp.asarray(cents),
                                        0.05, 16)
        pr_i, pr_c = ops.ball_query(jnp.asarray(pts), jnp.asarray(cents),
                                    0.05, 16, sorted_axis=jnp.int32(0),
                                    slab_capacity=4096)
        np.testing.assert_array_equal(np.asarray(pr_i), np.asarray(full_i))
        np.testing.assert_array_equal(np.asarray(pr_c), np.asarray(full_c))


    def test_batched_matches_full_scan(self, rng):
        """Batch axis through the sorted-pruned path (batch serving): every
        scene's slab result must equal its full scan."""
        b, n, m = 3, 8192, 320
        raw = rng.rand(b, 3, n).astype(np.float32) * 0.6
        order = np.argsort(raw[:, 1, :], axis=1)
        pts = np.take_along_axis(raw, order[:, None, :], axis=2)
        cidx = np.stack([rng.choice(n, m, replace=False) for _ in range(b)])
        cents = np.take_along_axis(pts, cidx[:, None, :], axis=2)
        full_i, full_c = ops.ball_query(jnp.asarray(pts), jnp.asarray(cents),
                                        0.03, 16)
        pr_i, pr_c = ops.ball_query(jnp.asarray(pts), jnp.asarray(cents),
                                    0.03, 16, sorted_axis=jnp.int32(1),
                                    slab_capacity=4096)
        np.testing.assert_array_equal(np.asarray(pr_i), np.asarray(full_i))
        np.testing.assert_array_equal(np.asarray(pr_c), np.asarray(full_c))

    def test_centroids_sorted_promise(self, rng):
        """centroids_sorted=True on pre-sorted centroids must equal the
        unpromised call (which sorts internally) exactly, incl. rel."""
        b, n, m, k = 2, 8192, 256, 16
        raw = rng.rand(b, 3, n).astype(np.float32) * 0.6
        pts = np.take_along_axis(raw, np.argsort(raw[:, 0], axis=1)[:, None],
                                 axis=2)
        cidx = np.sort(np.stack([rng.choice(n, m, replace=False)
                                 for _ in range(b)]), axis=1)
        cents = np.take_along_axis(pts, cidx[:, None, :], axis=2)
        a = ops.ball_query_grouped(jnp.asarray(pts), jnp.asarray(cents),
                                   0.03, k, sorted_axis=jnp.int32(0),
                                   slab_capacity=4096)
        bq = ops.ball_query_grouped(jnp.asarray(pts), jnp.asarray(cents),
                                    0.03, k, sorted_axis=jnp.int32(0),
                                    slab_capacity=4096,
                                    centroids_sorted=True)
        for x, y in zip(a, bq):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_grouped_rel_matches_gather(self, rng):
        """ball_query_grouped: rel must equal gather-and-subtract of its
        own indices on BOTH routes (sorted-pruned and plain), batched."""
        b, n, m, k = 2, 8192, 256, 16
        raw = rng.rand(b, 3, n).astype(np.float32) * 0.6
        order = np.argsort(raw[:, 2, :], axis=1)
        pts = np.take_along_axis(raw, order[:, None, :], axis=2)
        cidx = np.stack([rng.choice(n, m, replace=False) for _ in range(b)])
        cents = np.take_along_axis(pts, cidx[:, None, :], axis=2)
        for kwargs in ({"sorted_axis": jnp.int32(2), "slab_capacity": 4096},
                       {}):
            idx, cnt, rel = ops.ball_query_grouped(
                jnp.asarray(pts), jnp.asarray(cents), 0.03, k, **kwargs)
            idx, cnt, rel = map(np.asarray, (idx, cnt, rel))
            want = np.stack([
                pts[i].T[idx[i]] - cents[i].T[:, None, :] for i in range(b)])
            want = np.where(cnt[..., None, None] > 0, want, 0.0)
            np.testing.assert_array_equal(rel, want.astype(np.float32))
