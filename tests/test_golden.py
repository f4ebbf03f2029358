"""Golden regression tests: fixed inputs -> exact expected outputs for the
semantics-critical ops, computed from the f64 numpy oracles.  Guards against
silent semantic drift (tie-breaking, scan order, fill rules) that the
tolerance-based tests could miss."""

import numpy as np

import jax.numpy as jnp

from s4g_tpu import ops
from s4g_tpu.ops.sampling import farthest_point_sample

from reference_ops import np_ball_query, np_farthest_point_sample


def _fixed_cloud(n=400):
    """Deterministic low-discrepancy cloud (no RNG: golden stability)."""
    i = np.arange(n, dtype=np.float64)
    x = np.modf(i * 0.7548776662466927)[0]
    y = np.modf(i * 0.5698402909980532)[0]
    z = np.modf(i * 0.3287880500891213)[0]
    return (np.stack([x, y, z], axis=0)[None] * 0.4 - 0.2).astype(np.float32)


def test_fps_golden():
    pts = _fixed_cloud()
    got = np.asarray(farthest_point_sample(jnp.asarray(pts), 32, impl="xla"))
    want = np_farthest_point_sample(pts.astype(np.float64), 32)
    np.testing.assert_array_equal(got, want)
    # stable prefix (golden snapshot): first 8 selections
    np.testing.assert_array_equal(
        got[0, :8], want[0, :8])
    assert got[0, 0] == 0


def test_ball_query_golden():
    pts = _fixed_cloud()
    cents = pts[:, :, ::8]  # every 8th point
    got_idx, got_cnt = ops.ball_query(jnp.asarray(pts), jnp.asarray(cents),
                                      0.05, 8, chunk=32)
    want_idx, want_cnt = np_ball_query(pts.astype(np.float64),
                                       cents.astype(np.float64), 0.05, 8)
    np.testing.assert_array_equal(np.asarray(got_idx), want_idx)
    np.testing.assert_array_equal(np.asarray(got_cnt), want_cnt)
    # scan-order invariant: indices of filled slots are strictly increasing
    idx = np.asarray(got_idx)[0]
    cnt = np.asarray(got_cnt)[0]
    for m in range(len(cnt)):
        filled = idx[m, :cnt[m]]
        assert (np.diff(filled) > 0).all(), m
        # slot-0 fill: trailing slots equal the first neighbour
        if cnt[m] > 0:
            assert (idx[m, cnt[m]:] == filled[0]).all()


def test_duplicate_points_tie_break():
    """Exact duplicates: FPS must resolve by lowest index, ball query keeps
    both duplicates in scan order."""
    pts = np.zeros((1, 3, 6), np.float32)
    pts[0, :, 0] = [0, 0, 0]
    pts[0, :, 1] = [1, 0, 0]
    pts[0, :, 2] = [1, 0, 0]   # duplicate of 1
    pts[0, :, 3] = [0, 1, 0]
    pts[0, :, 4] = [0, 0, 1]
    pts[0, :, 5] = [0, 0, 1]   # duplicate of 4
    got = np.asarray(farthest_point_sample(jnp.asarray(pts), 4, impl="xla"))
    want = np_farthest_point_sample(pts.astype(np.float64), 4)
    np.testing.assert_array_equal(got, want)

    idx, cnt = ops.ball_query(jnp.asarray(pts), jnp.asarray(pts[:, :, 1:2]),
                              0.1, 4)
    assert int(np.asarray(cnt)[0, 0]) == 2
    np.testing.assert_array_equal(np.asarray(idx)[0, 0], [1, 2, 1, 1])
