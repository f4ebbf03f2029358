"""SE(3) math helpers, incl. degenerate-input robustness of Gram-Schmidt.

The orthogonalization rule mirrors the reference post-processing
(inference/grasp_proposal/grasp_detector.py:124-135); the degenerate cases
(zero x column, y parallel to x) are our own hardening — random-init nets
emit such raw 9-D predictions and the pipeline must not produce NaNs.
"""

import jax.numpy as jnp
import numpy as np

from s4g_tpu.utils.math_utils import (
    batch_transformation_inv,
    gram_schmidt_frames,
    poses_from_rt,
    transform_points,
    transformation_inv,
)


def _assert_proper_rotations(R):
    R = np.asarray(R)
    eye = np.broadcast_to(np.eye(3, dtype=R.dtype), R.shape)
    np.testing.assert_allclose(
        np.swapaxes(R, -1, -2) @ R, eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_gram_schmidt_well_conditioned():
    rng = np.random.RandomState(0)
    raw = rng.randn(32, 3, 3).astype(np.float32)
    R = gram_schmidt_frames(jnp.asarray(raw))
    _assert_proper_rotations(R)
    # x column is just the normalized input x.
    x = raw[..., :, 0]
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(R)[..., :, 0], x, atol=1e-5)


def test_gram_schmidt_degenerate_inputs():
    # zero matrix, zero x, y parallel to x, y antiparallel, tiny-norm x,
    # x along e1 with parallel y (exercises the alt-basis switch).
    cases = np.stack([
        np.zeros((3, 3), np.float32),
        np.array([[0, 1, 0], [0, 0, 1], [0, 0, 0]], np.float32).T.reshape(3, 3),
        np.stack([np.array([1, 0, 0.]), np.array([2, 0, 0.]),
                  np.array([0, 0, 1.])], axis=1).astype(np.float32),
        np.stack([np.array([0, 1, 0.]), np.array([0, -3, 0.]),
                  np.array([1, 0, 0.])], axis=1).astype(np.float32),
        np.stack([np.array([1e-9, 0, 0.]), np.array([0, 1e-9, 0.]),
                  np.array([0, 0, 1.])], axis=1).astype(np.float32),
        np.stack([np.array([0, 5, 0.]), np.array([0, 1, 0.]),
                  np.array([0, 0, 1.])], axis=1).astype(np.float32),
    ])
    R = np.asarray(gram_schmidt_frames(jnp.asarray(cases)))
    assert np.isfinite(R).all()
    _assert_proper_rotations(R)


def test_transformation_inv_roundtrip():
    rng = np.random.RandomState(1)
    raw = rng.randn(3, 3).astype(np.float64)
    q, _ = np.linalg.qr(raw)
    T = np.eye(4)
    T[:3, :3] = q
    T[:3, 3] = rng.randn(3)
    np.testing.assert_allclose(transformation_inv(T) @ T, np.eye(4), atol=1e-10)

    batched = jnp.asarray(np.stack([T, T]))
    inv = np.asarray(batch_transformation_inv(batched))
    # jnp casts to float32 by default; tolerance accordingly.
    np.testing.assert_allclose(
        inv @ np.stack([T, T]), np.broadcast_to(np.eye(4), (2, 4, 4)),
        atol=1e-5)


def test_poses_from_rt_and_transform_points():
    rng = np.random.RandomState(2)
    R = np.asarray(gram_schmidt_frames(jnp.asarray(
        rng.randn(4, 3, 3).astype(np.float32))))
    t = rng.randn(4, 3).astype(np.float32)
    poses = np.asarray(poses_from_rt(jnp.asarray(R), jnp.asarray(t)))
    assert poses.shape == (4, 4, 4)
    np.testing.assert_allclose(poses[:, 3], [[0, 0, 0, 1]] * 4)

    pts = rng.randn(4, 3, 7).astype(np.float32)
    out = np.asarray(transform_points(jnp.asarray(pts), jnp.asarray(poses)))
    np.testing.assert_allclose(out, R @ pts + t[..., None], atol=1e-5)
