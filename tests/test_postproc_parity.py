"""Post-processing parity vs a transcription of the reference's
grasp_detector.post_processing (grasp_detector.py:123-185).

The reference's rotation/score association is buggy when thresholding
removes points (documented in pipeline/postprocessing.py); with a threshold
that keeps ALL points and no verticality filter the subset indexing becomes
the identity and the reference math is well-defined — that's the case
checked here, element-for-element."""

import numpy as np
import pytest

import jax.numpy as jnp

from s4g_tpu.configs import real_world_config as realworld
from s4g_tpu.pipeline.postprocessing import (REAL2TRAIN, TRAIN2REAL,
                                             T_BIN_VALUES,
                                             post_process_predictions)


def np_reference_postprocess(points, score_logits, frame_r, t_logits):
    """Transcription of grasp_detector.py:137-185 with score_threshold=-inf
    and verticality threshold=-inf (identity subset)."""
    def softmax(x, axis):
        e = np.exp(x - x.max(axis=axis, keepdims=True))
        return e / e.sum(axis=axis, keepdims=True)

    all_scores = softmax(score_logits, 0)
    c = all_scores.shape[0]
    score_value = np.linspace(0, 1, c + 1)[1:][:, None]
    all_scores = np.sum(score_value * all_scores, axis=0)

    order = np.argsort(all_scores)[::-1]
    rotation = frame_r[:, order].T.reshape(-1, 3, 3)
    pts = points.T[order]
    translation = softmax(t_logits[:, order], 0).T
    scores = all_scores[order]

    t_score = T_BIN_VALUES[None, :]
    global_t = -(translation * t_score).sum(1, keepdims=True) \
        * rotation[:, :, 0] + pts

    x = rotation[:, :, 0]
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    y = rotation[:, :, 1]
    y = y - np.sum(x * y, axis=1, keepdims=True) * x
    y = y / np.linalg.norm(y, axis=1, keepdims=True)
    z = np.cross(x, y)
    mat44 = np.tile(np.eye(4), (len(rotation), 1, 1))
    mat44[:, :3, :3] = np.stack([x, y, z], axis=2)
    mat44[:, :3, 3] = global_t
    mat44 = TRAIN2REAL[None] @ mat44
    return mat44, scores


@pytest.mark.parametrize("seed", [0, 1])
def test_postprocess_matches_reference_identity_path(seed):
    rng = np.random.RandomState(seed)
    n = 96
    points = (rng.rand(3, n) * 0.4 - 0.2).astype(np.float32)
    score_logits = rng.randn(3, n).astype(np.float32)
    frame_r = rng.randn(9, n).astype(np.float32)
    t_logits = rng.randn(4, n).astype(np.float32)

    want_poses, want_scores = np_reference_postprocess(
        points.astype(np.float64), score_logits.astype(np.float64),
        frame_r.astype(np.float64), t_logits.astype(np.float64))

    res = post_process_predictions(
        jnp.asarray(points), jnp.asarray(score_logits), jnp.asarray(frame_r),
        jnp.asarray(t_logits), score_threshold=-1e9,
        vertical_threshold=-1e9, num_candidates=n)
    got_poses = np.asarray(res.poses)
    got_scores = np.asarray(res.scores)

    assert np.asarray(res.valid).all()
    np.testing.assert_allclose(got_scores, want_scores, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(got_poses, want_poses, rtol=1e-3, atol=1e-5)
