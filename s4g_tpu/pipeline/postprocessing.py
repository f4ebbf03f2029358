"""Grasp post-processing: dense per-point predictions -> ranked SE(3) poses.

TPU-native re-design of the reference's numpy post-processing (reference:
grasp_detector.py:123-185 + importance sampling 236-251): everything is a
fixed-capacity masked program — the variable-length "threshold then filter"
chains become a single top-K selection with validity masks, so the whole
stage jits and fuses with the model forward pass.

Semantics preserved:
* expected score = sum(bin_value * softmax(score_logits)) with bin values
  linspace(0, 1, C+1)[1:]  (grasp_detector.py:143-146)
* candidates must exceed score_threshold (grasp_detector.py:149)
* verticality: the grasp x-axis mapped through TRAIN2REAL then camera2base
  must point up: -(camera2base_R @ train2real_R @ x) . z > threshold
  (grasp_detector.py:153-157)
* translation = -(softmax(t_logits) . [0.08, 0.06, 0.04, 0.02]) along the
  raw rotation x-column + point (grasp_detector.py:165-178)
* Gram-Schmidt orthogonalization, then map to camera frame
  (grasp_detector.py:124-135,179-180)

Known divergence (documented, intended-semantics implemented): the
reference's rotation/score association after thresholding indexes the full
point axis with subset positions (grasp_detector.py:153-164), so its
verticality filter pairs scores with the wrong rotations whenever the
threshold removes points.  Here score rank i, rotation i, point i and
translation i always refer to the same point.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import real_world_config as realworld
from ..utils.math_utils import gram_schmidt_frames, poses_from_rt

Array = jax.Array

# Frame remap used by the deployed detector (grasp_detector.py:26-27).
REAL2TRAIN = np.array([[0, 1, 0, 0], [1, 0, 0, 0],
                       [0, 0, -1, 0], [0, 0, 0, 1]], dtype=np.float32)
TRAIN2REAL = np.linalg.inv(REAL2TRAIN).astype(np.float32)

T_BIN_VALUES = np.array([0.08, 0.06, 0.04, 0.02], dtype=np.float32)


class PostProcessResult(NamedTuple):
    poses: Array      # (K, 4, 4) camera-frame grasp poses, score-descending
    scores: Array     # (K,) expected scores
    valid: Array      # (K,) bool — exceeds threshold AND vertical enough


def expected_score(score_logits: Array, upper_bins: bool = True) -> Array:
    """Softmax expectation over score bins.

    upper_bins=True matches the detector (linspace[1:],
    grasp_detector.py:145); False matches the file logger (linspace[:-1],
    file_logger_cls.py:67).
    """
    c = score_logits.shape[0]
    bins = jnp.linspace(0.0, 1.0, c + 1)
    bins = bins[1:] if upper_bins else bins[:-1]
    prob = jax.nn.softmax(score_logits, axis=0)
    return jnp.sum(bins[:, None] * prob, axis=0)


@functools.partial(jax.jit, static_argnames=("num_candidates",))
def post_process_predictions(points: Array, score_logits: Array,
                             frame_r: Array, frame_t_logits: Array,
                             score_threshold: float,
                             vertical_threshold: float,
                             num_candidates: int = 1024,
                             camera2base: Array | None = None,
                             train2real: Array | None = None
                             ) -> PostProcessResult:
    """Args (single scene, channels-first like the model preds):
        points: (3, N) model-input points (train frame).
        score_logits: (C, N); frame_r: (9, N); frame_t_logits: (4, N).

    Returns top `num_candidates` poses by score with validity mask.
    """
    if camera2base is None:
        camera2base = jnp.asarray(realworld.camera2base, dtype=jnp.float32)
    if train2real is None:
        train2real = jnp.asarray(TRAIN2REAL)

    # Pose math in f32 regardless of the backbone's compute dtype: a bf16
    # Gram-Schmidt leaves ~2e-3 orthonormality error on the RETURNED poses,
    # which alone exceeds the <1e-3 pose-parity budget.  K is tiny (~1024),
    # so the cast costs nothing.
    points = points.astype(jnp.float32)
    score_logits = score_logits.astype(jnp.float32)
    frame_r = frame_r.astype(jnp.float32)
    frame_t_logits = frame_t_logits.astype(jnp.float32)

    scores = expected_score(score_logits)                    # (N,)
    top_scores, top_idx = jax.lax.top_k(scores, num_candidates)

    rot = frame_r.T.reshape(-1, 3, 3)[top_idx]               # (K, 3, 3)
    pts = points.T[top_idx]                                  # (K, 3)
    t_prob = jax.nn.softmax(frame_t_logits[:, top_idx], axis=0)  # (4, K)

    # Verticality of the approach axis in the robot base frame.  NOTE:
    # computed on the RAW, un-orthogonalized rotation column, exactly like
    # the reference (grasp_detector.py:153-156) — its magnitude is
    # unbounded for untrained/lightly-trained models, so "disable" means a
    # very negative threshold (-1e9), not -1.0.
    x_dir = -jnp.matmul(
        jnp.matmul(camera2base[:3, :3], train2real[:3, :3],
                   precision=jax.lax.Precision.HIGHEST),
        rot[:, :, 0].T, precision=jax.lax.Precision.HIGHEST)
    vertical_degree = x_dir[2, :]                            # dot with z-up
    valid = (top_scores > score_threshold) & (vertical_degree > vertical_threshold)

    depth = jnp.sum(t_prob * jnp.asarray(T_BIN_VALUES)[:, None], axis=0)
    translation = -depth[:, None] * rot[:, :, 0] + pts       # (K, 3)

    rot_ortho = gram_schmidt_frames(rot)
    mat44 = poses_from_rt(rot_ortho, translation)            # (K, 4, 4)
    # HIGHEST precision: the TPU default f32 matmul truncates to bf16 in
    # the MXU — ~2e-3 error on the RETURNED rotations otherwise.
    mat44 = jnp.einsum("ij,kjl->kil", train2real, mat44,
                       precision=jax.lax.Precision.HIGHEST)
    return PostProcessResult(mat44, top_scores, valid)


@functools.partial(jax.jit, static_argnames=("num_candidates",))
def post_process_predictions_regression(points: Array, score_logits: Array,
                                        frame_r: Array, frame_t: Array,
                                        score_threshold: float,
                                        vertical_threshold: float,
                                        num_candidates: int = 1024,
                                        camera2base: Array | None = None,
                                        train2real: Array | None = None
                                        ) -> PostProcessResult:
    """Post-processing for the regression-t contact model (MODEL.TYPE=PN2):
    frame_R is already orthogonalized in-net (PointNet2.py:130-132) and
    frame_t is the absolute grasp origin (points + residual,
    PointNet2.py:134-137), so no bin decoding is applied.  The reference's
    released detector only decodes the 4-bin head; this is the natural
    regression twin."""
    if camera2base is None:
        camera2base = jnp.asarray(realworld.camera2base, dtype=jnp.float32)
    if train2real is None:
        train2real = jnp.asarray(TRAIN2REAL)

    # f32 pose math independent of the backbone compute dtype (see
    # post_process_predictions).
    score_logits = score_logits.astype(jnp.float32)
    frame_r = frame_r.astype(jnp.float32)
    frame_t = frame_t.astype(jnp.float32)

    scores = expected_score(score_logits)
    top_scores, top_idx = jax.lax.top_k(scores, num_candidates)
    rot = frame_r.T.reshape(-1, 3, 3)[top_idx]
    translation = frame_t.T[top_idx]

    x_dir = -jnp.matmul(
        jnp.matmul(camera2base[:3, :3], train2real[:3, :3],
                   precision=jax.lax.Precision.HIGHEST),
        rot[:, :, 0].T, precision=jax.lax.Precision.HIGHEST)
    valid = ((top_scores > score_threshold)
             & (x_dir[2, :] > vertical_threshold))

    rot_ortho = gram_schmidt_frames(rot)
    mat44 = poses_from_rt(rot_ortho, translation)
    # HIGHEST precision: the TPU default f32 matmul truncates to bf16 in
    # the MXU — ~2e-3 error on the RETURNED rotations otherwise.
    mat44 = jnp.einsum("ij,kjl->kil", train2real, mat44,
                       precision=jax.lax.Precision.HIGHEST)
    return PostProcessResult(mat44, top_scores, valid)


@functools.partial(jax.jit, static_argnames=("num_selected",))
def importance_sample(key: Array, scores: Array, valid: Array,
                      num_selected: int) -> Array:
    """Inverse-CDF importance sampling over exp(5 * score)
    (reference: grasp_detector.py:236-251, loop -> searchsorted).

    Returns (num_selected,) indices into scores (only valid entries carry
    probability mass).
    """
    weights = jnp.where(valid, jnp.exp(5.0 * scores), 0.0)
    cum = jnp.cumsum(weights)
    targets = jnp.sort(jax.random.uniform(key, (num_selected,))) * cum[-1]
    return jnp.searchsorted(cum, targets, side="left").astype(jnp.int32)
