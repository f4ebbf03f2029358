"""Loss/metric functional library (pure jnp).

Mirrors the reference's nn_utils.functional (reference:
network_models/nn_utils/functional.py:9-114) and the rotation helpers in
network_models/functions/functions.py:179-207, as pure functions usable
inside jit/grad.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


# -----------------------------------------------------------------------------
# Distances
# -----------------------------------------------------------------------------

def bpdist(feature: Array) -> Array:
    """Batched pairwise squared distances, (B, C, N) -> (B, N, N)."""
    sq = jnp.sum(feature ** 2, axis=1, keepdims=True)       # (B, 1, N)
    inner = jnp.einsum("bcm,bcn->bmn", feature, feature,
                       preferred_element_type=jnp.float32)
    return jnp.swapaxes(sq, 1, 2) + sq - 2.0 * inner


def bpdist2(feature1: Array, feature2: Array) -> Array:
    """(B, C, N1) x (B, C, N2) -> (B, N1, N2) squared distances."""
    sq1 = jnp.sum(feature1 ** 2, axis=1)[..., :, None]
    sq2 = jnp.sum(feature2 ** 2, axis=1)[..., None, :]
    inner = jnp.einsum("bcm,bcn->bmn", feature1, feature2,
                       preferred_element_type=jnp.float32)
    return sq1 + sq2 - 2.0 * inner


def pdist2(feature1: Array, feature2: Array) -> Array:
    """(N1, C) x (N2, C) -> (N1, N2) squared distances."""
    sq1 = jnp.sum(feature1 ** 2, axis=1, keepdims=True)
    sq2 = jnp.sum(feature2 ** 2, axis=1, keepdims=True)
    return sq1 + sq2.T - 2.0 * feature1 @ feature2.T


# -----------------------------------------------------------------------------
# Classification losses
# -----------------------------------------------------------------------------

def encode_one_hot(target: Array, num_classes: int) -> Array:
    return jax.nn.one_hot(target, num_classes, dtype=jnp.float32)


def weighted_cross_entropy(logits: Array, target: Array,
                           class_weight: Array) -> Array:
    """torch.nn.functional.cross_entropy with per-class weights.

    Args:
        logits: (B, C, ...) class axis at dim 1 (torch convention).
        target: (B, ...) integer labels.
        class_weight: (C,).

    Returns:
        scalar: sum(w[y_i] * nll_i) / sum(w[y_i])  (torch 'mean' reduction
        normalizes by the summed weights of the targets).
    """
    logp = jax.nn.log_softmax(logits, axis=1)
    nll = -jnp.take_along_axis(logp, target[:, None], axis=1)[:, 0]
    w = class_weight[target]
    return jnp.sum(w * nll) / jnp.sum(w)


def cross_entropy(logits: Array, target: Array) -> Array:
    """Unweighted CE, class axis at dim 1, mean reduction."""
    logp = jax.nn.log_softmax(logits, axis=1)
    nll = -jnp.take_along_axis(logp, target[:, None], axis=1)[:, 0]
    return jnp.mean(nll)


def smooth_cross_entropy(logits: Array, target: Array, label_smoothing: float,
                         weight: Array | None = None) -> Array:
    """Label-smoothing CE over flattened samples (reference
    functional.py:91-114: plain mean over samples, weights NOT renormalized).

    Args:
        logits: (N, C); target: (N,).
    """
    num_classes = logits.shape[1]
    one_hot = jax.nn.one_hot(target, num_classes, dtype=logits.dtype)
    smooth = one_hot * (1.0 - label_smoothing) + label_smoothing / num_classes
    log_prob = jax.nn.log_softmax(logits, axis=1)
    if weight is not None:
        per_sample = jnp.sum(-smooth * log_prob * weight[None, :], axis=1)
    else:
        per_sample = jnp.sum(-smooth * log_prob, axis=1)
    return jnp.mean(per_sample)


# -----------------------------------------------------------------------------
# Rotation representations
# -----------------------------------------------------------------------------

def rot6d_to_mat9(repre6d: Array) -> Array:
    """6-D rotation representation -> flattened 3x3 rotation, channels-first.

    Input (B, 6, N): rows 0:3 = raw first column b1, rows 3:6 = raw second
    column a2.  Output (B, 9, N): row-major flatten of R = [b1 | b2 | b1xb2]
    (reference: functions/functions.py:179-190).
    """
    # Safe norms: sqrt(sum + eps) keeps value AND gradient finite for the
    # degenerate zero-vector case that can occur at init; eps is far below
    # the 1e-3 pose-parity tolerance for any trained output.
    eps = 1e-24
    b1 = repre6d[:, 0:3]
    b1 = b1 / jnp.sqrt(jnp.sum(b1 * b1, axis=1, keepdims=True) + eps)
    a2 = repre6d[:, 3:6]
    b2 = a2 - jnp.sum(a2 * b1, axis=1, keepdims=True) * b1
    b2 = b2 / jnp.sqrt(jnp.sum(b2 * b2, axis=1, keepdims=True) + eps)
    b3 = jnp.cross(b1, b2, axis=1)
    r = jnp.stack([b1, b2, b3], axis=2)        # (B, 3 rows, 3 cols, N)
    return r.reshape(r.shape[0], 9, -1)


def euler_to_mat9(euler: Array) -> Array:
    """Euler (a, b, h) -> flattened rotation, channels-first (B, 3, N) ->
    (B, 9, N) (reference: functions/functions.py:193-207)."""
    a, b, h = euler[:, 0], euler[:, 1], euler[:, 2]
    sa, sb, sh = jnp.sin(a), jnp.sin(b), jnp.sin(h)
    ca, cb, ch = jnp.cos(a), jnp.cos(b), jnp.cos(h)
    return jnp.stack([
        ca * ch, -ch * sa * cb + sh * sb, ch * sa * sb + sh * cb,
        sa, ca * cb, -ca * sb,
        -sh * ca, sh * sa * cb + ch * sb, -sh * sa * sb + ch * cb,
    ], axis=1)


def flip_mat9_gripper(mat9: Array) -> Array:
    """Negate rotation columns y and z (gripper 180-degree flip symmetry) on
    channels-first flattened rotations (B, 9, N)
    (reference: PointNet2.py:186-189)."""
    sign = jnp.array([1, -1, -1, 1, -1, -1, 1, -1, -1],
                     dtype=mat9.dtype).reshape(1, 9, 1)
    return mat9 * sign


def geodesic_angle(gt_mat: Array, pred_mat: Array) -> Array:
    """Rotation angle of gt @ pred^T for (..., 3, 3) rotations."""
    m = jnp.einsum("...ij,...kj->...ik", gt_mat, pred_mat)
    trace = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    return jnp.arccos(jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0))
