"""Gather/group ops.

TPU-native replacements for the reference's gather-style CUDA kernels:
* gather_points  (reference: pointnet2_utils/functions.py:10-25, pure ATen)
* group_points   (reference: csrc/grouping_kernel.cu:32-96) — forward gather,
  backward scatter-add; here jax autodiff produces a deterministic XLA
  scatter-add, eliminating the reference's atomicAdd nondeterminism.
* gather_knn     (reference: functions/csrc/gather_knn_kernel.cu:27-50)

All are expressed with take_along_axis so XLA lowers them to on-device
dynamic-gathers with static output shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def gather_points(points: Array, index: Array) -> Array:
    """Gather channels for selected point indices.

    Args:
        points: (B, C, N)
        index: (B, M) integer indices into the N axis.

    Returns:
        (B, C, M)
    """
    idx = index[:, None, :]  # (B, 1, M) broadcasts over channels
    return jnp.take_along_axis(points, idx, axis=2)


def group_points(points: Array, index: Array) -> Array:
    """Group neighbour channels by index.

    Args:
        points: (B, C, N)
        index: (B, M, K) neighbour indices of each centroid.

    Returns:
        (B, C, M, K) grouped features.  Differentiable w.r.t. points
        (scatter-add backward, deterministic under XLA).
    """
    b, c, n = points.shape
    m, k = index.shape[1], index.shape[2]
    idx = index.reshape(b, 1, m * k)
    out = jnp.take_along_axis(points, idx, axis=2)
    return out.reshape(b, c, m, k)


def gather_knn(feature: Array, index: Array) -> Array:
    """Gather k-NN features (same contract as group_points; separate entry
    point mirrors the reference's dgcnn_ext.gather_knn used by EdgeConv)."""
    return group_points(feature, index)
