"""3-NN feature interpolation.

TPU-native replacement for the reference's interpolate CUDA kernels
(reference: pointnet2_utils/csrc/interpolate_kernel.cu:139-286): a weighted
gather whose autodiff backward is a deterministic XLA scatter-add (the
reference used atomicAdd).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .gather import group_points

Array = jax.Array


def feature_interpolate(feature: Array, index: Array, weight: Array) -> Array:
    """Inverse-distance-weighted 3-NN feature propagation.

    Args:
        feature: (B, C, N2) features of the key (sparse) points.
        index: (B, N1, K) neighbour indices into N2.
        weight: (B, N1, K) interpolation weights.

    Returns:
        (B, C, N1) interpolated features.
    """
    neighbour = group_points(feature, index)          # (B, C, N1, K)
    return jnp.sum(neighbour * weight[:, None], axis=-1)


def interpolation_weights(distance: Array, eps: float = 1e-10) -> Array:
    """Normalized inverse-distance weights from squared distances.

    Matches FeatureInterpolator (reference: pointnet2_utils/modules.py:115-120).
    """
    inv = 1.0 / jnp.clip(distance, min=eps)
    return inv / jnp.sum(inv, axis=-1, keepdims=True)
