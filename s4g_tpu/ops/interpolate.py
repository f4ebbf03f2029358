"""3-NN feature interpolation.

TPU-native replacement for the reference's interpolate CUDA kernels
(reference: pointnet2_utils/csrc/interpolate_kernel.cu:139-286): a weighted
gather whose autodiff backward is a deterministic XLA scatter-add (the
reference used atomicAdd).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def feature_interpolate(feature: Array, index: Array, weight: Array) -> Array:
    """Inverse-distance-weighted 3-NN feature propagation.

    Computed as K gather-then-fma terms rather than one (B, C, N1, K)
    grouped tensor: at deployment scale the grouped intermediate is ~160 MB
    and its materialization dominated the FP stages on TPU (profiled); the
    per-term form keeps each pass at (B, C, N1) and lets XLA fuse the
    multiply-accumulate into the gather consumer.

    Args:
        feature: (B, C, N2) features of the key (sparse) points.
        index: (B, N1, K) neighbour indices into N2.
        weight: (B, N1, K) interpolation weights.

    Returns:
        (B, C, N1) interpolated features.
    """
    k = index.shape[-1]
    out = None
    for j in range(k):
        # (B, C, N1) gather of the j-th neighbour's features; the f32
        # weights promote each term to f32, so accumulation matches the
        # grouped formulation bit-for-bit.
        term = jnp.take_along_axis(feature, index[:, None, :, j], axis=-1)
        term = term * weight[:, None, :, j]
        out = term if out is None else out + term
    return out


def interpolation_weights(distance: Array, eps: float = 1e-10) -> Array:
    """Normalized inverse-distance weights from squared distances.

    Matches FeatureInterpolator (reference: pointnet2_utils/modules.py:115-120).
    """
    inv = 1.0 / jnp.clip(distance, min=eps)
    return inv / jnp.sum(inv, axis=-1, keepdims=True)
