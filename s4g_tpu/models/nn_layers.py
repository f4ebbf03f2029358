"""Basic neural layers: point-wise MLP stacks with BatchNorm + ReLU.

Re-design of the reference's nn_utils (SharedMLP / Conv1d / Conv2d / FC,
reference: network_models/nn_utils/mlp.py:55-114, conv.py:6-85, linear.py).
The reference expresses per-point MLPs as 1x1 convolutions over
channels-first tensors; on TPU a 1x1 conv IS a matmul, so here every layer is
a Dense over the trailing channel axis of channels-last tensors — the layout
that puts the (128/256/512/1024-wide) channel dimension on the MXU lanes.

BatchNorm semantics match torch BatchNorm1d/2d with momentum=0.1
(i.e. flax momentum 0.9) and eps=1e-5: statistics are reduced over every
axis except channels, so the same module serves the reference's "1D"
(B, N, C) and "2D" (B, M, K, C) cases.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class PointConv(nn.Module):
    """Dense (= 1x1 conv) + BatchNorm + ReLU over the trailing channel axis.

    Matches reference Conv1d/Conv2d (conv.py:6-85): bias disabled when BN on.
    """
    features: int
    bn: bool = True
    relu: bool = True
    bn_momentum: float = 0.1  # torch convention
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.features, use_bias=not self.bn, dtype=self.dtype,
                     name="conv")(x)
        if self.bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=1.0 - self.bn_momentum,
                epsilon=1e-5,
                dtype=jnp.float32,
                name="bn")(x)
        if self.relu:
            x = nn.relu(x)
        return x


class SharedMLP(nn.Module):
    """Stack of PointConv layers with optional (channel-)dropout.

    Matches reference SharedMLP (mlp.py:55-114).  `channel_dropout` mirrors
    torch's dropout2d on the ndim=2 path: whole channels are dropped
    (broadcast over the spatial axes).
    """
    mlp_channels: Sequence[int]
    dropout_prob: float = 0.0
    channel_dropout: bool = False
    bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, features in enumerate(self.mlp_channels):
            x = PointConv(features, bn=self.bn, dtype=self.dtype,
                          name=f"layer{i}")(x, train=train)
            if self.dropout_prob > 0.0:
                if self.channel_dropout:
                    # Drop whole channels: broadcast the mask over all
                    # non-batch, non-channel axes (torch F.dropout2d).
                    broadcast = tuple(range(1, x.ndim - 1))
                    x = nn.Dropout(self.dropout_prob,
                                   broadcast_dims=broadcast,
                                   deterministic=not train)(x)
                else:
                    x = nn.Dropout(self.dropout_prob,
                                   deterministic=not train)(x)
        return x


class MLP(nn.Module):
    """FC + BN + ReLU stack over (B, C) vectors (reference mlp.py:8-52)."""
    mlp_channels: Sequence[int]
    dropout_prob: float = 0.0
    bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, features in enumerate(self.mlp_channels):
            x = PointConv(features, bn=self.bn, dtype=self.dtype,
                          name=f"layer{i}")(x, train=train)
            if self.dropout_prob > 0.0:
                x = nn.Dropout(self.dropout_prob, deterministic=not train)(x)
        return x
