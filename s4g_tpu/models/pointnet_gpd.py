"""PointNetGPD baseline: vanilla PointNet classifier over close-region points.

Re-design of the reference baseline (reference: models/PointNetGPD.py:6-143)
in flax: STN3d input-transform + PointNet feature extractor + FC classifier,
channels-last internally.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import functional as F
from .gpd import gpd_metric as pointnet_gpd_metric  # identical metric surface

Array = jax.Array


class _DenseBNRelu(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.features, dtype=self.dtype, name="fc")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(x)
        return nn.relu(x)


class STN3d(nn.Module):
    """Spatial transformer predicting a 3x3 input alignment
    (reference: PointNetGPD.py:6-38)."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        # x: (B, N, 3)
        h = _DenseBNRelu(64, self.dtype, name="conv1")(x, train)
        h = _DenseBNRelu(128, self.dtype, name="conv2")(h, train)
        h = _DenseBNRelu(1024, self.dtype, name="conv3")(h, train)
        h = jnp.max(h, axis=1)                          # (B, 1024)
        h = _DenseBNRelu(512, self.dtype, name="fc1")(h, train)
        h = _DenseBNRelu(256, self.dtype, name="fc2")(h, train)
        mat = nn.Dense(9, dtype=self.dtype, name="fc3")(h)
        return mat.reshape(-1, 3, 3) + jnp.eye(3, dtype=mat.dtype)


class PointNetGPDClassifier(nn.Module):
    """(B, 3, N) or (B, G, 3, N) close-region points -> grasp_logits
    (reference: PointNetGPD.py:41-100)."""
    score_classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, data_batch: dict, train: bool = False) -> dict:
        pts = data_batch["close_region_points"]
        if pts.ndim == 4:
            b, g, c, n = pts.shape
            pts = pts.reshape(b * g, c, n)
        x = jnp.swapaxes(pts, 1, 2)                     # (B, N, 3)
        trans = STN3d(self.dtype, name="stn")(x, train)
        x = jnp.einsum("bnc,bcd->bnd", x, trans)
        x = _DenseBNRelu(64, self.dtype, name="conv1")(x, train)
        x = _DenseBNRelu(128, self.dtype, name="conv2")(x, train)
        x = nn.Dense(1024, dtype=self.dtype, name="conv3")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn3")(x)
        x = jnp.max(x, axis=1)                          # (B, 1024)
        x = _DenseBNRelu(512, self.dtype, name="fc1")(x, train)
        x = _DenseBNRelu(256, self.dtype, name="fc2")(x, train)
        x = nn.Dense(self.score_classes, dtype=self.dtype, name="fc3")(x)
        return {"grasp_logits": x.astype(jnp.float32)}


def pointnet_gpd_loss(preds: dict, labels: dict) -> dict:
    """reference: PointNetGPD.py:103-111."""
    return {"cls_loss": F.cross_entropy(
        preds["grasp_logits"][..., None],
        labels["grasp_score_labels"][..., None])}
