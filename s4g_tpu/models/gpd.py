"""GPD baseline: LeNet-style CNN over gripper-frame projection maps.

Re-design of the reference baseline (reference: models/GPD.py:6-97) in flax
(NHWC layout).  Input: 60x60 multi-channel projection maps of the close
region; output: grasp-quality logits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import functional as F

Array = jax.Array


class GPDClassifier(nn.Module):
    """(B, C_in, 60, 60) or (B, G, C_in, 60, 60) -> grasp_logits."""
    score_classes: int
    dropout: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, data_batch: dict, train: bool = False) -> dict:
        maps = data_batch["close_region_projection_maps"]
        if maps.ndim == 5:
            b, g, c, h, w = maps.shape
            maps = maps.reshape(b * g, c, h, w)
        x = jnp.transpose(maps, (0, 2, 3, 1))  # NHWC
        x = nn.Conv(20, (5, 5), padding="VALID", dtype=self.dtype,
                    name="conv1")(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(50, (5, 5), padding="VALID", dtype=self.dtype,
                    name="conv2")(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1)          # (B, 12*12*50)
        x = nn.relu(nn.Dense(500, dtype=self.dtype, name="fc1")(x))
        if self.dropout:
            x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.Dense(self.score_classes, dtype=self.dtype, name="fc2")(x)
        return {"grasp_logits": x.astype(jnp.float32)}


def gpd_loss(preds: dict, labels: dict) -> dict:
    """reference: GPD.py:47-55."""
    return {"cls_loss": F.cross_entropy(
        preds["grasp_logits"][..., None],
        labels["grasp_score_labels"][..., None])}


def gpd_metric(preds: dict, labels: dict) -> dict:
    """Accuracy + precision/recall on the top score bin
    (reference: GPD.py:58-77)."""
    logits = preds["grasp_logits"]
    score_classes = logits.shape[-1]
    labels_ = labels["grasp_score_labels"]
    pred_cls = jnp.argmax(logits, axis=1)
    cls_acc = (pred_cls == labels_).astype(jnp.float32)
    gt_pos = labels_ == score_classes - 1
    pred_pos = pred_cls == score_classes - 1
    true_pos = jnp.sum((gt_pos & pred_pos).astype(jnp.float32))
    precision = true_pos / jnp.clip(jnp.sum(pred_pos.astype(jnp.float32)), 1e-6)
    recall = true_pos / jnp.clip(jnp.sum(gt_pos.astype(jnp.float32)), 1e-6)
    return {"cls_acc": cls_acc, "prec": precision, "recall": recall}
