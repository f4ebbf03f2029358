"""PointNet++ grasp-proposal models: PN2 (regression-t), PN2_CLS
(classification-t, the deployed variant), PN2_LOCAL (grasp-eval head), and
the Edge variants (EDGEPN2D / EDGEPN2DU).

Re-design of the reference models (reference: models/PointNet2.py:11-153,
models/PointNet2_tcls.py:10-153, models/PointNet2_local.py:10-164,
models/EdgePointNet2Down.py:9-11, models/EdgePointNet2DownUp.py:8-69) as a
single flax backbone + per-variant heads.  All predictions are emitted in
the reference's channels-first layout ((B, C, N) etc.) so the
post-processing pipeline matches 1:1.

Losses/metrics are pure functions `(preds, labels) -> dict`, mirroring the
(net, loss, metric) triple contract of the reference's build_model
(build_model.py:13-31).

Note on EDGEPN2DU: the reference class is not runnable as released (its
inherited forward references head modules its __init__ never creates,
EdgePointNet2DownUp.py:64-69 vs PointNet2.py:127-140).  Here it is a working
model: Edge SA + Edge FP backbone with the full PN2 regression heads.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax
from flax import linen as nn

from . import functional as F
from .nn_layers import SharedMLP
from .pn2_modules import EdgeFPModule, PointNetSAModule, PointnetFPModule

Array = jax.Array


class PointNet2Backbone(nn.Module):
    """SA pyramid + FP pyramid producing per-point features.

    reference: PointNet2.py:56-124 (identical wiring for all variants).
    """
    num_centroids: Sequence[int]
    radius: Sequence[float]
    num_neighbours: Sequence[int]
    sa_channels: Sequence[Sequence[int]]
    fp_channels: Sequence[Sequence[int]]
    num_fp_neighbours: Sequence[int]
    edge_sa: bool = False
    edge_fp: bool = False
    sort_points: bool = False
    fps_shards: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz: Array, train: bool = False) -> Array:
        """xyz: (B, N, 3) channels-last. Returns per-point features (B, N, C)."""
        num_layers = len(self.num_centroids)
        assert (len(self.radius) == len(self.num_neighbours)
                == len(self.sa_channels) == num_layers)
        assert len(self.fp_channels) == len(self.num_fp_neighbours) == num_layers

        sorted_axis = None
        order = None
        if self.sort_points:
            # Deployment fast path (MODEL.PN2.SORT_POINTS): reorder the
            # cloud along its widest axis so stage-1 ball query can prune
            # to contiguous slabs (ops/neighbors.py).  Input order is
            # arbitrary in this pipeline (the detector random-samples), so
            # this only re-rolls the scan-order/FPS-start arbitrariness;
            # off by default to keep bit-parity with the reference
            # (docs/divergences.md).  Per-point outputs are restored to
            # the caller's order before returning.
            if xyz.shape[0] == 1:
                spread = jnp.max(xyz[0], axis=0) - jnp.min(xyz[0], axis=0)
                sorted_axis = jnp.argmax(spread).astype(jnp.int32)
                keys = lax.dynamic_index_in_dim(xyz[0], sorted_axis, axis=1,
                                                keepdims=False)
                order = jnp.argsort(keys).astype(jnp.int32)[None]   # (1, N)
            else:
                # Batched serving: each scene picks its OWN widest axis and
                # sorts along it (sorted_axis is a per-scene (B,) vector —
                # the slab machinery accepts both forms, see
                # ops/neighbors.py::_axis_keys).  A shared batch axis would
                # make a scene's neighbour selection depend on which other
                # scenes are co-batched (ADVICE r3); per-scene axes keep
                # detect_batch results identical to solo detect.
                spread = jnp.max(xyz, axis=1) - jnp.min(xyz, axis=1)  # (B, 3)
                sorted_axis = jnp.argmax(spread, axis=1).astype(jnp.int32)
                keys = jnp.take_along_axis(
                    xyz, sorted_axis[:, None, None], axis=2)[..., 0]  # (B, N)
                order = jnp.argsort(keys, axis=1).astype(jnp.int32)
            from .pn2_modules import gather_cl
            xyz = gather_cl(xyz, order)

        inter_xyz = [xyz]
        inter_feature: list[Optional[Array]] = [None]
        feature: Optional[Array] = None
        cur_xyz = xyz
        for i in range(num_layers):
            cur_xyz, feature = PointNetSAModule(
                mlp_channels=self.sa_channels[i],
                num_centroids=self.num_centroids[i],
                radius=self.radius[i],
                num_neighbours=self.num_neighbours[i],
                use_xyz=True,
                edge=self.edge_sa,
                fps_shards=self.fps_shards if sorted_axis is not None else 1,
                dtype=self.dtype,
                name=f"sa{i}")(cur_xyz, feature, train=train,
                               sorted_axis=sorted_axis)
            inter_xyz.append(cur_xyz)
            inter_feature.append(feature)

        fp_cls = EdgeFPModule if self.edge_fp else PointnetFPModule
        sparse_xyz, sparse_feature = cur_xyz, feature
        for i in range(num_layers):
            dense_xyz = inter_xyz[-2 - i]
            dense_feature = inter_feature[-2 - i]
            sparse_feature = fp_cls(
                mlp_channels=self.fp_channels[i],
                num_neighbors=self.num_fp_neighbours[i],
                dtype=self.dtype,
                name=f"fp{i}")(dense_xyz, sparse_xyz, dense_feature,
                               sparse_feature, train=train)
            sparse_xyz = dense_xyz
        if order is not None:
            # Restore the caller's point order (one wide row gather; the
            # inverse permutation is a unique-index scatter, not a second
            # argsort).
            from .pn2_modules import gather_cl
            from ..ops.neighbors import invert_permutation
            sparse_feature = gather_cl(sparse_feature,
                                       invert_permutation(order))
        return sparse_feature  # (B, N, C)


class _Head(nn.Module):
    """SharedMLP head + linear logit layer over per-point features."""
    seg_channels: Sequence[int]
    out_features: int
    dropout_prob: float = 0.0
    zero_init: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feature: Array, train: bool = False) -> Array:
        x = SharedMLP(self.seg_channels, dropout_prob=self.dropout_prob,
                      dtype=self.dtype, name="mlp")(feature, train=train)
        init = nn.initializers.zeros if self.zero_init else None
        kwargs = dict(kernel_init=init, bias_init=nn.initializers.zeros) \
            if init is not None else {}
        return nn.Dense(self.out_features, dtype=self.dtype,
                        name="logit", **kwargs)(x)


class PointNet2CLS(nn.Module):
    """PN2_CLS — the deployed curvature model (reference:
    PointNet2_tcls.py:10-153).  Heads: score logits over score bins, raw 9-D
    rotation (orthogonalization deferred to post-processing,
    PointNet2_tcls.py:129-132), 4-class translation-offset logits, 5-way
    sigmoid movability."""
    score_classes: int
    num_centroids: Sequence[int] = (10240, 1024, 128, 0)
    radius: Sequence[float] = (0.2, 0.3, 0.4, -1.0)
    num_neighbours: Sequence[int] = (64, 64, 64, -1)
    sa_channels: Sequence[Sequence[int]] = (
        (32, 32, 64), (64, 64, 128), (128, 128, 256), (256, 512, 1024))
    fp_channels: Sequence[Sequence[int]] = (
        (256, 256), (256, 128), (128, 128), (64, 64, 64))
    num_fp_neighbours: Sequence[int] = (0, 3, 3, 3)
    seg_channels: Sequence[int] = (128,)
    num_removal_directions: int = 5
    dropout_prob: float = 0.5
    edge_sa: bool = False
    edge_fp: bool = False
    sort_points: bool = False
    fps_shards: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, data_batch: dict, train: bool = False) -> dict:
        points = data_batch["scene_points"]          # (B, 3, N) reference layout
        xyz = jnp.swapaxes(points, 1, 2)             # (B, N, 3)
        feature = PointNet2Backbone(
            self.num_centroids, self.radius, self.num_neighbours,
            self.sa_channels, self.fp_channels, self.num_fp_neighbours,
            edge_sa=self.edge_sa, edge_fp=self.edge_fp,
            sort_points=self.sort_points, fps_shards=self.fps_shards,
            dtype=self.dtype, name="backbone")(xyz, train=train)

        logits = _Head(self.seg_channels, self.score_classes,
                       dropout_prob=self.dropout_prob, dtype=self.dtype,
                       name="head_seg")(feature, train=train)
        r = _Head(self.seg_channels, 9, dtype=self.dtype,
                  name="head_R")(feature, train=train)
        t = _Head(self.seg_channels, 4, dtype=self.dtype,
                  name="head_t")(feature, train=train)
        mov = _Head(self.seg_channels, self.num_removal_directions,
                    dropout_prob=self.dropout_prob, dtype=self.dtype,
                    name="head_movable")(feature, train=train)
        mov = jax.nn.sigmoid(mov)

        to_cf = lambda x: jnp.swapaxes(x, 1, 2).astype(jnp.float32)
        return {
            "score": to_cf(logits),         # (B, C, N)
            "frame_R": to_cf(r),            # (B, 9, N)
            "frame_t": to_cf(t),            # (B, 4, N)
            "movable_logits": to_cf(mov),   # (B, 5, N)
        }


class PointNet2Reg(nn.Module):
    """PN2 — regression-t contact model (reference: PointNet2.py:11-153).
    Heads: score logits, 6-D rotation orthogonalized in-net to 9-D
    (PointNet2.py:130-132), residual translation added to the input points
    with zero-initialized head (PointNet2.py:134-137,150-152), movability."""
    score_classes: int
    num_centroids: Sequence[int] = (10240, 1024, 128, 0)
    radius: Sequence[float] = (0.2, 0.3, 0.4, -1.0)
    num_neighbours: Sequence[int] = (64, 64, 64, -1)
    sa_channels: Sequence[Sequence[int]] = (
        (32, 32, 64), (64, 64, 128), (128, 128, 256), (256, 512, 1024))
    fp_channels: Sequence[Sequence[int]] = (
        (256, 256), (256, 128), (128, 128), (64, 64, 64))
    num_fp_neighbours: Sequence[int] = (0, 3, 3, 3)
    seg_channels: Sequence[int] = (128,)
    num_removal_directions: int = 5
    dropout_prob: float = 0.5
    edge_sa: bool = False
    edge_fp: bool = False
    sort_points: bool = False
    fps_shards: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, data_batch: dict, train: bool = False) -> dict:
        points = data_batch["scene_points"]
        xyz = jnp.swapaxes(points, 1, 2)
        feature = PointNet2Backbone(
            self.num_centroids, self.radius, self.num_neighbours,
            self.sa_channels, self.fp_channels, self.num_fp_neighbours,
            edge_sa=self.edge_sa, edge_fp=self.edge_fp,
            sort_points=self.sort_points, fps_shards=self.fps_shards,
            dtype=self.dtype, name="backbone")(xyz, train=train)

        logits = _Head(self.seg_channels, self.score_classes,
                       dropout_prob=self.dropout_prob, dtype=self.dtype,
                       name="head_seg")(feature, train=train)
        r6 = _Head(self.seg_channels, 6, dtype=self.dtype,
                   name="head_R")(feature, train=train)
        dt = _Head(self.seg_channels, 3, zero_init=True, dtype=self.dtype,
                   name="head_t")(feature, train=train)
        mov = _Head(self.seg_channels, self.num_removal_directions,
                    dropout_prob=self.dropout_prob, dtype=self.dtype,
                    name="head_movable")(feature, train=train)
        mov = jax.nn.sigmoid(mov)

        to_cf = lambda x: jnp.swapaxes(x, 1, 2).astype(jnp.float32)
        frame_r = F.rot6d_to_mat9(to_cf(r6))
        frame_t = points.astype(jnp.float32) + to_cf(dt)
        return {
            "scene_score_logits": to_cf(logits),
            "frame_R": frame_r,
            "frame_t": frame_t,
            "movable_logits": to_cf(mov),
        }


class PointNet2Local(nn.Module):
    """PN2_LOCAL — grasp-evaluation variant (reference:
    PointNet2_local.py:10-164).  Grades candidate SE(3) frames by
    concatenating per-point features with a 12-D pose representation
    (repeated 4x = 48 channels) through an eval MLP.  Two modes:
    * training: data_batch["local_search_frame"] (B, 12, V, S) supplies the
      candidates; translation rows are made relative to the points
      (PointNet2_local.py:135-143).
    * deployment: the model grades its own R/t prediction
      (PointNet2_local.py:145-150).
    """
    score_classes: int
    num_centroids: Sequence[int] = (10240, 1024, 128, 0)
    radius: Sequence[float] = (0.2, 0.3, 0.4, -1.0)
    num_neighbours: Sequence[int] = (64, 64, 64, -1)
    sa_channels: Sequence[Sequence[int]] = (
        (32, 32, 64), (64, 64, 128), (128, 128, 256), (256, 512, 1024))
    fp_channels: Sequence[Sequence[int]] = (
        (256, 256), (256, 128), (128, 128), (64, 64, 64))
    num_fp_neighbours: Sequence[int] = (0, 3, 3, 3)
    seg_channels: Sequence[int] = (128,)
    dropout_prob: float = 0.5
    sort_points: bool = False
    fps_shards: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, data_batch: dict, train: bool = False) -> dict:
        points = data_batch["scene_points"]
        xyz = jnp.swapaxes(points, 1, 2)
        feature = PointNet2Backbone(
            self.num_centroids, self.radius, self.num_neighbours,
            self.sa_channels, self.fp_channels, self.num_fp_neighbours,
            sort_points=self.sort_points, fps_shards=self.fps_shards,
            dtype=self.dtype, name="backbone")(xyz, train=train)

        r = _Head(self.seg_channels, 9, dtype=self.dtype,
                  name="head_R")(feature, train=train)          # (B, N, 9)
        dt = _Head(self.seg_channels, 3, zero_init=True, dtype=self.dtype,
                   name="head_t")(feature, train=train)         # (B, N, 3)
        mov = _Head(self.seg_channels, 2, dtype=self.dtype,
                    name="head_movable")(feature, train=train)  # (B, N, 2)

        eval_mlp = SharedMLP(self.seg_channels,
                             dropout_prob=self.dropout_prob,
                             channel_dropout=True, dtype=self.dtype,
                             name="mlp_grasp_eval")
        eval_logit = nn.Dense(self.score_classes, dtype=self.dtype,
                              name="grasp_eval_logit")

        if "local_search_frame" in data_batch:
            # (B, 12, V, S): rows 0:9 rotation, rows 9:12 translation.
            lsf = data_batch["local_search_frame"]
            v, s = lsf.shape[2], lsf.shape[3]
            pts_v = points[:, :, :v, None]                      # (B, 3, V, 1)
            rel_t = lsf[:, 9:] - pts_v
            lsf = jnp.concatenate([lsf[:, :9], rel_t], axis=1)  # (B, 12, V, S)
            lsf_cl = jnp.transpose(lsf, (0, 2, 3, 1))           # (B, V, S, 12)
            pose48 = jnp.tile(lsf_cl, (1, 1, 1, 4))             # (B, V, S, 48)
            feat_v = jnp.repeat(feature[:, :v, None, :], s, axis=2)
            x = jnp.concatenate([feat_v, pose48], axis=-1)
            logits = eval_logit(eval_mlp(x, train=train))       # (B, V, S, C)
            local_logits = jnp.transpose(logits, (0, 3, 1, 2)).astype(jnp.float32)
        else:
            pose12 = jnp.concatenate([r, dt], axis=-1)          # (B, N, 12)
            pose48 = jnp.tile(pose12, (1, 1, 4))
            x = jnp.concatenate([feature, pose48], axis=-1)[:, :, None, :]
            logits = eval_logit(eval_mlp(x, train=train))       # (B, N, 1, C)
            local_logits = jnp.transpose(logits, (0, 3, 1, 2)).astype(jnp.float32)

        to_cf = lambda y: jnp.swapaxes(y, 1, 2).astype(jnp.float32)
        return {
            "local_search_logits": local_logits,
            "frame_R": to_cf(r),
            "frame_t": points.astype(jnp.float32) + to_cf(dt),
            "movable_logits": to_cf(mov),
        }


# -----------------------------------------------------------------------------
# Losses and metrics (pure functions, reference loss weights preserved)
# -----------------------------------------------------------------------------

def _symmetric_r_loss(pred_r: Array, gt_r: Array, gt_score: Array) -> Array:
    """Min-over-flip rotation MSE, score-weighted x5
    (reference: PointNet2.py:182-195)."""
    loss_1 = jnp.mean((pred_r - gt_r) ** 2, axis=1)
    loss_2 = jnp.mean((pred_r - F.flip_mat9_gripper(gt_r)) ** 2, axis=1)
    r_loss = jnp.minimum(loss_1, loss_2)                    # (B, Nf)
    return jnp.mean(r_loss * gt_score) * 5.0


def _score_cls_loss(logits: Array, labels: Array, neg_weight: float,
                    label_smoothing: float) -> Array:
    """Per-point score-bin CE with class 0 down-weighted
    (reference: PointNet2.py:162-180)."""
    score_classes = logits.shape[1]
    weight = jnp.ones(score_classes).at[0].set(neg_weight)
    if label_smoothing > 0:
        flat_logits = jnp.swapaxes(logits, 1, 2).reshape(-1, score_classes)
        return F.smooth_cross_entropy(flat_logits, labels.reshape(-1),
                                      label_smoothing, weight=weight)
    return F.weighted_cross_entropy(logits, labels, weight)


def pointnet2_loss(preds: dict, labels: dict, label_smoothing: float = 0.0,
                   neg_weight: float = 0.1) -> dict:
    """PN2 regression loss dict (reference: PointNet2.py:156-212)."""
    cls_loss = _score_cls_loss(preds["scene_score_logits"],
                               labels["scene_score_labels"],
                               neg_weight, label_smoothing)
    mov_loss = jnp.mean(jnp.abs(
        preds["movable_logits"] - labels["scene_movable_labels"]))

    gt_r = labels["best_frame_R"]
    nf = gt_r.shape[2]
    gt_score = labels["scene_score"][:, :nf]
    r_loss = _symmetric_r_loss(preds["frame_R"][:, :, :nf], gt_r, gt_score)

    gt_t = labels["best_frame_t"]
    pred_t = preds["frame_t"][:, :, :nf]
    t_loss = jnp.mean(jnp.sum((pred_t - gt_t) ** 2, axis=1) * gt_score) * 20.0

    return {"cls_loss": cls_loss, "R_loss": r_loss, "t_loss": t_loss,
            "mov_loss": mov_loss}


def pointnet2_cls_loss(preds: dict, labels: dict, label_smoothing: float = 0.0,
                       neg_weight: float = 0.1) -> dict:
    """PN2_CLS loss dict: same R path, CE over 4 translation bins x0.2
    (reference: PointNet2_tcls.py:156-219)."""
    cls_loss = _score_cls_loss(preds["score"], labels["scene_score_labels"],
                               neg_weight, label_smoothing)
    mov_loss = jnp.mean(jnp.abs(
        preds["movable_logits"] - labels["scene_movable_labels"]))

    gt_r = labels["best_frame_R"]
    nf = gt_r.shape[2]
    gt_score = labels["scene_score"][:, :nf]
    r_loss = _symmetric_r_loss(preds["frame_R"][:, :, :nf], gt_r, gt_score)

    t_loss = F.cross_entropy(preds["frame_t"][:, :, :nf],
                             labels["best_frame_t"]) * 0.2

    return {"cls_loss": cls_loss, "R_loss": r_loss, "t_loss": t_loss,
            "mov_loss": mov_loss}


def pointnet2_local_loss(preds: dict, labels: dict,
                         label_smoothing: float = 0.0,
                         neg_weight: float = 0.1) -> dict:
    """PN2_LOCAL loss dict (reference: PointNet2_local.py:167-226)."""
    logits = preds["local_search_logits"]          # (B, C, V, S)
    score_classes = logits.shape[1]
    weight = jnp.ones(score_classes).at[0].set(neg_weight)
    grasp_labels = labels["scored_grasp_labels"]
    mov_logits = preds["movable_logits"]
    mov_labels = labels["scene_movable_labels"]
    mov_weight = jnp.ones(2).at[0].set(0.4)

    if label_smoothing > 0:
        flat = jnp.transpose(logits, (0, 2, 3, 1)).reshape(-1, score_classes)
        cls_loss = F.smooth_cross_entropy(flat, grasp_labels.reshape(-1),
                                          label_smoothing, weight=weight)
        mov_flat = jnp.swapaxes(mov_logits, 1, 2).reshape(-1, 2)
        mov_loss = F.smooth_cross_entropy(mov_flat, mov_labels.reshape(-1),
                                          label_smoothing, weight=mov_weight)
    else:
        cls_loss = F.weighted_cross_entropy(logits, grasp_labels, weight)
        mov_loss = F.weighted_cross_entropy(mov_logits, mov_labels, mov_weight)

    gt_r = labels["best_frame_R"]
    nf = gt_r.shape[2]
    pred_r = preds["frame_R"][:, :, :nf]
    loss_1 = jnp.mean((pred_r - gt_r) ** 2, axis=1)
    loss_2 = jnp.mean((pred_r - F.flip_mat9_gripper(gt_r)) ** 2, axis=1)
    r_loss = jnp.mean(jnp.minimum(loss_1, loss_2)) * 4.0

    t_loss = jnp.mean(
        (preds["frame_t"][:, :, :nf] - labels["best_frame_t"]) ** 2) * 20.0

    return {"cls_loss": cls_loss, "R_loss": r_loss, "t_loss": t_loss,
            "mov_loss": mov_loss}


def _r_metric(preds: dict, labels: dict, score_weighted: bool) -> Array:
    """Symmetry-aware geodesic rotation error
    (reference: PointNet2.py:233-247)."""
    gt_r = labels["best_frame_R"]
    b, _, nf = gt_r.shape
    pred_r = preds["frame_R"][:, :, :nf]
    gt = jnp.swapaxes(gt_r, 1, 2).reshape(b * nf, 3, 3)
    pred = jnp.swapaxes(pred_r, 1, 2).reshape(b * nf, 3, 3)
    gt_flip = gt.at[:, :, 1:].multiply(-1.0)
    angle = F.geodesic_angle(gt, pred)
    angle_flip = F.geodesic_angle(gt_flip, pred)
    angle_min = jnp.minimum(angle, angle_flip)
    if score_weighted:
        gt_score = labels["scene_score"][:, :nf].reshape(-1)
        return jnp.mean(gt_score * angle_min)
    return jnp.mean(angle_min)


def pointnet2_metric(preds: dict, labels: dict) -> dict:
    """PN2 regression metrics (reference: PointNet2.py:215-258)."""
    score_key = "scene_score_logits" if "scene_score_logits" in preds else "score"
    cls_acc = (jnp.argmax(preds[score_key], axis=1).reshape(-1)
               == labels["scene_score_labels"].reshape(-1)).astype(jnp.float32)
    mov_acc = ((preds["movable_logits"] > 0.5).reshape(-1).astype(jnp.int32)
               == labels["scene_movable_labels"].reshape(-1).astype(jnp.int32)
               ).astype(jnp.float32)
    r_err = _r_metric(preds, labels, score_weighted=True)
    nf = labels["best_frame_R"].shape[2]
    t_err = jnp.mean(jnp.sqrt(jnp.sum(
        (labels["best_frame_t"] - preds["frame_t"][:, :, :nf]) ** 2, axis=1)))
    return {"cls_acc": cls_acc, "mov_acc": mov_acc, "R_err": r_err,
            "t_err": t_err}


def pointnet2_cls_metric(preds: dict, labels: dict) -> dict:
    """PN2_CLS metrics: translation accuracy over bins
    (reference: PointNet2_tcls.py:222-267)."""
    cls_acc = (jnp.argmax(preds["score"], axis=1).reshape(-1)
               == labels["scene_score_labels"].reshape(-1)).astype(jnp.float32)
    mov_acc = ((preds["movable_logits"] > 0.5).reshape(-1).astype(jnp.int32)
               == labels["scene_movable_labels"].reshape(-1).astype(jnp.int32)
               ).astype(jnp.float32)
    r_err = _r_metric(preds, labels, score_weighted=True)
    nf = labels["best_frame_R"].shape[2]
    t_pred = jnp.argmax(preds["frame_t"][:, :, :nf], axis=1).reshape(-1)
    t_acc = (t_pred == labels["best_frame_t"].reshape(-1)).astype(jnp.float32)
    return {"cls_acc": cls_acc, "mov_acc": mov_acc, "R_err": r_err,
            "t_acc": t_acc}


def pointnet2_local_metric(preds: dict, labels: dict) -> dict:
    """PN2_LOCAL metrics (reference: PointNet2_local.py:229-270)."""
    logits = preds["local_search_logits"]
    cls_acc = (jnp.argmax(logits, axis=1).reshape(-1)
               == labels["scored_grasp_labels"].reshape(-1)).astype(jnp.float32)
    mov_acc = (jnp.argmax(preds["movable_logits"], axis=1).reshape(-1)
               == labels["scene_movable_labels"].reshape(-1)).astype(jnp.float32)
    r_err = _r_metric(preds, labels, score_weighted=False)
    nf = labels["best_frame_R"].shape[2]
    t_err = jnp.mean(jnp.sqrt(jnp.sum(
        (labels["best_frame_t"] - preds["frame_t"][:, :, :nf]) ** 2, axis=1)))
    return {"cls_acc": cls_acc, "mov_acc": mov_acc, "R_err": r_err,
            "t_err": t_err}
