"""Model factory: cfg -> (flax module, loss_fn, metric_fn).

Mirrors the reference's dispatch (reference:
network_models/models/build_model.py:13-31): MODEL.TYPE selects among GPD /
PointNetGPD / PN2 / PN2_CLS / PN2_LOCAL / EDGEPN2D / EDGEPN2DU.  Losses and
metrics are pure functions with the config's hyperparameters bound in.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

from ..configs.config import Config
from .gpd import GPDClassifier, gpd_loss, gpd_metric
from .pointnet_gpd import (PointNetGPDClassifier, pointnet_gpd_loss,
                           pointnet_gpd_metric)
from .pointnet2 import (PointNet2CLS, PointNet2Local, PointNet2Reg,
                        pointnet2_cls_loss, pointnet2_cls_metric,
                        pointnet2_local_loss, pointnet2_local_metric,
                        pointnet2_loss, pointnet2_metric)


def _dtype(cfg: Config):
    return jnp.dtype(cfg.MODEL.COMPUTE_DTYPE)


def _pn2_kwargs(cfg: Config, section) -> dict:
    return dict(
        score_classes=cfg.DATA.SCORE_CLASSES,
        num_centroids=section.NUM_CENTROIDS,
        radius=section.RADIUS,
        num_neighbours=section.NUM_NEIGHBOURS,
        sa_channels=section.SA_CHANNELS,
        fp_channels=section.FP_CHANNELS,
        num_fp_neighbours=section.NUM_FP_NEIGHBOURS,
        seg_channels=section.SEG_CHANNELS,
        dropout_prob=section.DROPOUT_PROB,
        sort_points=section.SORT_POINTS,
        fps_shards=section.FPS_SHARDS,
        dtype=_dtype(cfg),
    )


def build_model(cfg: Config):
    """Returns (net, loss_fn, metric_fn); net is an un-initialized flax
    module, loss/metric are (preds, labels) -> dict pure functions."""
    model_type = cfg.MODEL.TYPE

    if model_type == "GPD":
        net = GPDClassifier(score_classes=cfg.DATA.SCORE_CLASSES,
                            dropout=cfg.MODEL.GPD.DROPOUT, dtype=_dtype(cfg))
        return net, gpd_loss, gpd_metric

    if model_type == "PointNetGPD":
        net = PointNetGPDClassifier(score_classes=cfg.DATA.SCORE_CLASSES,
                                    dtype=_dtype(cfg))
        return net, pointnet_gpd_loss, pointnet_gpd_metric

    if model_type == "PN2":
        kwargs = _pn2_kwargs(cfg, cfg.MODEL.PN2)
        net = PointNet2Reg(
            num_removal_directions=cfg.DATA.NUM_REMOVAL_DIRECTIONS, **kwargs)
        loss = functools.partial(
            pointnet2_loss, label_smoothing=cfg.MODEL.PN2.LABEL_SMOOTHING,
            neg_weight=cfg.MODEL.PN2.NEG_WEIGHT)
        return net, loss, pointnet2_metric

    if model_type == "PN2_CLS":
        kwargs = _pn2_kwargs(cfg, cfg.MODEL.PN2)
        net = PointNet2CLS(
            num_removal_directions=cfg.DATA.NUM_REMOVAL_DIRECTIONS, **kwargs)
        loss = functools.partial(
            pointnet2_cls_loss, label_smoothing=cfg.MODEL.PN2.LABEL_SMOOTHING,
            neg_weight=cfg.MODEL.PN2.NEG_WEIGHT)
        return net, loss, pointnet2_cls_metric

    if model_type == "PN2_LOCAL":
        kwargs = _pn2_kwargs(cfg, cfg.MODEL.PN2)
        net = PointNet2Local(**kwargs)
        loss = functools.partial(
            pointnet2_local_loss,
            label_smoothing=cfg.MODEL.PN2.LABEL_SMOOTHING,
            neg_weight=cfg.MODEL.PN2.NEG_WEIGHT)
        return net, loss, pointnet2_local_metric

    if model_type == "EDGEPN2D":
        kwargs = _pn2_kwargs(cfg, cfg.MODEL.EDGEPN2D)
        net = PointNet2Reg(
            num_removal_directions=cfg.DATA.NUM_REMOVAL_DIRECTIONS,
            edge_sa=True, **kwargs)
        loss = functools.partial(
            pointnet2_loss,
            label_smoothing=cfg.MODEL.EDGEPN2D.LABEL_SMOOTHING,
            neg_weight=cfg.MODEL.EDGEPN2D.NEG_WEIGHT)
        return net, loss, pointnet2_metric

    if model_type == "EDGEPN2DU":
        kwargs = _pn2_kwargs(cfg, cfg.MODEL.EDGEPN2DU)
        net = PointNet2Reg(
            num_removal_directions=cfg.DATA.NUM_REMOVAL_DIRECTIONS,
            edge_sa=True, edge_fp=True, **kwargs)
        loss = functools.partial(
            pointnet2_loss,
            label_smoothing=cfg.MODEL.EDGEPN2DU.LABEL_SMOOTHING,
            neg_weight=cfg.MODEL.EDGEPN2DU.NEG_WEIGHT)
        return net, loss, pointnet2_metric

    raise ValueError(f"Unknown model: {model_type!r}")
