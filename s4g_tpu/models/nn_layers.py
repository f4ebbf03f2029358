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

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# Behaviour env flags are read ONCE at import: they are consulted at trace
# time inside jitted/compact code, so later env mutations would silently
# miss the jit cache anyway (ADVICE r2).  Tests monkeypatch these module
# attributes instead of the environment.
ENV_MLP_IMPL = os.environ.get("S4G_MLP_IMPL", "auto")
ENV_MLP_FUSE_MIN_ROWS = int(os.environ.get("S4G_MLP_FUSE_MIN_ROWS",
                                           str(1 << 60)))
# "all" | "pooled": which chains the fuse threshold applies to — lets the
# A/B separate the pooled SA stages from the non-pooled FP/seg chains.
ENV_MLP_FUSE_SCOPE = os.environ.get("S4G_MLP_FUSE_SCOPE", "all")
ENV_CAST_ACTIVATIONS = os.environ.get("S4G_CAST_ACTIVATIONS") == "1"
# Whole-SA-stage fusion (ball query + group + chain + pool in one kernel,
# _sa1_fused_eval): "auto" fuse iff batch >= 2 (static at trace time) |
# "0" off | "1" always on (TPU) | "interpret" (any backend).  Measured on
# v5e (round 5, solo-chip measure_batch): unfused wins at b=1 (163.6 vs
# 148.4 scenes/s) but collapses at b>=2 (98.1 / 94.8 at b=2/4) where the
# fused kernel holds (180.5 / 173.7) — hence the batch-conditional default.
ENV_SA1_FUSE = os.environ.get("S4G_SA1_FUSE", "auto")


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
        if ENV_CAST_ACTIVATIONS:
            # Keep inter-layer activations in the compute dtype: BN emits
            # f32, which doubles the gather/concat traffic of every SA/FP
            # stage when the backbone runs bf16.
            x = x.astype(self.dtype)
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

    def _folded_params(self, layers, in_features: int):
        """Per-layer (weight, bias) with BatchNorm folded into the affine.

        Instantiates each layer's params with a tiny dummy call first (the
        unused compute is dead-code-eliminated), so this also works during
        nn.init.
        """
        dummy = jnp.zeros((1, in_features), jnp.float32)
        for layer in layers:
            dummy = layer(dummy, train=False)
        variables = self.variables
        params = []
        for i in range(len(layers)):
            tree = variables["params"][f"layer{i}"]
            w = tree["conv"]["kernel"].astype(jnp.float32)
            if self.bn:
                stats = variables["batch_stats"][f"layer{i}"]["bn"]
                inv = tree["bn"]["scale"].astype(jnp.float32) \
                    * jax.lax.rsqrt(stats["var"].astype(jnp.float32) + 1e-5)
                params.append((w * inv[None, :],
                               tree["bn"]["bias"].astype(jnp.float32)
                               - stats["mean"].astype(jnp.float32) * inv))
            else:
                params.append((w, tree["conv"]["bias"].astype(jnp.float32)))
        return params

    def _sa1_fused_eval(self, layers, points, centroids, pkeys, ckeys,
                        radius: float, k: int, stratified: bool = True,
                        interpret: bool = False):
        """Whole-SA-stage fusion: slab ball query + rel-xyz grouping + the
        3-layer chain + K-max-pool as ONE Pallas kernel (SURVEY §7's fused
        design bet; ops/pallas/sa_fused_kernels.py).  The grouped (M, K, 3)
        rel tensor and the inter-layer activations never reach HBM.

        Args:
            points: (B, 3, N) sorted along the slab axis; centroids:
                (B, 3, M) sorted the same way; pkeys/ckeys: their (B, N) /
                (B, M) sort-axis keys.

        Returns:
            (B, M, C3) pooled features in the compute dtype.
        """
        from ..ops import neighbors as nb
        from ..ops.pallas.sa_fused_kernels import (sa1_fused_slab_pallas,
                                                   sa1_slab_setup)

        (w1, b1), (w2, b2), (w3, b3) = self._folded_params(layers, 3)
        lo_tile, overflow = sa1_slab_setup(pkeys, ckeys, radius,
                                           points.shape[2])

        def fused(_):
            return sa1_fused_slab_pallas(
                points, centroids, lo_tile, radius, k, w1, b1, (w2, w3),
                (b2, b3), interpret=interpret, stratified=stratified)

        def full_scan(_):
            # Overflow fallback: the cloud is physically sorted, so a plain
            # full-scan stratified ball query selects the same K-subset; the
            # chain runs with the same folded affines and bf16 rounding.
            _, cnt, rel = nb.ball_query_grouped(
                points, centroids, radius, k, sorted_axis=None,
                stratified=stratified)
            h = rel.astype(jnp.bfloat16)
            for w, b in ((w1, b1), (w2, b2), (w3, b3)):
                h = jnp.maximum(
                    jnp.einsum("bmki,io->bmko", h, w.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32) + b, 0.0
                ).astype(jnp.bfloat16)
            pooled = jnp.max(h.astype(jnp.float32), axis=2)
            return jnp.where(cnt[..., None] > 0, pooled, 0.0)

        out = jax.lax.cond(overflow, full_scan, fused, operand=None)
        return out.astype(self.dtype)

    def _fused_eval(self, x, layers, max_pool_k: Optional[int],
                    interpret: bool = False):
        """Inference fast path: the whole chain (+ optional neighbour-group
        max-pool) as ONE Pallas kernel with BatchNorm folded into each
        layer's affine — intermediate activations never touch HBM (the
        separate-Dense XLA path moves ~0.9 GB per forward at deployment
        scale).  Param tree and numerics (bf16 matmuls, f32 accumulation)
        match the normal path; BN folding is exact up to one f32 multiply.
        """
        from ..ops.pallas.mlp_kernels import mlp_chain_pallas

        params = self._folded_params(layers, x.shape[-1])
        lead = x.shape[:-1]
        flat = x.reshape(-1, x.shape[-1])
        out = mlp_chain_pallas(flat, tuple(params),
                               (True,) * len(params), max_pool_k,
                               compute_dtype=self.dtype, interpret=interpret)
        if max_pool_k is not None:
            lead = lead[:-1]
        return out.astype(self.dtype).reshape(*lead, out.shape[-1])

    @nn.compact
    def __call__(self, x, train: bool = False,
                 max_pool_k: Optional[int] = None,
                 sa_fuse: Optional[dict] = None):
        """`max_pool_k`: when set, the output is max-pooled over the
        second-to-last (neighbour) axis, which must have that static size —
        fused into the kernel on the TPU inference path.

        `sa_fuse`: whole-SA-stage fusion (see _sa1_fused_eval) — `x` is
        ignored; the kernel selects + groups + runs the chain itself."""
        layers = [PointConv(features, bn=self.bn, dtype=self.dtype,
                            name=f"layer{i}")
                  for i, features in enumerate(self.mlp_channels)]
        if sa_fuse is not None:
            return self._sa1_fused_eval(layers, **sa_fuse)

        impl = ENV_MLP_IMPL
        force = impl in ("pallas", "pallas_interpret")
        flat_rows = 1
        for d in x.shape[:-1]:
            flat_rows *= d
        # Off by default: round-2 isolated microbenchmarks showed a
        # 1.03 -> 0.63 ms win on the first pooled SA stage, but IN CONTEXT
        # the full forward measured slower with any fusion scope (XLA fused
        # the gather / concat / Dense chain better than it fed an opaque
        # kernel), and the round-4 window re-measured it a loss again
        # (-14%, docs/perf_roadmap.md).  Kept behind S4G_MLP_FUSE_MIN_ROWS
        # as a re-measurable A/B.
        min_rows = ENV_MLP_FUSE_MIN_ROWS
        pooled_ok = (max_pool_k is not None and x.shape[-2] == max_pool_k
                     and 2048 % max_pool_k == 0)
        unpooled_ok = (max_pool_k is None
                       and (force or ENV_MLP_FUSE_SCOPE == "all"))
        eligible = ((pooled_ok or unpooled_ok)
                    and (force or flat_rows >= min_rows))
        fusable = (not train and impl != "xla" and eligible
                   and (force or jax.default_backend() == "tpu"))
        if fusable:
            return self._fused_eval(x, layers, max_pool_k,
                                    interpret=impl == "pallas_interpret")

        for i, layer in enumerate(layers):
            x = layer(x, train=train)
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
        if max_pool_k is not None:
            x = jnp.max(x, axis=-2)
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
