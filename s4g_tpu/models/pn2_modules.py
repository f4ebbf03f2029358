"""PointNet++ building blocks (set abstraction / feature propagation).

Re-design of the reference's pointnet2_utils.modules (reference:
network_models/models/pointnet2_utils/modules.py:9-547) as flax modules over
channels-LAST tensors: xyz is (B, N, 3), features are (B, N, C) and grouped
features (B, M, K, C), so the wide channel axis rides the MXU lanes and the
per-point MLPs are plain Dense matmuls.  The neighbour ops (ops/) keep the
reference's channels-first contract; thin transposes bridge the two.

Special cases preserved from the reference:
* num_centroids == 0  -> single global centroid at the origin
  (modules.py:222-229)
* num_centroids == -1 -> all points are centroids (modules.py:231-233)
* grouped xyz is translated by its centroid before the MLP (modules.py:44)
* SA pooling is max over neighbours (modules.py:242-244); the Avg variant
  pools with mean (modules.py:322)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .. import ops
from ..ops.interpolate import interpolation_weights
from .nn_layers import SharedMLP

Array = jax.Array


def _cf(x: Array) -> Array:
    """channels-last (B, N, C) -> channels-first (B, C, N)."""
    return jnp.swapaxes(x, 1, 2)


def gather_cl(x: Array, index: Array) -> Array:
    """Gather rows: (B, N, C) x (B, M) -> (B, M, C).

    Flattened to ONE single-table gather with batch-offset indices: XLA's
    row-gather costs ~3 ns/row on v5e regardless of row width, but its
    *batched* gather lowering degrades super-linearly in B (measured 2.5x
    per scene at B=4), while a flat gather stays linear.

    promise_in_bounds: every index here comes from argsort/FPS/ball-query
    over the same table, so the out-of-bounds select_n pass XLA otherwise
    appends (a full read-modify pass over the gathered output — 0.32 ms
    PER FP-stage gather at b=2, bitcast_select_fusion in the r3 traces)
    is dead weight."""
    b, n, c = x.shape
    if b == 1:
        return jnp.take_along_axis(x, index[..., None], axis=1,
                                   mode="promise_in_bounds")
    off = jnp.arange(b, dtype=index.dtype)[:, None] * n
    flat = jnp.take_along_axis(
        x.reshape(1, b * n, c),
        (index + off).reshape(1, -1)[..., None], axis=1,
        mode="promise_in_bounds")
    return flat.reshape(b, index.shape[1], c)


def group_cl(x: Array, index: Array) -> Array:
    """Group rows: (B, N, C) x (B, M, K) -> (B, M, K, C)."""
    b, _, c = x.shape
    m, k = index.shape[1], index.shape[2]
    out = gather_cl(x, index.reshape(b, m * k))
    return out.reshape(b, m, k, c)


class PointNetSAModule(nn.Module):
    """Set abstraction: FPS -> ball-query grouping -> SharedMLP -> pool.

    reference: modules.py:174-250 (max pool) and 253-329 (mean pool via
    pool="mean").
    """
    mlp_channels: Sequence[int]
    num_centroids: int
    radius: float
    num_neighbours: int
    use_xyz: bool = True
    pool: str = "max"
    edge: bool = False       # EdgeSAModule behaviour (modules.py:407-475)
    fps_shards: int = 1      # >1: sharded FPS (deployment divergence)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz: Array, feature: Optional[Array],
                 train: bool = False,
                 sorted_axis: Optional[Array] = None) -> Tuple[Array, Array]:
        """`sorted_axis`: traced scalar (or per-scene (B,) vector) hint
        that `xyz` is sorted ascending along that coordinate — enables the
        slab-pruned ball query (ops/neighbors.py); results are identical
        to the full scan."""
        b = xyz.shape[0]
        if self.num_centroids == 0:
            # Global stage: one centroid at the origin, group = all points.
            new_xyz = jnp.zeros((b, 1, 3), dtype=xyz.dtype)
            group_xyz = xyz[:, None]                      # (B, 1, N, 3)
            group_feature = feature[:, None]              # (B, 1, N, C)
            if self.use_xyz:
                group_feature = jnp.concatenate([group_xyz, group_feature], -1)
        else:
            if self.num_centroids == -1:
                new_xyz = xyz
                centroid_feature = feature
            else:
                from ..ops.sampling import fps_sharding_applies
                sharded = (sorted_axis is not None
                           and fps_sharding_applies(
                               xyz.shape[1], self.num_centroids,
                               self.fps_shards))
                index = ops.farthest_point_sample(
                    _cf(xyz), self.num_centroids,
                    num_shards=self.fps_shards if sharded else 1,
                    sort_local=sharded)
                if sorted_axis is not None and not sharded:
                    # Sortedness INVARIANT: `sorted_axis` is passed down to
                    # every stage, so this stage's output (next stage's
                    # input) must itself be sorted along that axis.  The
                    # sharded FPS path emits ascending indices already
                    # (sort_local); the exact path re-sorts here (~0.14 ms
                    # at deployment scale).
                    from ..ops.neighbors import _axis_keys, flat_gather_rows
                    keys = _axis_keys(jnp.swapaxes(xyz, 1, 2),
                                      jnp.asarray(sorted_axis, jnp.int32))
                    ckeys = flat_gather_rows(keys[..., None], index)[..., 0]
                    index = flat_gather_rows(
                        index[..., None],
                        jnp.argsort(ckeys, axis=1).astype(jnp.int32)
                    )[..., 0]
                new_xyz = gather_cl(xyz, index)
                centroid_feature = (gather_cl(feature, index)
                                    if feature is not None else None)

            # Whenever the sortedness invariant is active, the centroids
            # are themselves sorted along sorted_axis (sharded FPS emits
            # ascending indices; the exact-FPS path re-sorts above; the
            # all-points case inherits the input order) — promise it so
            # the pruned ball query skips its argsort + permute round-trip.
            # Sorted scan order also biases first-K selection of overfull
            # balls to the low-coordinate side — out-of-distribution for
            # weights trained on unsorted clouds (measured grasp-overlap
            # collapse, docs/divergences.md) — so sorted stages select a
            # rank-STRATIFIED K-subset instead (ops/neighbors.py).
            csorted = sorted_axis is not None
            if feature is not None:
                nbr_index, _ = ops.ball_query(
                    _cf(xyz), _cf(new_xyz), self.radius,
                    self.num_neighbours, sorted_axis=sorted_axis,
                    centroids_sorted=csorted, stratified=csorted)
                # ONE combined [xyz || feature] gather: a second width-3
                # gather costs as much as the wide one (XLA row gathers are
                # row-count bound, ~3 ns/row on v5e), so fold xyz into the
                # feature rows before gathering.
                both = group_cl(jnp.concatenate([xyz, feature], axis=-1),
                                nbr_index)
                group_xyz = both[..., :3] - new_xyz[:, :, None, :]
                gf = both[..., 3:]
                parts = [gf]
                if self.edge:
                    # neighbour-minus-centroid edge features
                    # (EdgeQueryGrouper, modules.py:70-90)
                    parts.append(gf - centroid_feature[:, :, None, :])
                if self.use_xyz:
                    parts = [group_xyz] + parts
                group_feature = jnp.concatenate(parts, axis=-1)
            else:
                # xyz-only stage (stage 1): candidate for whole-stage fusion
                # — ball query + grouping + chain + pool as one Pallas
                # kernel (nn_layers._sa1_fused_eval; S4G_SA1_FUSE gates the
                # A/B).  Falls through to the unfused route when the stage
                # shape doesn't fit the kernel.
                from .nn_layers import ENV_SA1_FUSE
                want = (ENV_SA1_FUSE == "1"
                        or ENV_SA1_FUSE == "interpret"
                        # auto: batch is static at trace time; the fused
                        # kernel wins at b>=2 and loses at b=1 (numbers at
                        # nn_layers.ENV_SA1_FUSE)
                        or (ENV_SA1_FUSE == "auto" and xyz.shape[0] >= 2))
                fuse = (want and not train and csorted
                        and self.pool == "max" and not self.edge
                        and len(self.mlp_channels) == 3
                        and all(c % 128 == 0 for c in self.mlp_channels)
                        and self.num_neighbours % 8 == 0
                        and (ENV_SA1_FUSE == "interpret"
                             or jax.default_backend() == "tpu"))
                if fuse:
                    from ..ops.neighbors import _axis_keys
                    ax = jnp.asarray(sorted_axis, jnp.int32)
                    pts_cf, cent_cf = _cf(xyz), _cf(new_xyz)
                    mlp = SharedMLP(self.mlp_channels, dtype=self.dtype,
                                    name="mlp")
                    new_feature = mlp(None, sa_fuse=dict(
                        points=pts_cf, centroids=cent_cf,
                        pkeys=_axis_keys(pts_cf, ax),
                        ckeys=_axis_keys(cent_cf, ax),
                        radius=self.radius, k=self.num_neighbours,
                        stratified=True,
                        interpret=ENV_SA1_FUSE == "interpret"))
                    return new_xyz, new_feature
                _, _, group_xyz = ops.ball_query_grouped(
                    _cf(xyz), _cf(new_xyz), self.radius,
                    self.num_neighbours, sorted_axis=sorted_axis,
                    centroids_sorted=csorted, stratified=csorted)
                group_feature = group_xyz.astype(xyz.dtype)

        mlp = SharedMLP(self.mlp_channels, dtype=self.dtype, name="mlp")
        if self.pool == "max":
            # Pool inside SharedMLP so the TPU inference path can fuse the
            # whole chain + max into one kernel (grouped activations never
            # reach HBM).
            new_feature = mlp(group_feature, train=train,
                              max_pool_k=group_feature.shape[2])
        elif self.pool == "mean":
            new_feature = jnp.mean(mlp(group_feature, train=train), axis=2)
        else:
            raise ValueError(self.pool)
        return new_xyz, new_feature


class PointNetSAModuleMSG(nn.Module):
    """Multi-scale-grouping set abstraction (reference: modules.py:332-404).

    Not wired into any released config; provided for API completeness.
    """
    mlp_channels_list: Sequence[Sequence[int]]
    num_centroids: int
    radius_list: Sequence[float]
    num_neighbours_list: Sequence[int]
    use_xyz: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz: Array, feature: Optional[Array],
                 train: bool = False) -> Tuple[Array, Array]:
        if self.num_centroids > 0:
            index = ops.farthest_point_sample(_cf(xyz), self.num_centroids)
            new_xyz = gather_cl(xyz, index)
        else:
            new_xyz = xyz

        outs = []
        for i, (channels, radius, k) in enumerate(zip(
                self.mlp_channels_list, self.radius_list,
                self.num_neighbours_list)):
            nbr_index, _ = ops.ball_query(_cf(xyz), _cf(new_xyz), radius, k)
            group_xyz = group_cl(xyz, nbr_index) - new_xyz[:, :, None, :]
            if feature is not None:
                gf = group_cl(feature, nbr_index)
                group_feature = (jnp.concatenate([group_xyz, gf], -1)
                                 if self.use_xyz else gf)
            else:
                group_feature = group_xyz
            f = SharedMLP(channels, dtype=self.dtype, name=f"mlp{i}")(
                group_feature, train=train,
                max_pool_k=group_feature.shape[2])
            outs.append(f)
        return new_xyz, jnp.concatenate(outs, axis=-1)


class PointnetFPModule(nn.Module):
    """Feature propagation: 3-NN inverse-distance interpolation -> SharedMLP.

    reference: modules.py:478-510 (+ FeatureInterpolator, modules.py:96-132).
    num_neighbors == 0 broadcasts the single global feature instead.
    """
    mlp_channels: Sequence[int]
    num_neighbors: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, dense_xyz, sparse_xyz, dense_feature, sparse_feature,
                 train: bool = False) -> Array:
        if self.num_neighbors == 0:
            assert sparse_xyz.shape[1] == 1
            expanded = jnp.broadcast_to(
                sparse_feature,
                (sparse_feature.shape[0], dense_xyz.shape[1],
                 sparse_feature.shape[2]))
            new_feature = jnp.concatenate([expanded, dense_feature], axis=-1)
        else:
            assert self.num_neighbors == 3
            index, distance = ops.three_nn(_cf(dense_xyz), _cf(sparse_xyz))
            weight = interpolation_weights(distance)
            # Per-neighbour gather-then-fma: avoids materializing the
            # (B, N1, 3, C) grouped tensor (~160 MB at deployment scale,
            # profiled as the FP-stage bottleneck); accumulation order
            # matches the grouped sum bit-for-bit.
            interpolated = None
            for j in range(3):
                term = (gather_cl(sparse_feature, index[:, :, j])
                        * weight[:, :, j:j + 1])
                interpolated = (term if interpolated is None
                                else interpolated + term)
            if dense_feature is not None:
                new_feature = jnp.concatenate(
                    [interpolated, dense_feature], axis=-1)
            else:
                new_feature = interpolated
        return SharedMLP(self.mlp_channels, dtype=self.dtype,
                         name="mlp")(new_feature, train=train)


class EdgeFPModule(nn.Module):
    """Edge feature propagation (reference: modules.py:513-547 +
    EdgeFeatureInterpolator, modules.py:135-171): interpolated features plus
    (gathered - interpolated) edge features per neighbour, SharedMLP, mean
    over the K neighbours."""
    mlp_channels: Sequence[int]
    num_neighbors: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, dense_xyz, sparse_xyz, dense_feature, sparse_feature,
                 train: bool = False) -> Array:
        if self.num_neighbors == 0:
            assert sparse_xyz.shape[1] == 1
            expanded = jnp.broadcast_to(
                sparse_feature,
                (sparse_feature.shape[0], dense_xyz.shape[1],
                 sparse_feature.shape[2]))
            new_feature = jnp.concatenate([expanded, dense_feature], axis=-1)
            return SharedMLP(self.mlp_channels, dtype=self.dtype,
                             name="mlp")(new_feature, train=train)

        assert self.num_neighbors == 3
        k = self.num_neighbors
        index, distance = ops.three_nn(_cf(dense_xyz), _cf(sparse_xyz))
        weight = interpolation_weights(distance)
        gathered = group_cl(sparse_feature, index)             # (B, N1, K, C)
        interpolated = jnp.sum(gathered * weight[..., None], axis=2)
        interp_k = jnp.repeat(interpolated[:, :, None, :], k, axis=2)
        parts = [interp_k, gathered - interp_k]
        if dense_feature is not None:
            parts.append(jnp.repeat(dense_feature[:, :, None, :], k, axis=2))
        new_feature = jnp.concatenate(parts, axis=-1)          # (B, N1, K, *)
        out = SharedMLP(self.mlp_channels, dtype=self.dtype,
                        name="mlp")(new_feature, train=train)
        return jnp.mean(out, axis=2)
