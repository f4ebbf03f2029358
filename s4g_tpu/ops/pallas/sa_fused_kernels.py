"""Fused set-abstraction stage-1 Pallas kernel.

One VMEM pass per sorted-centroid tile: slab ball-query (distance mask +
rank bisect, the same machinery as neighbor_kernels._bq_fused_kernel) ->
rel-xyz extraction of the selected keys via factored one-hot MXU matmuls ->
the stage's whole SharedMLP chain (BatchNorm folded into each layer's
affine) -> max-pool over the K slots.  The grouped (M, K, C) activations,
the (M*K)-row xyz gather, and the inter-layer HBM round-trips of the
per-layer XLA lowering never exist.

This is the SURVEY §7 "fused ball-query + group + first-MLP-layer" design
bet, distinct from the round-2/4 matmul-chain fusion (which fused only the
MLP layers and fed them from HBM-resident grouped activations — measured a
loss, docs/perf_roadmap.md).

Reference semantics being fused (CUDA):
* ball query first-K/duplicate-fill: ball_query_kernel.cu:50-75
* grouping + centroid translation:   grouping_kernel.cu:32-53, modules.py:44
* SharedMLP + max over K:            modules.py:242-244

Selection here uses the STRATIFIED overfull-ball rule (sorted deployment
clouds, see ops/neighbors.py::_first_k_in_range) — bit-identical to the
unfused sorted route.

Exactness notes:
* The one-hot extraction matmuls run at HIGHEST precision (exact f32
  emulation; Mosaic lowers only DEFAULT/HIGHEST) so the selected
  coordinates come out exactly (0/1 times x recombines to x under the
  pass split); rel = key - centroid is then an exact f32 subtract.
  Computing rel from bf16-rounded coordinates instead would lose ~20% of a
  2 cm offset to cancellation (coords ~1 m, bf16 abs err ~4 mm).
* The MLP matmuls run in the backbone compute dtype (bf16 inputs, f32
  accumulation) like the unfused Dense path; BN folding is exact up to one
  f32 multiply per weight.  Pooled outputs match the unfused sorted route
  to ~1e-2 bf16 tolerances (differential-tested in interpret mode).
* count == 0 centroids emit a zero feature row (the unfused route's
  rel = 0 convention; unreachable in SA stages where centroids are drawn
  from the point set).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_LANES = 128
SA_C_TILE = 512     # centroids per grid step (matches BQ_C_TILE)
SA_K_TILE = 2048    # keys per inner grid step
SA_SLAB_TILES = 4   # key tiles per slab window (8192 keys)


def _coord_cols(planes_ref):
    """(8, T) lane-major planes -> (T, 128) columns (col r = plane row r)."""
    eye = (lax.broadcasted_iota(jnp.int32, (8, _LANES), 0)
           == lax.broadcasted_iota(jnp.int32, (8, _LANES), 1)
           ).astype(jnp.float32)
    return lax.dot_general(planes_ref[:], eye,
                           dimension_numbers=(((0,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32,
                           precision=lax.Precision.HIGHEST)


def _pack_matrix(kt: int) -> Array:
    """[bit-pack | word-count] matrix (KT, 256) bf16 — same layout as
    neighbor_kernels: column u*16 + jl = word u of local block jl."""
    jj = jnp.arange(kt, dtype=jnp.int32)[:, None]
    w_local = jj // 16
    u_of = w_local % 8
    jl_of = w_local // 8
    cc = jnp.arange(128, dtype=jnp.int32)[None, :]
    in_word = (u_of * 16 + jl_of) == cc
    p_pack = jnp.where(in_word, jnp.exp2((jj % 16).astype(jnp.float32)), 0.0)
    return jnp.concatenate([p_pack, in_word.astype(jnp.float32)],
                           axis=1).astype(jnp.bfloat16)


def _sa1_kernel(lo_ref, c_blk, k_blk, pack_ref, w1_ref, b1_ref, w2_ref,
                b2_ref, w3_ref, b3_ref, out_blk,
                m16_scr, wsum_scr, bsum_scr, idx_scr, x2_scr, out_scr,
                *, radius2, k_slots, nb_slab, stratified):
    """One (scene i, centroid tile j, key tile t) grid step; t fastest.

    Phase A accumulates the key tile's packed in-range masks into VMEM
    scratch AND stashes the tile's coordinates in block layout
    (x2_scr[nb, r*128 + w] = coord r of key w in 128-block nb).  The last
    key tile runs the rank bisect (phase B1) and then the extract + MLP +
    pool (phase B2) entirely from VMEM.
    """
    del lo_ref  # consumed by the key-window BlockSpec index map only
    c_ref = c_blk.at[0]
    k_ref = k_blk.at[0]
    out_ref = out_blk.at[0]
    kt = SA_K_TILE
    t = pl.program_id(2)
    c_lanes = c_ref.shape[1]

    # ---- phase A: this key tile's packed masks + coordinate stash ----
    cols = _coord_cols(k_ref)                     # (KT, 128)
    kx, ky, kz = cols[:, 0:1], cols[:, 1:2], cols[:, 2:3]
    dx = kx - c_ref[0:1, :]
    dy = ky - c_ref[1:2, :]
    dz = kz - c_ref[2:3, :]
    d = dx * dx + dy * dy + dz * dz                                # (KT, C)
    mask = (d < radius2).astype(jnp.bfloat16)

    both = lax.dot_general(pack_ref[:], mask,
                           dimension_numbers=(((0,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)     # (256, C)
    wsum_rows = []
    for u in range(8):
        m16_scr[pl.ds(u * nb_slab + t * 16, 16), :] = \
            both[u * 16:(u + 1) * 16]
        w_u = both[128 + u * 16:128 + (u + 1) * 16]
        wsum_scr[pl.ds(u * nb_slab + t * 16, 16), :] = w_u
        wsum_rows.append(w_u)
    bsum_scr[pl.ds(t * 16, 16), :] = sum(wsum_rows)                # (16, C)

    # Coordinate stash: (KT,) plane -> (16, 128) block rows per coord.
    for r in range(3):
        x2_scr[pl.ds(t * 16, 16), r * 128:(r + 1) * 128] = \
            k_ref[r, :].reshape(16, 128)

    # ---- last key tile: bisect + extract + MLP + pool ----
    @pl.when(t == SA_SLAB_TILES - 1)
    def _finish():
        # -- B1: rank bisect (same algorithm as _bq_fused_kernel) --
        bsum = bsum_scr[:]                                         # (NB, C)
        lo_tri = (lax.broadcasted_iota(jnp.int32, (nb_slab, nb_slab), 1)
                  <= lax.broadcasted_iota(jnp.int32, (nb_slab, nb_slab), 0)
                  ).astype(jnp.bfloat16)
        bcum = lax.dot_general(lo_tri, bsum.astype(jnp.bfloat16),
                               dimension_numbers=(((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)  # (NB, C)
        total = bcum[nb_slab - 1:nb_slab, :]                        # (1, C)
        count = jnp.minimum(total, float(k_slots))

        row_nb = lax.broadcasted_iota(jnp.int32, (nb_slab, c_lanes), 0)
        iota8 = lax.broadcasted_iota(jnp.int32, (8, c_lanes), 0)
        bound = jnp.minimum(jnp.max(total), float(k_slots)).astype(jnp.int32)

        def slot_body(s, _):
            if stratified:
                tot_i = total.astype(jnp.int32)                    # (1, C)
                strided = (s * tot_i) // k_slots + 1
                target = jnp.where(tot_i > k_slots, strided,
                                   s + 1).astype(jnp.float32)      # (1, C)
            else:
                target = (s + 1).astype(jnp.float32)
            inb = bcum < target                                    # (NB, C)
            b_idx = jnp.sum(inb, axis=0, dtype=jnp.int32)[None]    # (1, C)
            prefix = jnp.max(jnp.where(inb, bcum, 0.0), axis=0)[None]
            b_idx = jnp.minimum(b_idx, nb_slab - 1)
            onehot = (row_nb == b_idx).astype(jnp.float32)         # (NB, C)

            words, wcnts, wcums = [], [], []
            run_c = jnp.zeros((c_lanes,), jnp.float32)
            for u in range(8):
                m_strip = m16_scr[u * nb_slab:(u + 1) * nb_slab, :]
                w_strip = wsum_scr[u * nb_slab:(u + 1) * nb_slab, :]
                words.append(jnp.sum(onehot * m_strip, axis=0))
                wc = jnp.sum(onehot * w_strip, axis=0)
                wcnts.append(wc)
                run_c = run_c + wc
                wcums.append(run_c)
            words = jnp.stack(words, axis=0)                       # (8, C)
            wcnt = jnp.stack(wcnts, axis=0)                        # (8, C)
            wcum = jnp.stack(wcums, axis=0)                        # (8, C)
            local_t = target - prefix                              # (1, C)
            u_sel = jnp.sum((wcum < local_t).astype(jnp.int32),
                            axis=0)[None]                          # (1, C)
            u_sel = jnp.minimum(u_sel, 7)
            sel8 = (iota8 == u_sel).astype(jnp.float32)            # (8, C)
            wprefix = jnp.sum(sel8 * (wcum - wcnt), axis=0)[None]
            word = jnp.sum(sel8 * words, axis=0)[None].astype(jnp.int32)
            local_t2 = local_t - wprefix                           # (1, C)

            run = jnp.zeros_like(local_t2)
            within = jnp.zeros((1, c_lanes), jnp.int32)
            for tb in range(16):
                bit = (jnp.right_shift(word, tb) & 1).astype(jnp.float32)
                run = run + bit
                within = within + (run < local_t2).astype(jnp.int32)

            idx_scr[pl.ds(s, 1), :] = b_idx * 128 + u_sel * 16 + within
            return 0

        lax.fori_loop(0, bound, slot_body, 0, unroll=False)

        # Duplicate-fill in scratch: slots >= count repeat the first
        # in-range index (slab-LOCAL indices; 0 when count == 0).
        slot_io = lax.broadcasted_iota(
            jnp.int32, (k_slots, c_lanes), 0).astype(jnp.float32)
        first = jnp.where(count > 0, idx_scr[0:1, :], 0)           # (1, C)
        idx_scr[...] = jnp.where(slot_io < count, idx_scr[:], first)

        # -- B2: extract rel-xyz per slot, run the MLP chain, max-pool --
        ccols = _coord_cols(c_ref)                                 # (C, 128)
        cx, cy, cz = ccols[:, 0:1], ccols[:, 1:2], ccols[:, 2:3]

        eye_c = (lax.broadcasted_iota(jnp.int32, (c_lanes, c_lanes), 0)
                 == lax.broadcasted_iota(jnp.int32, (c_lanes, c_lanes), 1)
                 ).astype(jnp.float32)
        iota_nb = lax.broadcasted_iota(jnp.int32, (c_lanes, nb_slab), 1)
        iota_ln = lax.broadcasted_iota(jnp.int32, (c_lanes, _LANES), 1)

        x2 = x2_scr[:]                                             # (NB, 384)
        # Same weight rounding as mlp_chain_pallas (weights cast to the
        # bf16 compute dtype; bf16 products accumulate exactly in f32, so
        # rounding then FMA-ing in f32 is bit-identical to a bf16 matmul).
        w1 = w1_ref[:].astype(jnp.bfloat16).astype(jnp.float32)    # (8, C1)
        b1 = b1_ref[:].astype(jnp.float32)                         # (1, C1)
        w2 = w2_ref[:].astype(jnp.bfloat16)
        b2 = b2_ref[:].astype(jnp.float32)
        w3 = w3_ref[:].astype(jnp.bfloat16)
        b3 = b3_ref[:].astype(jnp.float32)

        out_scr[...] = jnp.zeros_like(out_scr)

        def pool_body(s, _):
            idx_row = idx_scr[pl.ds(s, 1), :].astype(jnp.float32)  # (1, C)
            # Transpose to a column via one exact identity matmul.
            col = lax.dot_general(
                eye_c, idx_row, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST)                   # (C, 1)
            b_col = jnp.floor(col * (1.0 / 128.0))                 # exact
            w_col = col - b_col * 128.0                            # 0..127

            oh_b = (b_col.astype(jnp.int32) == iota_nb
                    ).astype(jnp.float32)                          # (C, NB)
            # Selected key's 128-block, all 3 coords at once — exact
            # (0/1 times x at HIGHEST precision).
            r_blk = lax.dot_general(
                oh_b, x2, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST)                   # (C, 384)
            lane_oh = (w_col.astype(jnp.int32) == iota_ln
                       ).astype(jnp.float32)                       # (C, 128)
            sel_x = jnp.sum(lane_oh * r_blk[:, 0:128], axis=1,
                            keepdims=True)
            sel_y = jnp.sum(lane_oh * r_blk[:, 128:256], axis=1,
                            keepdims=True)
            sel_z = jnp.sum(lane_oh * r_blk[:, 256:384], axis=1,
                            keepdims=True)

            # Exact f32 subtract FIRST, then the backbone's bf16 rounding —
            # the same (cast AFTER differencing) order as the unfused route.
            rel_x = (sel_x - cx).astype(jnp.bfloat16).astype(jnp.float32)
            rel_y = (sel_y - cy).astype(jnp.bfloat16).astype(jnp.float32)
            rel_z = (sel_z - cz).astype(jnp.bfloat16).astype(jnp.float32)

            # Layer 1 via linearity: 3 broadcast FMAs instead of a
            # padded-contraction matmul.
            h = (rel_x * w1[0:1, :] + rel_y * w1[1:2, :]
                 + rel_z * w1[2:3, :] + b1)                        # (C, C1)
            h = jnp.maximum(h, 0.0).astype(jnp.bfloat16)
            h = lax.dot_general(
                h, w2, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + b2
            h = jnp.maximum(h, 0.0).astype(jnp.bfloat16)
            h = lax.dot_general(
                h, w3, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + b3
            h = jnp.maximum(h, 0.0)                                # (C, C3)
            out_scr[...] = jnp.maximum(out_scr[:], h)
            return 0

        # Slots >= bound are duplicate-fill for EVERY centroid (bound is
        # the tile-max in-range count, capped at K); pooling a duplicate
        # never changes the max, so the loop stops at bound (0 iterations
        # when nothing is in range anywhere — out stays zero).
        lax.fori_loop(0, bound, pool_body, 0, unroll=False)

        # count == 0 centroids emit zeros (unfused rel = 0 convention);
        # count as a column via the same transpose trick.
        cnt_col = lax.dot_general(
            eye_c, count, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST)                       # (C, 1)
        out_ref[...] = jnp.where(cnt_col > 0, out_scr[:], 0.0)


def sa1_slab_setup(pkeys: Array, ckeys: Array, radius: float, n: int):
    """Per-centroid-tile key windows for the fused SA kernel.

    Same construction as the slab ball-query route (ops/neighbors.py
    slab_route="kernel"), at the SA tile sizes: searchsorted the sorted key
    axis for each SA_C_TILE-centroid tile's [min - r, max + r] span, clamp
    the window start to a SA_K_TILE boundary, and flag overflow when any
    tile's span exceeds the SA_SLAB_TILES-tile window (the caller falls
    back to a full scan).

    Args:
        pkeys: (B, N) sorted point keys; ckeys: (B, M) sorted centroid keys.

    Returns:
        lo_tile: (B, num_c_tiles) int32 window starts (in SA_K_TILE units);
        overflow: () bool.
    """
    b, m = ckeys.shape
    padt = (-m) % SA_C_TILE
    ck_t = jnp.concatenate(
        [ckeys, jnp.repeat(ckeys[:, -1:], padt, axis=1)], axis=1)
    ntile = (m + padt) // SA_C_TILE
    t_min = ck_t.reshape(b, ntile, SA_C_TILE)[:, :, 0] - radius
    t_max = ck_t.reshape(b, ntile, SA_C_TILE)[:, :, -1] + radius
    lo_t = jax.vmap(lambda pk, t: jnp.searchsorted(pk, t, side="left"))(
        pkeys, t_min).astype(jnp.int32)
    hi_t = jax.vmap(lambda pk, t: jnp.searchsorted(pk, t, side="right"))(
        pkeys, t_max).astype(jnp.int32)
    n_pad_k = max(-(-n // SA_K_TILE) * SA_K_TILE, SA_SLAB_TILES * SA_K_TILE)
    max_lo = n_pad_k // SA_K_TILE - SA_SLAB_TILES
    lo_tile = jnp.clip(lo_t // SA_K_TILE, 0, max_lo)
    overflow = (jnp.max(hi_t - lo_tile * SA_K_TILE)
                > SA_SLAB_TILES * SA_K_TILE)
    return lo_tile, overflow


@functools.partial(jax.jit, static_argnums=(3, 4, 9, 10))
def sa1_fused_slab_pallas(points: Array, centroids: Array, lo_tile: Array,
                          radius: float, num_neighbours: int,
                          w1: Array, b1: Array, w23: tuple, b23: tuple,
                          interpret: bool = False,
                          stratified: bool = True):
    """Fused SA stage 1 over per-centroid-tile key slabs (sorted points).

    Same caller contract as ball_query_fused_slab_pallas (sorted points +
    sorted centroids + BQ_K_TILE-aligned lo_tile windows), plus the folded
    MLP affines.

    Args:
        points: (B, 3, N) sorted along the slab axis; centroids: (B, 3, M)
            sorted the same way; lo_tile: (B, num_c_tiles) int32.
        w1: (3, C1) folded first-layer weight; b1: (C1,).
        w23: ((C1, C2), (C2, C3)) folded weights; b23: ((C2,), (C3,)).

    Returns:
        pooled: (B, M, C3) f32 max-pooled stage output.
    """
    b, _, n = points.shape
    m = centroids.shape[2]
    assert num_neighbours % 8 == 0
    if lo_tile.ndim == 1:
        lo_tile = lo_tile[None]
    kt = SA_K_TILE
    m_pad = ((m + SA_C_TILE - 1) // SA_C_TILE) * SA_C_TILE
    n_pad = ((n + kt - 1) // kt) * kt
    n_pad = max(n_pad, SA_SLAB_TILES * kt)
    nb_slab = SA_SLAB_TILES * (kt // 128)

    w2, w3 = w23
    b2, b3 = b23
    c1 = w1.shape[1]
    c2 = w2.shape[1]
    c3 = w3.shape[1]
    assert c1 % _LANES == 0 and c2 % _LANES == 0 and c3 % _LANES == 0

    def pad_planes(xyz, n_to, pad_val):
        p = jnp.pad(xyz.astype(jnp.float32),
                    ((0, 0), (0, 0), (0, n_to - xyz.shape[2])),
                    constant_values=pad_val)
        return jnp.concatenate(
            [p, jnp.zeros((xyz.shape[0], 5, n_to), jnp.float32)], axis=1)

    k = pad_planes(points, n_pad, 1e9)
    c = pad_planes(centroids, m_pad, 0.0)
    if m_pad > m:
        c = jnp.concatenate(
            [c[:, :, :m], jnp.repeat(c[:, :, m - 1:m], m_pad - m, axis=2)],
            axis=2)

    pack = _pack_matrix(kt)
    w1_aug = jnp.concatenate(
        [w1.astype(jnp.float32), jnp.zeros((5, c1), jnp.float32)], axis=0)

    num_c_tiles = m_pad // SA_C_TILE
    kernel = functools.partial(
        _sa1_kernel, radius2=radius * radius, k_slots=num_neighbours,
        nb_slab=nb_slab, stratified=stratified)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, num_c_tiles, SA_SLAB_TILES),
        in_specs=[
            pl.BlockSpec((1, 8, SA_C_TILE), lambda i, j, t, lo: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, kt), lambda i, j, t, lo: (i, 0, lo[i, j] + t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, 256), lambda i, j, t, lo: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c1), lambda i, j, t, lo: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c1), lambda i, j, t, lo: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c1, c2), lambda i, j, t, lo: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2), lambda i, j, t, lo: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c2, c3), lambda i, j, t, lo: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c3), lambda i, j, t, lo: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, SA_C_TILE, c3),
                               lambda i, j, t, lo: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((8 * nb_slab, SA_C_TILE), jnp.float32),   # m16
            pltpu.VMEM((8 * nb_slab, SA_C_TILE), jnp.float32),   # wsum
            pltpu.VMEM((nb_slab, SA_C_TILE), jnp.float32),       # bsum
            pltpu.VMEM((num_neighbours, SA_C_TILE), jnp.int32),  # idx
            pltpu.VMEM((nb_slab, 3 * _LANES), jnp.float32),      # x2
            pltpu.VMEM((SA_C_TILE, c3), jnp.float32),            # pool acc
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, m_pad, c3), jnp.float32),
        interpret=interpret,
    )(lo_tile.astype(jnp.int32), c, k, pack, w1_aug,
      b1.astype(jnp.float32)[None], w2.astype(jnp.float32),
      b2.astype(jnp.float32)[None], w3.astype(jnp.float32),
      b3.astype(jnp.float32)[None])
    return out[:, :m]
