"""Fused Pallas neighbour kernels.

The XLA formulations of 3-NN and ball query materialize (M, N) distance /
mask matrices in HBM and re-read them several times; these kernels keep the
distance tiles resident in VMEM, reading only xyz planes.

Distances are computed in exact f32 difference form — (x1-x2)^2 + ... — the
same arithmetic as the reference CUDA kernels (interpolate_kernel.cu:60,
ball_query_kernel.cu:50-55).  The only MXU use for distances is a tiny
identity mat-vec that turns the lane-major coordinate planes into per-row
columns without a transpose:

    cols = dot_general(planes (8, T), I (8, 128)) -> (T, 128), col r = row r.

(The identity products are exact under HIGHEST precision: the bf16x-pass
split of x times 1.0 recombines to x.)  Element-wise broadcasts then build
the (T, K) distance tile on the VPU at ~8 f32 ops per pair — cheaper and
more faithful than an MXU matmul-form distance, whose default f32 path
truncates multiplies to bfloat16 (error ~1e-3, larger than the stage-1
ball-query radius^2 of 4e-4).
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
Q_TILE = 256


def _coord_cols(planes_ref):
    """(8, T) lane-major planes -> (T, 128) columns (col r = plane row r)."""
    eye = (lax.broadcasted_iota(jnp.int32, (8, _LANES), 0)
           == lax.broadcasted_iota(jnp.int32, (8, _LANES), 1)
           ).astype(jnp.float32)
    return lax.dot_general(planes_ref[:], eye,
                           dimension_numbers=(((0,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32,
                           precision=lax.Precision.HIGHEST)


def _pad_planes(xyz: Array, n_pad: int, pad_val: float) -> Array:
    """(B, 3, N) -> (B, 8, N_pad) zero-row-padded xyz planes."""
    b, _, n = xyz.shape
    p = jnp.pad(xyz.astype(jnp.float32), ((0, 0), (0, 0), (0, n_pad - n)),
                constant_values=pad_val)
    return jnp.concatenate([p, jnp.zeros((b, 5, n_pad), jnp.float32)], axis=1)


def _three_nn_kernel(q_ref, k_ref, idx_ref, dist_ref, d_scr):
    """One query tile vs ALL keys.

    q_ref: (8, Q_TILE) query xyz planes (rows 3:8 zero); k_ref: (8, NK_pad)
    key planes (padded keys parked at +1e9); idx_ref/dist_ref: (8, Q_TILE)
    outputs, rows 0:3 hold the 3 nearest (ascending exact sq distance, ties
    to lowest key index); d_scr: (Q_TILE, NK_pad) VMEM distance scratch.
    """
    nk = k_ref.shape[1]
    cols = _coord_cols(q_ref)                     # (Q, 128)
    qx, qy, qz = cols[:, 0:1], cols[:, 1:2], cols[:, 2:3]
    dx = qx - k_ref[0:1, :]
    dy = qy - k_ref[1:2, :]
    dz = qz - k_ref[2:3, :]
    d_scr[:] = dx * dx + dy * dy + dz * dz        # (Q, NK)

    col = lax.broadcasted_iota(jnp.int32, (Q_TILE, nk), 1)
    big_i = jnp.int32(2 ** 30)

    idx_ref[:] = jnp.zeros_like(idx_ref)
    dist_ref[:] = jnp.zeros_like(dist_ref)
    for s in range(3):
        d = d_scr[:]
        m = jnp.min(d, axis=1)                               # (Q,)
        at_min = d == m[:, None]
        i_s = jnp.min(jnp.where(at_min, col, big_i), axis=1)  # ties -> lowest
        idx_ref[s, :] = i_s
        dist_ref[s, :] = m
        # remove the selected key (by index, so duplicate distances survive)
        d_scr[:] = jnp.where(col == i_s[:, None], jnp.inf, d)


@functools.partial(jax.jit, static_argnums=(2,))
def three_nn_pallas(query_xyz: Array, key_xyz: Array,
                    interpret: bool = False):
    """(B, 3, N1) x (B, 3, N2) -> (index (B, N1, 3) i32, dist (B, N1, 3) f32).

    Exact difference-form distances; ascending, ties to the lowest index —
    the reference CUDA semantics (interpolate_kernel.cu:53-74)."""
    b, _, n1 = query_xyz.shape
    n2 = key_xyz.shape[2]
    nq_pad = ((n1 + Q_TILE - 1) // Q_TILE) * Q_TILE
    nk_pad = ((n2 + _LANES - 1) // _LANES) * _LANES

    q = _pad_planes(query_xyz, nq_pad, 0.0)
    k = _pad_planes(key_xyz, nk_pad, 1e9)

    grid = (b, nq_pad // Q_TILE)

    def wrapper(q_ref, k_ref, idx_ref, dist_ref, d_scr):
        _three_nn_kernel(q_ref.at[0], k_ref.at[0], idx_ref.at[0],
                         dist_ref.at[0], d_scr)

    idx, dist = pl.pallas_call(
        wrapper,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8, Q_TILE), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, nk_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, Q_TILE), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, Q_TILE), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 8, nq_pad), jnp.int32),
            jax.ShapeDtypeStruct((b, 8, nq_pad), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((Q_TILE, nk_pad), jnp.float32)],
        interpret=interpret,
    )(q, k)
    # (B, 8, NQ_pad) rows 0:3 -> (B, N1, 3)
    idx = jnp.swapaxes(idx[:, :3, :n1], 1, 2)
    dist = jnp.swapaxes(dist[:, :3, :n1], 1, 2)
    return idx, dist


# -- ball query phase 1: fused distance + mask + bit-pack + block counts ------

BQ_C_TILE = 256     # centroids per grid step
BQ_K_TILE = 2048    # keys per inner step (KT/16 = 128-aligned pack width)


def _bq_phase1_kernel(c_ref, k_ref, pack_ref, mask16_ref, wsum_ref,
                      bsumt_ref, *, radius2):
    """One (centroid tile, key tile) pair — small blocks keep VMEM far
    under budget so the grid pipeline never spills.

    c_ref: (8, C_TILE) centroid xyz planes (rows 3:8 zero);
    k_ref: (8, KT) key-plane tile (padded keys parked at +1e9);
    pack_ref: (KT, 2*KT/16) bf16 — [bit-pack | word-count] matrices side by
    side so one MXU matmul produces both outputs;
    mask16_ref: (C_TILE, KT/16) f32 — 16 mask bits packed per word
    (bit t of word w = key w*16+t in range);
    wsum_ref: (C_TILE, KT/16) f32 — per-word in-range popcounts (lets
    phase 2 bisect to a single word before unpacking any bits);
    bsumt_ref: (KT/128, C_TILE) f32 — per-128-block in-range counts,
    TRANSPOSED (blocks in sublanes) so writes stay lane-aligned.
    """
    kt = BQ_K_TILE
    nw = kt // 16

    cols = _coord_cols(c_ref)                     # (C, 128)
    cx, cy, cz = cols[:, 0:1], cols[:, 1:2], cols[:, 2:3]

    dx = cx - k_ref[0:1, :]
    dy = cy - k_ref[1:2, :]
    dz = cz - k_ref[2:3, :]
    d = dx * dx + dy * dy + dz * dz                                # (C, KT)
    mask = (d < radius2).astype(jnp.bfloat16)

    # Bit-pack and word-counts in ONE small matmul (0/1 and powers of two
    # are bf16-exact; f32 accumulation holds sums < 2^16 exactly).
    both = jnp.dot(mask, pack_ref[:],
                   preferred_element_type=jnp.float32)             # (C, 2*NW)
    mask16_ref[:] = both[:, :nw]
    wsum_ref[:] = both[:, nw:]

    jb = lax.broadcasted_iota(jnp.int32, (kt, kt // 128), 0)
    wb = lax.broadcasted_iota(jnp.int32, (kt, kt // 128), 1)
    p_block = (jb // 128 == wb).astype(jnp.bfloat16)               # (KT, KT/128)
    bsumt_ref[:] = lax.dot_general(
        p_block, mask, dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                        # (KT/128, C)


@functools.partial(jax.jit, static_argnums=(2, 3))
def ball_query_phase1_pallas(points: Array, centroids: Array, radius: float,
                             interpret: bool = False):
    """Fused distance/mask pass for ball query.

    Args:
        points: (B, 3, N); centroids: (B, 3, M); radius: strict < on sqdist.

    Returns:
        mask16: (B, M, N_pad/16) f32 — packed 16-bit mask words (scan
            order: word w covers keys 16w..16w+15, bit t = key 16w+t);
        wsum: (B, M, N_pad/16) f32 — per-word in-range popcounts;
        bsum: (B, M, N_pad/128) f32 — per-128-block in-range counts.
        (N_pad = N rounded up to BQ_K_TILE; padded keys never match.)
    """
    b, _, n = points.shape
    m = centroids.shape[2]
    m_pad = ((m + BQ_C_TILE - 1) // BQ_C_TILE) * BQ_C_TILE
    n_pad = ((n + BQ_K_TILE - 1) // BQ_K_TILE) * BQ_K_TILE

    c = _pad_planes(centroids, m_pad, 0.0)
    k = _pad_planes(points, n_pad, 1e9)

    kt = BQ_K_TILE
    ktw = kt // 16
    # [bit-pack | word-count] matrices, built once in XLA (bf16-exact).
    jj = jnp.arange(kt, dtype=jnp.int32)[:, None]
    ww = jnp.arange(ktw, dtype=jnp.int32)[None, :]
    in_word = (jj // 16 == ww)
    p_pack = jnp.where(in_word, jnp.exp2((jj % 16).astype(jnp.float32)), 0.0)
    pack = jnp.concatenate([p_pack, in_word.astype(jnp.float32)],
                           axis=1).astype(jnp.bfloat16)     # (KT, 2*KT/16)

    grid = (b, m_pad // BQ_C_TILE, n_pad // kt)
    kernel = functools.partial(_bq_phase1_kernel, radius2=radius * radius)

    def wrapper(c_ref, k_ref, pack_ref, mask16_ref, wsum_ref, bsumt_ref):
        kernel(c_ref.at[0], k_ref.at[0], pack_ref, mask16_ref.at[0],
               wsum_ref.at[0], bsumt_ref.at[0])

    nw = n_pad // 16
    nb = n_pad // 128
    mask16, wsum, bsum_t = pl.pallas_call(
        wrapper,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8, BQ_C_TILE), lambda i, j, t: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, kt), lambda i, j, t: (i, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, 2 * ktw), lambda i, j, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BQ_C_TILE, ktw), lambda i, j, t: (i, j, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ_C_TILE, ktw), lambda i, j, t: (i, j, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kt // 128, BQ_C_TILE), lambda i, j, t: (i, t, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, m_pad, nw), jnp.float32),
            jax.ShapeDtypeStruct((b, m_pad, nw), jnp.float32),
            jax.ShapeDtypeStruct((b, nb, m_pad), jnp.float32),
        ],
        interpret=interpret,
    )(c, k, pack)
    bsum = jnp.swapaxes(bsum_t, 1, 2)[:, :m]
    return mask16[:, :m], wsum[:, :m], bsum