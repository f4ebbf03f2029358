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


# -- fused ball query: distance + mask + bit-pack + in-kernel rank bisect ----

BQ_C_TILE = 512     # centroids per grid step (512 measured 0.81 vs 0.94 ms at 256 on the slab kernel)
BQ_K_TILE = 2048    # keys per inner step (KT/16 = 128-aligned pack width)


def _bq_fused_kernel(c_ref, k_ref, pack_ref, idx_ref, cnt_ref,
                     m16_scr, wsum_scr, bsum_scr, idx_scr,
                     *, radius2, k_slots, nb_total, tile_axis=2, base=None,
                     stratified=False):
    """One (centroid tile, key tile) grid step; key tiles iterate fastest.

    Every key tile appends its packed mask words / word popcounts / block
    counts to VMEM scratch; the LAST key tile then runs the rank bisect
    in-kernel and writes final neighbour indices — the (M, N) mask never
    touches HBM (the old phase-1/phase-2 split round-tripped ~66 MB of
    packed words per SA stage and paid batched-small-matmul one-hot gathers
    in XLA, measured 1.7 ms of the 2.5 ms stage-1 ball query).

    Scratch layouts (C = BQ_C_TILE lanes, NB = total 128-key blocks):
    m16_scr/wsum_scr (8*NB, C): row u*NB + j = word u of block j — u-major
    so the bisect can mask-reduce one contiguous (NB, C) strip per word;
    bsum_scr (NB, C); idx_scr (k_slots, C).

    idx_ref (k_slots, C): slot s of centroid c = s-th in-range key in scan
    order (first-hit duplicate fill, ball_query_kernel.cu:64-68);
    cnt_ref (8, C): row 0 = min(total in range, k_slots).

    (An in-kernel rel-xyz emission variant existed through round 4; the
    round-4 solo A/B measured it a ~3% e2e loss vs the flat-gather route,
    so it was deleted — docs/perf_roadmap.md.)
    """
    kt = BQ_K_TILE
    t = pl.program_id(tile_axis)
    num_kt = pl.num_programs(tile_axis)

    # ---- accumulate this key tile's packed masks ----
    cols = _coord_cols(k_ref)                     # (KT, 128)
    kx, ky, kz = cols[:, 0:1], cols[:, 1:2], cols[:, 2:3]
    dx = kx - c_ref[0:1, :]
    dy = ky - c_ref[1:2, :]
    dz = kz - c_ref[2:3, :]
    d = dx * dx + dy * dy + dz * dz                                # (KT, C)
    mask = (d < radius2).astype(jnp.bfloat16)

    # Bit-pack and word-counts in ONE matmul (0/1 and powers of two are
    # bf16-exact; f32 accumulation holds sums < 2^16 exactly).  Output rows
    # are u-major: row u*16 + jl = word u of local block jl.
    both = lax.dot_general(pack_ref[:], mask,
                           dimension_numbers=(((0,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)     # (256, C)
    wsum_rows = []
    for u in range(8):
        m16_scr[pl.ds(u * nb_total + t * 16, 16), :] = \
            both[u * 16:(u + 1) * 16]
        w_u = both[128 + u * 16:128 + (u + 1) * 16]
        wsum_scr[pl.ds(u * nb_total + t * 16, 16), :] = w_u
        wsum_rows.append(w_u)
    bsum_scr[pl.ds(t * 16, 16), :] = sum(wsum_rows)                # (16, C)

    # ---- last key tile: rank bisect over the accumulated scratch ----
    @pl.when(t == num_kt - 1)
    def _bisect():
        c_lanes = c_ref.shape[1]
        bsum = bsum_scr[:]                                         # (NB, C)
        # Inclusive block cumsum as ONE matmul: L[j, j'] = [j' <= j]
        # (bf16-exact: counts <= 128, f32 accumulation exact < 2^24).
        lo_tri = (lax.broadcasted_iota(jnp.int32, (nb_total, nb_total), 1)
                  <= lax.broadcasted_iota(jnp.int32, (nb_total, nb_total), 0)
                  ).astype(jnp.bfloat16)
        bcum = lax.dot_general(lo_tri, bsum.astype(jnp.bfloat16),
                               dimension_numbers=(((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)  # (NB, C)
        total = bcum[nb_total - 1:nb_total, :]                      # (1, C)
        count = jnp.minimum(total, float(k_slots))

        row_nb = lax.broadcasted_iota(jnp.int32, (nb_total, c_lanes), 0)
        iota8 = lax.broadcasted_iota(jnp.int32, (8, c_lanes), 0)

        # Only slots below the tile's max in-range count hold real data;
        # the rest duplicate slot 0 (filled after the loop).
        bound = jnp.minimum(jnp.max(total), float(k_slots)).astype(jnp.int32)

        def slot_body(s, _):
            if stratified:
                # Overfull balls spread their k slots over the in-range
                # ranks: slot s -> rank floor(s * total / k) + 1 (exact in
                # int32; see ops/neighbors.py::_first_k_in_range docstring).
                tot_i = total.astype(jnp.int32)                    # (1, C)
                strided = (s * tot_i) // k_slots + 1
                target = jnp.where(tot_i > k_slots, strided,
                                   s + 1).astype(jnp.float32)      # (1, C)
            else:
                target = (s + 1).astype(jnp.float32)               # rank
            inb = bcum < target                                    # (NB, C)
            # First block with bcum >= target; its exclusive prefix is the
            # largest bcum below the target (bcum is monotone over blocks).
            b_idx = jnp.sum(inb, axis=0, dtype=jnp.int32)[None]    # (1, C)
            prefix = jnp.max(jnp.where(inb, bcum, 0.0), axis=0)[None]
            b_idx = jnp.minimum(b_idx, nb_total - 1)
            onehot = (row_nb == b_idx).astype(jnp.float32)         # (NB, C)

            # Gather the selected block's 8 words + popcounts: one masked
            # reduction per u-strip (all VMEM-resident).
            words, wcnts, wcums = [], [], []
            run_c = jnp.zeros((c_lanes,), jnp.float32)
            for u in range(8):
                m_strip = m16_scr[u * nb_total:(u + 1) * nb_total, :]
                w_strip = wsum_scr[u * nb_total:(u + 1) * nb_total, :]
                words.append(jnp.sum(onehot * m_strip, axis=0))
                wc = jnp.sum(onehot * w_strip, axis=0)
                wcnts.append(wc)
                run_c = run_c + wc
                wcums.append(run_c)
            words = jnp.stack(words, axis=0)                       # (8, C)
            wcnt = jnp.stack(wcnts, axis=0)                        # (8, C)

            # Level 2: which of the 8 words holds the target rank
            # (inclusive cumsum unrolled — Mosaic has no cumsum primitive).
            wcum = jnp.stack(wcums, axis=0)                        # (8, C)
            local_t = target - prefix                              # (1, C)
            u_sel = jnp.sum((wcum < local_t).astype(jnp.int32),
                            axis=0)[None]                          # (1, C)
            u_sel = jnp.minimum(u_sel, 7)
            sel8 = (iota8 == u_sel).astype(jnp.float32)            # (8, C)
            wprefix = jnp.sum(sel8 * (wcum - wcnt), axis=0)[None]
            word = jnp.sum(sel8 * words, axis=0)[None].astype(jnp.int32)
            local_t2 = local_t - wprefix                           # (1, C)

            # Level 3: unpack the single selected word (integer
            # shift-and-mask; float floor-division drops bits on exact
            # multiples — see ops/neighbors.py).
            run = jnp.zeros_like(local_t2)
            within = jnp.zeros((1, c_lanes), jnp.int32)
            for tb in range(16):
                bit = (jnp.right_shift(word, tb) & 1).astype(jnp.float32)
                run = run + bit
                within = within + (run < local_t2).astype(jnp.int32)

            glob = b_idx * 128 + u_sel * 16 + within
            if base is not None:
                glob = glob + base
            idx_scr[pl.ds(s, 1), :] = glob
            return 0

        lax.fori_loop(0, bound, slot_body, 0, unroll=False)

        # Duplicate-fill: slots >= count repeat the first in-range index
        # (all-zero when count == 0, ball_query_kernel.cu:64-68,89-133).
        slot_io = lax.broadcasted_iota(
            jnp.int32, (k_slots, c_lanes), 0).astype(jnp.float32)
        first = jnp.where(count > 0, idx_scr[0:1, :], 0)           # (1, C)
        idx_ref[...] = jnp.where(slot_io < count, idx_scr[:], first)
        cnt_ref[...] = jnp.broadcast_to(count, (8, c_lanes))


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def ball_query_fused_pallas(points: Array, centroids: Array, radius: float,
                            num_neighbours: int, interpret: bool = False,
                            stratified: bool = False):
    """Fused ball query with reference-CUDA semantics.

    Args:
        points: (B, 3, N); centroids: (B, 3, M); radius: strict < on sqdist.
        num_neighbours: K slots per centroid (multiple of 8).
        stratified: overfull balls take rank-stratified in-range points
            instead of the first K in scan order (sorted-cloud deployment
            semantics — see ops/neighbors.py::_first_k_in_range).

    Returns:
        index: (B, M, K) int32, count: (B, M) int32.
    """
    b, _, n = points.shape
    m = centroids.shape[2]
    assert num_neighbours % 8 == 0, "K must be a sublane multiple"
    m_pad = ((m + BQ_C_TILE - 1) // BQ_C_TILE) * BQ_C_TILE
    n_pad = ((n + BQ_K_TILE - 1) // BQ_K_TILE) * BQ_K_TILE
    nb_total = n_pad // 128

    c = _pad_planes(centroids, m_pad, 0.0)
    k = _pad_planes(points, n_pad, 1e9)

    kt = BQ_K_TILE
    # [bit-pack | word-count] matrix, built once in XLA (bf16-exact).
    # Column u*16 + jl = word u of local block jl (u-major row layout).
    jj = jnp.arange(kt, dtype=jnp.int32)[:, None]
    w_local = jj // 16                      # word of key j within the tile
    u_of = w_local % 8
    jl_of = w_local // 8
    cc = jnp.arange(128, dtype=jnp.int32)[None, :]
    in_word = (u_of * 16 + jl_of) == cc
    p_pack = jnp.where(in_word, jnp.exp2((jj % 16).astype(jnp.float32)), 0.0)
    pack = jnp.concatenate([p_pack, in_word.astype(jnp.float32)],
                           axis=1).astype(jnp.bfloat16)       # (KT, 256)

    grid = (b, m_pad // BQ_C_TILE, n_pad // kt)
    kernel = functools.partial(_bq_fused_kernel, radius2=radius * radius,
                               k_slots=num_neighbours, nb_total=nb_total,
                               stratified=stratified)

    def wrapper(c_ref, k_ref, pack_ref, idx_ref, cnt_ref, *scratch):
        kernel(c_ref.at[0], k_ref.at[0], pack_ref, idx_ref.at[0],
               cnt_ref.at[0], *scratch)

    idx_t, cnt = pl.pallas_call(
        wrapper,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8, BQ_C_TILE), lambda i, j, t: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, kt), lambda i, j, t: (i, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, 256), lambda i, j, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, num_neighbours, BQ_C_TILE),
                         lambda i, j, t: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, BQ_C_TILE), lambda i, j, t: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, num_neighbours, m_pad), jnp.int32),
            jax.ShapeDtypeStruct((b, 8, m_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((8 * nb_total, BQ_C_TILE), jnp.float32),
            pltpu.VMEM((8 * nb_total, BQ_C_TILE), jnp.float32),
            pltpu.VMEM((nb_total, BQ_C_TILE), jnp.float32),
            pltpu.VMEM((num_neighbours, BQ_C_TILE), jnp.int32),
        ],
        interpret=interpret,
    )(c, k, pack)
    index = jnp.swapaxes(idx_t, 1, 2)[:, :m]
    count = cnt[:, 0, :m].astype(jnp.int32)
    return index, count

# -- slab-pruned fused ball query (sorted points) ----------------------------

BQ_SLAB_TILES = 4   # key tiles per slab window (4 * BQ_K_TILE = 8192 keys)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def ball_query_fused_slab_pallas(points: Array, centroids: Array,
                                 lo_tile: Array, radius: float,
                                 num_neighbours: int,
                                 interpret: bool = False,
                                 stratified: bool = False):
    """Fused ball query over per-centroid-tile key SLABS (sorted points).

    The caller guarantees: each scene's `points` are sorted ascending along
    some coordinate; each scene's `centroids` are sorted by the same
    coordinate; and `lo_tile[i, j]` (int32, one per BQ_C_TILE centroid tile
    of scene i) is the BQ_K_TILE-aligned tile index such that every point
    within the ball radius of every centroid in tile (i, j) lies in key
    tiles [lo_tile[i, j], lo_tile[i, j] + BQ_SLAB_TILES) of scene i.
    Points inside the aligned slab but outside the true window are beyond
    the radius on the sort axis alone, so no window mask is needed (see
    ops/neighbors.py::_ball_query_sorted_pruned).

    lo_tile is a scalar-prefetch operand: the key-tile BlockSpec index map
    reads it to DMA a DIFFERENT key window per (scene, centroid tile).
    Batch is a leading grid axis — per-scene cost is batch-linear by
    construction (each grid step touches one scene's tiles only).

    Returns (index (B, M, K) i32 into the sorted point order, count (B, M)).
    """
    b, _, n = points.shape
    m = centroids.shape[2]
    assert num_neighbours % 8 == 0
    if lo_tile.ndim == 1:
        lo_tile = lo_tile[None]
    kt = BQ_K_TILE
    m_pad = ((m + BQ_C_TILE - 1) // BQ_C_TILE) * BQ_C_TILE
    n_pad = ((n + kt - 1) // kt) * kt
    # The slab may reach up to BQ_SLAB_TILES tiles past any clamped start.
    n_pad = max(n_pad, BQ_SLAB_TILES * kt)
    nb_slab = BQ_SLAB_TILES * (kt // 128)

    k = _pad_planes(points, n_pad, 1e9)                     # (B, 8, n_pad)
    # Pad centroids by repeating the LAST (sorted) centroid: keeps padded
    # rows inside the last tile's slab window.
    c = _pad_planes(centroids, m_pad, 0.0)
    if m_pad > m:
        c = jnp.concatenate(
            [c[:, :, :m], jnp.repeat(c[:, :, m - 1:m], m_pad - m, axis=2)],
            axis=2)

    jj = jnp.arange(kt, dtype=jnp.int32)[:, None]
    w_local = jj // 16
    u_of = w_local % 8
    jl_of = w_local // 8
    cc = jnp.arange(128, dtype=jnp.int32)[None, :]
    in_word = (u_of * 16 + jl_of) == cc
    p_pack = jnp.where(in_word, jnp.exp2((jj % 16).astype(jnp.float32)), 0.0)
    pack = jnp.concatenate([p_pack, in_word.astype(jnp.float32)],
                           axis=1).astype(jnp.bfloat16)     # (KT, 256)

    num_c_tiles = m_pad // BQ_C_TILE
    radius2 = radius * radius

    inputs = [lo_tile.astype(jnp.int32), c, k, pack]
    in_specs = [
        pl.BlockSpec((1, 8, BQ_C_TILE), lambda i, j, t, lo: (i, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, kt), lambda i, j, t, lo: (i, 0, lo[i, j] + t),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((kt, 256), lambda i, j, t, lo: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, num_neighbours, BQ_C_TILE),
                     lambda i, j, t, lo: (i, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, BQ_C_TILE), lambda i, j, t, lo: (i, 0, j),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, num_neighbours, m_pad), jnp.int32),
        jax.ShapeDtypeStruct((b, 8, m_pad), jnp.float32),
    ]
    scratch_shapes = [
        pltpu.VMEM((8 * nb_slab, BQ_C_TILE), jnp.float32),
        pltpu.VMEM((8 * nb_slab, BQ_C_TILE), jnp.float32),
        pltpu.VMEM((nb_slab, BQ_C_TILE), jnp.float32),
        pltpu.VMEM((num_neighbours, BQ_C_TILE), jnp.int32),
    ]
    def kernel(lo_ref, c_ref, k_ref, pack_ref, idx_ref, cnt_ref,
               *scratch):
        i = pl.program_id(0)
        j = pl.program_id(1)
        base = lo_ref[i, j] * kt
        _bq_fused_kernel(c_ref.at[0], k_ref.at[0], pack_ref,
                         idx_ref.at[0], cnt_ref.at[0], *scratch,
                         radius2=radius2, k_slots=num_neighbours,
                         nb_total=nb_slab, tile_axis=2, base=base,
                         stratified=stratified)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, num_c_tiles, BQ_SLAB_TILES),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(*inputs)
    idx_t, cnt = out[0], out[1]
    index = jnp.swapaxes(idx_t, 1, 2)[:, :m]
    count = cnt[:, 0, :m].astype(jnp.int32)
    return index, count

# (A slab-pruned fused 3-NN with per-query patch fallback existed through
# round 4; the round-4 solo A/B measured it a 7% e2e loss vs the full
# Pallas scan and it was DELETED per the win-or-delete rule —
# docs/perf_roadmap.md.)
