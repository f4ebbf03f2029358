"""Neighbourhood search ops: pairwise distances, ball query, 3-NN.

TPU-native replacements for the reference's CUDA kernels
(reference: pointnet2_utils/csrc/ball_query_kernel.cu:33-76,
interpolate_kernel.cu:29-132).  Semantics are preserved exactly:

* ball_query returns the FIRST `num_neighbours` points (in scan order
  j = 0..N-1) whose squared distance is strictly < radius^2; before the first
  hit, every slot holds that first hit's index ("slot-0 fill",
  ball_query_kernel.cu:64-68), so unfilled slots duplicate the first
  neighbour; if no point is in range all slots are 0 and count is 0.
* three_nn returns the 3 smallest squared distances in ascending order with
  ties broken by lower index (sorted-insertion semantics,
  interpolate_kernel.cu:53-74).

Distances are computed as batched matmuls (MXU) via the
||a||^2 + ||b||^2 - 2ab expansion, chunked over centroids/queries so the
(M, N) distance matrix never exceeds `chunk * N` floats.  Exact-difference
distances are recomputed for the 3 selected neighbours in three_nn so the
interpolation weights match the reference bit-for-bit up to fp32 rounding.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

# Behaviour env flags are read ONCE at import as route DEFAULTS.  Every
# public entry point resolves them in an UNJITTED wrapper and threads the
# concrete route as a static argument of the jitted body (the `emit_impl`
# pattern), so the pjit cache keys on the resolved route: flipping a
# default (bench.py's compile-failure fallback, test monkeypatching)
# retraces instead of silently reusing a stale route.  Flip defaults via
# the set_default_* setters below.
_ENV_BQ_SLAB_IMPL = os.environ.get("S4G_BQ_SLAB_IMPL", "pallas")
_ENV_BQ_IMPL = os.environ.get("S4G_BQ_IMPL")
_ENV_3NN_IMPL = os.environ.get("S4G_3NN_IMPL")
# Two staged kernel variants were REMOVED after losing their round-4 A/Bs
# (docs/perf_roadmap.md): the in-kernel grouped rel-xyz emission
# (S4G_EMIT_REL, 164.4 vs 168.6-171.5 scenes/s — the XLA gather it was
# built to replace no longer dominates) and the slab-pruned 3-NN kernel
# (S4G_3NN_SLAB, ~7% of real-scene queries fail the window verification so
# the whole-call fallback makes it a net loss).  ball_query_grouped's rel
# is always the flat row gather now, and three_nn always full-scans.


def set_default_bq_impl(impl: Optional[str]) -> None:
    """Override the default ball-query route (None = backend auto)."""
    global _ENV_BQ_IMPL
    _ENV_BQ_IMPL = impl


def set_default_3nn_impl(impl: Optional[str]) -> None:
    """Override the default 3-NN route (None = backend auto)."""
    global _ENV_3NN_IMPL
    _ENV_3NN_IMPL = impl


def _resolve_bq_impl(impl: str) -> str:
    if impl != "auto":
        return impl
    if _ENV_BQ_IMPL:
        return _ENV_BQ_IMPL
    # Measured on v5e (stage 1, 5120x25600): the difference-form chunked
    # XLA pass runs 1.61 ms vs 1.77 ms for the fused packed-mask kernel —
    # XLA fuses the broadcast-subtract distances into the mask reduction
    # well, so the kernel only pays off under an explicit override.
    return "xla"


def _resolve_slab_impl(slab_impl: Optional[str]) -> str:
    """Resolve the sorted-slab route: "kernel" (compiled Pallas, TPU),
    "interpret" (Pallas interpret mode — the scale tier pins the REAL
    kernel on the CPU host this way), or "xla" (slab-pruned XLA twin)."""
    if slab_impl is None:
        slab_impl = _ENV_BQ_SLAB_IMPL
    if slab_impl == "pallas_interpret":
        return "interpret"
    if slab_impl != "xla" and jax.default_backend() == "tpu":
        return "kernel"
    return "xla"


def invert_permutation(perm: Array) -> Array:
    """(B, N) permutation per row -> its inverse, via a flat unique-index
    scatter: one store per row (~gather cost) instead of a second argsort
    (bitonic sort passes are several times pricier at deployment sizes)."""
    b, n = perm.shape
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    off = (jnp.arange(b, dtype=perm.dtype) * n)[:, None]
    flat = jnp.zeros((b * n,), jnp.int32).at[
        (perm + off).reshape(-1)].set(iota.reshape(-1),
                                      mode="promise_in_bounds",
                                      unique_indices=True)
    return flat.reshape(b, n)


def flat_gather_rows(x: Array, index: Array) -> Array:
    """Batched row gather (B, M, W) x (B, M2) -> (B, M2, W) as ONE flat
    single-table gather with batch-offset indices.  XLA's *batched* gather
    lowering degrades super-linearly in B (bitcast_select chains measured
    at b=2 in the round-3 traces), while a flat row gather stays
    row-count-bound (~3 ns/row on v5e)."""
    b, m, w = x.shape
    if b == 1:
        return jnp.take_along_axis(x, index[..., None], axis=1,
                                   mode="promise_in_bounds")
    off = (jnp.arange(b, dtype=index.dtype) * m)[:, None]
    flat = jnp.take_along_axis(
        x.reshape(1, b * m, w), (index + off).reshape(1, -1)[..., None],
        axis=1, mode="promise_in_bounds")
    return flat.reshape(b, index.shape[1], w)


def pairwise_sqdist(a: Array, b: Array) -> Array:
    """Squared distances between channel-first point sets.

    Args:
        a: (..., 3, M)
        b: (..., 3, N)

    Returns:
        (..., M, N) squared euclidean distances (MXU-friendly expansion).
    """
    a2 = jnp.sum(a * a, axis=-2)[..., :, None]           # (..., M, 1)
    b2 = jnp.sum(b * b, axis=-2)[..., None, :]           # (..., 1, N)
    # HIGHEST precision: the TPU MXU's default f32 path truncates the
    # multiplies to bfloat16; neighbour selection needs full f32 products.
    ab = jnp.einsum("...cm,...cn->...mn", a, b,
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)     # (..., M, N)
    return a2 + b2 - 2.0 * ab


def pairwise_sqdist_exact(a: Array, b: Array) -> Array:
    """Difference-form squared distances: sum((a - b)^2) in f32 — the CUDA
    reference's arithmetic (ball_query_kernel.cu:50-55).  The matmul
    expansion cancels catastrophically when |a - b| is small relative to
    |a|, which flips strict-< comparisons right at the ball radius; range
    queries must use this form.

    Args:
        a: (..., 3, M); b: (..., 3, N)
    Returns:
        (..., M, N) squared euclidean distances.
    """
    diff = a[..., :, :, None] - b[..., :, None, :]       # (..., 3, M, N)
    return jnp.sum(diff * diff, axis=-3)


def _first_k_in_range(sqdist: Array, radius2: float, k: int,
                      stratified: bool = False):
    """First-k-in-scan-order selection for one chunk of centroids.

    Sort-free: ranks come from a cumulative count along the scan axis, and
    the k-th in-range index is recovered by bisecting the (monotone) cumcount
    — O(N + k log N) per centroid instead of a top-k sort (which dominated
    the whole network's runtime on TPU).

    stratified=True changes WHICH in-range points fill the k slots when a
    ball holds more than k: slot s takes the in-range point of scan rank
    floor(s * total / k) instead of rank s.  Rationale: the reference takes
    the FIRST k in scan order (ball_query_kernel.cu:57-73) over an
    arbitrarily-ordered cloud — statistically a uniform k-subset of the
    ball.  When the cloud is SORTED for slab pruning (deployment), first-k
    degenerates to the lowest-coordinate side of every ball, which is
    out-of-distribution for weights trained on unsorted clouds (measured:
    functional grasp overlap 0.0 vs the 0.40 permutation noise floor,
    docs/divergences.md).  Rank-stratified selection restores a spatially
    unbiased subset while staying deterministic and sort-free.  For
    count <= k both modes return every in-range point (identical results).

    Args:
        sqdist: (M, N) squared distances.
    Returns:
        index: (M, k) int32, count: (M,) int32 — reference ball-query layout.
    """
    n = sqdist.shape[-1]
    m = sqdist.shape[0]
    mask = sqdist < radius2

    # Two-level rank selection: split the scan axis into 128-lane blocks.
    # Level 1 ranks whole blocks via a tiny cumsum; level 2 gathers ONE
    # 128-wide block per (centroid, slot) — a fast major-dim row gather —
    # and counts within it.  No sorts, no minor-dim gathers.
    blk_w = 128
    pad = (-n) % blk_w
    if pad:
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    nb = (n + pad) // blk_w
    mask3 = mask.reshape(m, nb, blk_w)
    bsum = jnp.sum(mask3, axis=-1, dtype=jnp.int32)       # (M, nb)
    bcum = jnp.cumsum(bsum, axis=-1)                      # inclusive
    total = bcum[..., -1]                                 # (M,)
    count = jnp.minimum(total, k)

    target = jnp.arange(1, k + 1, dtype=jnp.int32)        # (k,)
    if stratified:
        # Per-centroid ranks: 1 + floor(s * total / k) when overfull
        # (exact in int32: s * total < 64 * 2^24).
        strided = (jnp.arange(k, dtype=jnp.int32)[None, :]
                   * total[:, None]) // k + 1              # (M, k)
        target = jnp.where(total[:, None] > k, strided, target[None, :])
    else:
        target = jnp.broadcast_to(target[None, :], (m, k))
    # b[m, s] = block containing the s-th in-range point
    b = jnp.sum(bcum[:, None, :] < target[:, :, None], axis=-1,
                dtype=jnp.int32)                          # (M, k)
    b_c = jnp.minimum(b, nb - 1)
    excl = bcum - bsum                                    # exclusive cumsum

    # Block gathers as ONE-HOT MATMULS on the MXU: XLA lowers the per-row
    # dynamic gathers here to a scalar dynamic-slice loop (~90 ns/row), while
    # a (M, k, nb) one-hot contraction is a trivially small matmul.  0/1 and
    # prefix values are exact (bf16 holds 0/1; counts < 2^24 in f32).
    onehot = (b_c[..., None]
              == lax.broadcasted_iota(jnp.int32, (1, 1, nb), 2))  # (M, k, nb)
    prefix = jnp.einsum("mkb,mb->mk", onehot.astype(jnp.float32),
                        excl.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    local_t = target.astype(jnp.float32) - prefix

    blk_mask = jnp.einsum("mkb,mbl->mkl", onehot.astype(jnp.bfloat16),
                          mask3.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)  # (M, k, 128)
    # Inclusive lane cumsum as one upper-triangular matmul.
    triu = jnp.triu(jnp.ones((blk_w, blk_w), jnp.bfloat16))
    blk_cum = jnp.dot(blk_mask.reshape(-1, blk_w).astype(jnp.bfloat16), triu,
                      preferred_element_type=jnp.float32
                      ).reshape(m, k, blk_w)
    within = jnp.sum(blk_cum < local_t[..., None], axis=-1, dtype=jnp.int32)
    idx = b_c * blk_w + within

    slot = lax.broadcasted_iota(jnp.int32, idx.shape, idx.ndim - 1)
    valid = slot < count[..., None]
    first = jnp.where(count > 0, idx[..., 0], 0)          # 0 when nothing in range
    idx = jnp.where(valid, idx, first[..., None])
    return idx.astype(jnp.int32), count


def _axis_keys(arr: Array, sorted_axis: Array) -> Array:
    """Extract the sort-key coordinate: (B, 3, N) -> (B, N).

    `sorted_axis` is a traced int32 scalar (one axis shared by the batch)
    or a (B,) vector (each scene sorted along its OWN axis — the batched
    deployment path, so a scene's result never depends on which other
    scenes are co-batched)."""
    if sorted_axis.ndim == 0:
        return lax.dynamic_index_in_dim(arr, sorted_axis, axis=1,
                                        keepdims=False)
    return jnp.take_along_axis(arr, sorted_axis[:, None, None], axis=1,
                               mode="promise_in_bounds")[:, 0]


def _ball_query_sorted_pruned(points: Array, centroids: Array,
                              radius2: float, num_neighbours: int,
                              chunk: int, sorted_axis: Array,
                              slab_capacity: int,
                              centroids_sorted: bool = False,
                              slab_route: str = "xla",
                              stratified: bool = False):
    """Slab-pruned ball query for scenes whose points are sorted ascending
    along coordinate `sorted_axis` (traced scalar shared by the batch, or
    per-scene (B,) axes — see _axis_keys).

    Centroids are processed in sorted-axis order, in chunks; each chunk
    only scans the CONTIGUOUS slab of points whose axis value lies within
    [chunk_min - r, chunk_max + r] — every in-range point of every centroid
    in the chunk is inside that slab, and slab points outside it have axis
    distance > r, hence squared distance >= r^2, so no window mask is even
    needed: the result is EXACTLY the full-scan result.  If any chunk's
    slab exceeds `slab_capacity` (degenerate clouds concentrated on one
    axis value), the whole call falls back to the full scan via lax.cond.

    Batched: each scene sorts its own centroids and computes its own slab
    windows; the Pallas kernel takes batch as a leading grid axis, so the
    cost is batch-linear (the property that makes batch serving win —
    VERDICT r2 #2).

    Measured on v5e stage 1 (5120 x 25,600, r=0.02): 1.66 -> ~0.6 ms.
    """
    b, _, m = centroids.shape
    n = points.shape[2]
    radius = jnp.sqrt(jnp.float32(radius2))
    cap = slab_capacity

    pkeys = _axis_keys(points, sorted_axis)                # (B, N) ascending
    ckeys = _axis_keys(centroids, sorted_axis)             # (B, M)
    if centroids_sorted:
        # Caller PROMISES the centroids are already ascending along
        # sorted_axis (true on every deployment path: sharded FPS emits
        # ascending indices into the sorted cloud, and the exact-FPS path
        # re-sorts its centroids in the SA module) — skip the argsort and
        # the permute/unpermute round-trip entirely.
        corder = None
        cent_s = centroids
        ckeys_s = ckeys
    else:
        corder = jnp.argsort(ckeys, axis=1).astype(jnp.int32)  # (B, M)
        cent_s = jnp.swapaxes(
            flat_gather_rows(jnp.swapaxes(centroids, 1, 2), corder), 1, 2)
        ckeys_s = _axis_keys(cent_s, sorted_axis)               # (B, M)

    pad = (-m) % chunk
    num_chunks = (m + pad) // chunk
    # Pad by repeating the LAST sorted centroid so padded rows keep the
    # chunk window valid; padded outputs are sliced off below.
    cent_p = jnp.concatenate(
        [cent_s, jnp.repeat(cent_s[:, :, -1:], pad, axis=2)], axis=2)
    ckeys_p = jnp.concatenate(
        [ckeys_s, jnp.repeat(ckeys_s[:, -1:], pad, axis=1)], axis=1)

    # (B*num_chunks, 3, chunk) flat chunks + owning-scene ids: a flat chunk
    # loop stays batch-linear where vmapping the selection machinery lowers
    # super-linearly in B (measured r2).
    cent_chunks = cent_p.reshape(b, 3, num_chunks, chunk) \
        .transpose(0, 2, 1, 3).reshape(b * num_chunks, 3, chunk)
    b_of_chunk = jnp.repeat(jnp.arange(b, dtype=jnp.int32), num_chunks)

    def full_flat(_):
        def per_chunk(args):
            cent_c, b_id = args
            pts_b = lax.dynamic_index_in_dim(points, b_id, axis=0,
                                             keepdims=False)
            d = pairwise_sqdist_exact(cent_c, pts_b)
            return _first_k_in_range(d, radius2, num_neighbours,
                                     stratified=stratified)
        idx_f, cnt_f = lax.map(per_chunk, (cent_chunks, b_of_chunk))
        return (idx_f.reshape(b, m + pad, num_neighbours),
                cnt_f.reshape(b, m + pad))

    if slab_route in ("kernel", "interpret"):
        # Fused Pallas slab kernel: per BQ_C_TILE-centroid tile, a
        # BQ_K_TILE-aligned window of BQ_SLAB_TILES key tiles (see
        # pallas/neighbor_kernels.py::ball_query_fused_slab_pallas).
        from .pallas.neighbor_kernels import (BQ_C_TILE, BQ_K_TILE,
                                              BQ_SLAB_TILES,
                                              ball_query_fused_slab_pallas)
        padt = (-m) % BQ_C_TILE
        ck_t = jnp.concatenate(
            [ckeys_s, jnp.repeat(ckeys_s[:, -1:], padt, axis=1)], axis=1)
        ntile = (m + padt) // BQ_C_TILE
        t_min = ck_t.reshape(b, ntile, BQ_C_TILE)[:, :, 0] - radius
        t_max = ck_t.reshape(b, ntile, BQ_C_TILE)[:, :, -1] + radius
        lo_t = jax.vmap(
            lambda pk, t: jnp.searchsorted(pk, t, side="left"))(
                pkeys, t_min).astype(jnp.int32)            # (B, ntile)
        hi_t = jax.vmap(
            lambda pk, t: jnp.searchsorted(pk, t, side="right"))(
                pkeys, t_max).astype(jnp.int32)
        n_pad_k = max(-(-n // BQ_K_TILE) * BQ_K_TILE,
                      BQ_SLAB_TILES * BQ_K_TILE)
        max_lo = n_pad_k // BQ_K_TILE - BQ_SLAB_TILES
        lo_tile = jnp.clip(lo_t // BQ_K_TILE, 0, max_lo)
        overflow = jnp.max(hi_t - lo_tile * BQ_K_TILE) \
            > BQ_SLAB_TILES * BQ_K_TILE

        def kern(_):
            radius_py = float(radius2) ** 0.5
            i_k, c_k = ball_query_fused_slab_pallas(
                points, cent_s, lo_tile, radius_py, num_neighbours,
                slab_route == "interpret", stratified=stratified)
            pad_k = jnp.zeros((b, pad, num_neighbours), jnp.int32)
            i_p = jnp.concatenate([i_k, pad_k], axis=1)
            c_p = jnp.concatenate([c_k, pad_k[:, :, 0]], axis=1)
            return i_p, c_p

        idx_s, cnt_s = lax.cond(overflow, full_flat, kern, operand=None)
    else:
        kmin = ckeys_p.reshape(b, num_chunks, chunk)[:, :, 0] - radius
        kmax = ckeys_p.reshape(b, num_chunks, chunk)[:, :, -1] + radius
        lo = jax.vmap(lambda pk, t: jnp.searchsorted(pk, t, side="left"))(
            pkeys, kmin).astype(jnp.int32)                 # (B, num_chunks)
        hi = jax.vmap(lambda pk, t: jnp.searchsorted(pk, t, side="right"))(
            pkeys, kmax).astype(jnp.int32)
        overflow = jnp.max(hi - lo) > cap

        def pruned(_):
            def per_chunk(args):
                cent_c, lo_i, b_id = args
                pts_b = lax.dynamic_index_in_dim(points, b_id, axis=0,
                                                 keepdims=False)
                start = jnp.clip(lo_i, 0, n - cap)
                slab = lax.dynamic_slice(pts_b, (0, start), (3, cap))
                d = pairwise_sqdist_exact(cent_c, slab)    # (chunk, cap)
                idx_l, cnt = _first_k_in_range(d, radius2, num_neighbours,
                                               stratified=stratified)
                # Global indices; all-zero rows (count 0) stay zero
                # (ball_query_kernel.cu:89-133).
                idx_g = jnp.where(cnt[:, None] > 0, idx_l + start, 0)
                return idx_g, cnt
            idx_p, cnt_p = lax.map(
                per_chunk, (cent_chunks, lo.reshape(-1), b_of_chunk))
            return (idx_p.reshape(b, m + pad, num_neighbours),
                    cnt_p.reshape(b, m + pad))

        idx_s, cnt_s = lax.cond(overflow, full_flat, pruned, operand=None)

    idx_s = idx_s[:, :m]
    cnt_s = cnt_s[:, :m]

    if centroids_sorted:
        return idx_s, cnt_s

    # Back to the caller's centroid order (flat row gathers: the batched
    # take_along_axis forms lower super-linearly in B).
    inv = invert_permutation(corder)
    idx = flat_gather_rows(idx_s, inv)
    count = flat_gather_rows(cnt_s[..., None], inv)[..., 0]
    return idx, count


def ball_query(points: Array, centroids: Array, radius: float,
               num_neighbours: int, chunk: int = 512, impl: str = "auto",
               sorted_axis: Optional[Array] = None,
               slab_capacity: int = 6144, centroids_sorted: bool = False,
               slab_impl: Optional[str] = None, stratified: bool = False):
    """Ball query with reference-CUDA semantics.

    Default path: a chunked difference-form XLA distance pass feeding a
    two-level rank selection (measured fastest on v5e).  A fully fused
    Pallas kernel (distance mask + bit-packing + three-level rank bisect in
    VMEM, ops.pallas.neighbor_kernels.ball_query_fused_pallas) is available
    via impl="pallas" / S4G_BQ_IMPL for configs where it wins.

    Args:
        points: (B, 3, N) all points.
        centroids: (B, 3, M) query centres.
        radius: ball radius (strict < comparison on squared distance).
        num_neighbours: K slots per centroid.
        chunk: centroid chunk size bounding the live (chunk, N) matrix (XLA
            path only).
        impl: "auto" (pallas on TPU, xla elsewhere), "pallas", or "xla".
        sorted_axis: optional traced int32 scalar.  When given, the caller
            GUARANTEES `points` are sorted ascending along that coordinate
            (B must be 1); the query then prunes each centroid chunk to the
            contiguous point slab within radius along that axis — exactly
            the full-scan result (see _ball_query_sorted_pruned), ~2.7x
            faster at deployment scale.
        slab_capacity: static slab size for the pruned path (falls back to
            the full scan when a chunk's slab exceeds it).
        centroids_sorted: static promise that `centroids` are ALSO already
            ascending along sorted_axis (skips the pruned path's argsort +
            permute round-trip).
        slab_impl: sorted-slab route override — "pallas" (compiled kernel,
            TPU), "pallas_interpret" (the scale tier pins the real kernel
            on CPU), "xla", or None (= S4G_BQ_SLAB_IMPL default).
        stratified: overfull balls (count > K) fill their K slots with
            rank-stratified in-range points instead of the first K in scan
            order — the unbiased-subset semantics sorted deployment clouds
            need (see _first_k_in_range).  Off by default for bit-parity
            with the reference on arbitrarily-ordered inputs.

    Returns:
        index: (B, M, K) int32, count: (B, M) int32.
    """
    # Unjitted wrapper: routes resolve HERE and enter the jitted body as
    # static arguments (see the module-flag comment at the top of the file).
    return _ball_query_jit(points, centroids, radius, num_neighbours, chunk,
                           _resolve_bq_impl(impl), sorted_axis, slab_capacity,
                           centroids_sorted, _resolve_slab_impl(slab_impl),
                           stratified)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 7, 8, 9, 10))
def _ball_query_jit(points: Array, centroids: Array, radius: float,
                    num_neighbours: int, chunk: int, impl: str,
                    sorted_axis: Optional[Array], slab_capacity: int,
                    centroids_sorted: bool, slab_route: str,
                    stratified: bool = False):
    b, _, m = centroids.shape
    n = points.shape[2]
    radius2 = radius * radius

    if sorted_axis is not None and n > slab_capacity \
            and impl != "pallas":
        return _ball_query_sorted_pruned(points, centroids, radius2,
                                         num_neighbours, chunk,
                                         jnp.asarray(sorted_axis, jnp.int32),
                                         slab_capacity,
                                         centroids_sorted=centroids_sorted,
                                         slab_route=slab_route,
                                         stratified=stratified)

    if impl == "pallas":
        from .pallas.neighbor_kernels import ball_query_fused_pallas
        return ball_query_fused_pallas(points, centroids, radius,
                                       num_neighbours,
                                       stratified=stratified)

    pad = (-m) % chunk
    cent = jnp.pad(centroids, ((0, 0), (0, 0), (0, pad)))
    num_chunks = (m + pad) // chunk
    cent = cent.reshape(b, 3, num_chunks, chunk).transpose(0, 2, 1, 3)

    if b == 1:
        # Single-scene: vmapped chunk map, exactly the fastest measured
        # lowering (the flat variant's per-chunk dynamic point-set index
        # blocks fusion and costs +0.5 ms; dropping the size-1 vmap also
        # measures slower).
        def per_batch(cent_b, pts_b):
            def per_chunk1(cent_c):
                d = pairwise_sqdist_exact(cent_c, pts_b)
                return _first_k_in_range(d, radius2, num_neighbours,
                                         stratified=stratified)
            return lax.map(per_chunk1, cent_b)
        idx, count = jax.vmap(per_batch)(cent, points)
        idx = idx.reshape(1, m + pad, num_neighbours)[:, :m]
        count = count.reshape(1, m + pad)[:, :m]
        return idx, count

    # Batched: fold the batch into ONE flat chunk loop instead of vmapping
    # the selection machinery — the vmapped lowering of the rank-selection
    # einsums degrades super-linearly in B (measured 2.48 vs 1.79 ms/scene
    # at B=2 on v5e), while flat chunks stay batch-linear.
    cent = cent.reshape(b * num_chunks, 3, chunk)
    b_of_chunk = jnp.repeat(jnp.arange(b, dtype=jnp.int32), num_chunks)

    def per_chunk(args):
        cent_c, b_id = args
        pts_b = lax.dynamic_index_in_dim(points, b_id, axis=0,
                                         keepdims=False)
        d = pairwise_sqdist_exact(cent_c, pts_b)
        return _first_k_in_range(d, radius2, num_neighbours,
                                 stratified=stratified)

    idx, count = lax.map(per_chunk, (cent, b_of_chunk))
    idx = idx.reshape(b, m + pad, num_neighbours)[:, :m]
    count = count.reshape(b, m + pad)[:, :m]
    return idx, count


def ball_query_grouped(points: Array, centroids: Array, radius: float,
                       num_neighbours: int, chunk: int = 512,
                       sorted_axis: Optional[Array] = None,
                       slab_capacity: int = 6144,
                       centroids_sorted: bool = False,
                       slab_impl: Optional[str] = None,
                       stratified: bool = False):
    """Ball query that ALSO returns the grouped relative coordinates
    rel = points[index] - centroid, (B, M, K, 3) f32 — the SA-stage
    grouped-xyz input (reference grouping_kernel.cu:32-53 + modules.py:44).

    rel is one flat row gather over the selected indices.  (An in-kernel
    fused emission existed through round 4 and lost its A/B — see the
    module-flag comment at the top of the file.)  count == 0 centroids
    emit rel = 0 (unreachable when centroids are drawn from `points`, as
    in SA stages: a centroid is strictly within any radius of itself).
    """
    return _ball_query_grouped_jit(points, centroids, radius,
                                   num_neighbours, chunk, sorted_axis,
                                   slab_capacity, centroids_sorted,
                                   _resolve_bq_impl("auto"),
                                   _resolve_slab_impl(slab_impl),
                                   stratified)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 6, 7, 8, 9, 10))
def _ball_query_grouped_jit(points: Array, centroids: Array, radius: float,
                            num_neighbours: int, chunk: int,
                            sorted_axis: Optional[Array],
                            slab_capacity: int, centroids_sorted: bool,
                            bq_impl: str, slab_route: str,
                            stratified: bool = False):
    b, _, m = centroids.shape
    idx, count = _ball_query_jit(points, centroids, radius, num_neighbours,
                                 chunk, bq_impl, sorted_axis,
                                 slab_capacity, centroids_sorted,
                                 slab_route, stratified)
    g = flat_gather_rows(jnp.swapaxes(points, 1, 2).astype(jnp.float32),
                         idx.reshape(b, m * num_neighbours))
    rel = (g.reshape(b, m, num_neighbours, 3)
           - jnp.swapaxes(centroids, 1, 2)[:, :, None, :].astype(jnp.float32))
    rel = jnp.where(count[..., None, None] > 0, rel, 0.0)
    return idx, count, rel


def _exact_resort3(idx: Array, query_xyz: Array, key_xyz: Array):
    """Recompute exact difference-form distances for the 3 selected
    neighbours (matches the CUDA arithmetic, interpolate_kernel.cu:60) and
    restore ascending order with a 3-element sorting network (compare on
    (distance, index) pairs — far cheaper than argsort on TPU).

    Args:
        idx: (B, N1, 3) selected key indices.
        query_xyz: (B, 3, N1); key_xyz: (B, 3, N2).
    Returns:
        (idx (B, N1, 3) i32, dist (B, N1, 3) exact sq distances), sorted.
    """
    b, _, n2 = key_xyz.shape
    k_t = jnp.swapaxes(key_xyz, 1, 2)                 # (B, N2, 3)
    if b == 1:
        sel = jnp.take_along_axis(k_t[:, :, None, :],
                                  idx[..., None], axis=1,
                                  mode="promise_in_bounds")  # (B, N1, 3, 3)
    else:
        # Flat single-table gather: batched gathers lower super-linearly.
        off = (jnp.arange(b, dtype=idx.dtype) * n2)[:, None, None]
        flat = jnp.take_along_axis(
            k_t.reshape(1, b * n2, 3),
            (idx + off).reshape(1, -1, 1), axis=1,
            mode="promise_in_bounds")
        sel = flat.reshape(b, idx.shape[1], 3, 3)
    diff = sel - jnp.swapaxes(query_xyz, 1, 2)[:, :, None, :]
    d_exact = jnp.sum(diff * diff, axis=-1)            # (B, N1, 3)

    def swap(vals, inds, a, bpos):
        va, vb = vals[a], vals[bpos]
        ia, ib = inds[a], inds[bpos]
        do = (va > vb) | ((va == vb) & (ia > ib))
        vals[a] = jnp.where(do, vb, va)
        vals[bpos] = jnp.where(do, va, vb)
        inds[a] = jnp.where(do, ib, ia)
        inds[bpos] = jnp.where(do, ia, ib)

    vals = [d_exact[..., s] for s in range(3)]
    inds = [idx[..., s] for s in range(3)]
    swap(vals, inds, 0, 1)
    swap(vals, inds, 1, 2)
    swap(vals, inds, 0, 1)
    return (jnp.stack(inds, axis=-1).astype(jnp.int32),
            jnp.stack(vals, axis=-1))


def _three_nn_select_xla(query_xyz: Array, key_xyz: Array, chunk: int):
    """Matmul-form 3-NN selection via chunked XLA (CPU / fallback path)."""
    b, _, n1 = query_xyz.shape

    pad = (-n1) % chunk
    q = jnp.pad(query_xyz, ((0, 0), (0, 0), (0, pad)))
    num_chunks = (n1 + pad) // chunk
    q = q.reshape(b, 3, num_chunks, chunk).transpose(0, 2, 1, 3)

    def per_batch(q_b, k_b):
        n2 = k_b.shape[1]
        col = lax.broadcasted_iota(jnp.int32, (1, n2), 1)

        def per_chunk(q_c):
            d = pairwise_sqdist(q_c, k_b)                 # (chunk, N2)
            # Iterative min-extraction (3 passes); argmin ties break to the
            # lower index, matching the reference's strict-< insertion order.
            idx_list = []
            for _ in range(3):
                i = jnp.argmin(d, axis=-1).astype(jnp.int32)
                idx_list.append(i)
                d = jnp.where(col == i[:, None], jnp.inf, d)
            return jnp.stack(idx_list, axis=-1)           # (chunk, 3)

        return lax.map(per_chunk, q_b)

    idx = jax.vmap(per_batch)(q, key_xyz)
    return idx.reshape(b, n1 + pad, 3)[:, :n1]


def three_nn(query_xyz: Array, key_xyz: Array, num_neighbors: int = 3,
             chunk: int = 2048, impl: str = "auto"):
    """3 nearest neighbours of each query point among the key points.

    Selection uses matmul-form distances (fused VMEM-resident Pallas kernel
    on TPU, chunked XLA elsewhere); the returned distances are exact
    difference-form values recomputed on the 3 winners, ascending, ties to
    the lower index.  (A slab-pruned sorted variant existed through round 4
    and lost its A/B — see the module-flag comment at the top of the file.)

    Args:
        query_xyz: (B, 3, N1)
        key_xyz: (B, 3, N2)
        impl: "auto" (pallas on TPU, xla elsewhere), "pallas", or "xla".

    Returns:
        index: (B, N1, 3) int32 — ascending distance, ties to lower index.
        distance: (B, N1, 3) exact squared distances (difference form).
    """
    assert num_neighbors == 3, "reference kernel is hard-coded to K=3"
    # Unjitted wrapper: resolve the route defaults HERE (static-arg
    # pattern; see the module-flag comment at the top of the file).
    if impl == "auto":
        if _ENV_3NN_IMPL:
            impl = _ENV_3NN_IMPL
        else:
            # The fused kernel wins when the (N1, N2) distance block is big
            # enough to be HBM-traffic-bound in XLA; small stages are faster
            # on the plain XLA path (measured on v5e, see BASELINE.md).
            big = query_xyz.shape[2] * key_xyz.shape[2] >= (1 << 22)
            impl = ("pallas" if jax.default_backend() == "tpu" and big
                    else "xla")
    return _three_nn_jit(query_xyz, key_xyz, chunk, impl)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _three_nn_jit(query_xyz: Array, key_xyz: Array, chunk: int, impl: str):
    if impl == "pallas":
        from .pallas.neighbor_kernels import three_nn_pallas
        idx, _ = three_nn_pallas(query_xyz, key_xyz)
    else:
        idx = _three_nn_select_xla(query_xyz, key_xyz, chunk)
    return _exact_resort3(idx, query_xyz, key_xyz)
