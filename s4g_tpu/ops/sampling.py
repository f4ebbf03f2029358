"""Farthest point sampling (FPS).

TPU-native replacement for the reference's FPS CUDA kernel
(reference: pointnet2_utils/csrc/sampling_kernel.cu:50-118).  Semantics:

* the first centroid is always point 0 (sampling_kernel.cu:67);
* each iteration relaxes the per-point min-distance-to-selected-set, then
  picks the argmax (ties resolved to the lowest linear index — the CUDA
  kernel's tie-break depends on thread striding, but distances tie only for
  duplicated points, where any choice yields the same geometry);
* output is (B, M) indices, deterministic.

Two implementations:
* `_fps_xla`   — lax.fori_loop over centroids; correct everywhere, loop
  overhead-bound (used on CPU and as the differential-test oracle's subject).
* `_fps_pallas` — a single Pallas kernel per batch element keeping the xyz
  planes resident in VMEM and the running min-distance field in VECTOR
  REGISTERS (a fori_loop carry — round-tripping it through VMEM scratch
  costs ~40% of the whole kernel at 25,600 points), fusing
  distance-update + argmax per iteration (no HBM traffic inside the loop).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_LANES = 128

# Behaviour env vars are read ONCE at import as route DEFAULTS; the public
# wrapper resolves them before jit and threads the concrete impl as a
# static argument (the static-arg pattern shared with ops.neighbors).
_ENV_FPS_IMPL = os.environ.get("S4G_FPS_IMPL")
_ENV_FPS_GROUP = int(os.environ.get("S4G_FPS_GROUP", "2"))


def set_default_fps_impl(impl):
    """Override the default FPS route (None = backend auto).  Read per-call
    by the unjitted farthest_point_sample wrapper, so a flip (e.g. the
    compile-failure fallback in bench.py / __graft_entry__) takes effect on
    the next call — distinct impls are distinct pjit cache entries."""
    global _ENV_FPS_IMPL
    _ENV_FPS_IMPL = impl


def resolved_fps_impl() -> str:
    """The route 'auto' resolves to right now (for bench reporting)."""
    return _ENV_FPS_IMPL or (
        "pallas" if jax.default_backend() == "tpu" else "xla")


def _fps_xla(points: Array, num_centroids: int) -> Array:
    """(B, 3, N) -> (B, M) int32 via lax.fori_loop."""
    b, _, n = points.shape
    pts = points.transpose(0, 2, 1)  # (B, N, 3)

    def body(i, state):
        min_d, last, out = state
        cur = jnp.take_along_axis(pts, last[:, None, None], axis=1)  # (B,1,3)
        d = jnp.sum((pts - cur) ** 2, axis=-1)                       # (B,N)
        min_d = jnp.minimum(min_d, d)
        nxt = jnp.argmax(min_d, axis=-1).astype(jnp.int32)
        out = out.at[:, i].set(nxt)
        return min_d, nxt, out

    min_d0 = jnp.full((b, n), jnp.inf, dtype=points.dtype)
    last0 = jnp.zeros((b,), dtype=jnp.int32)
    out0 = jnp.zeros((b, num_centroids), dtype=jnp.int32)
    _, _, out = lax.fori_loop(1, num_centroids, body, (min_d0, last0, out0))
    return out


def _fps_kernel(x_ref, y_ref, z_ref, out_ref, *, num_points, num_centroids,
                group):
    """See module docstring.  `num_points` may be an int (all chains see the
    same count — the batch-group case) or a length-`group` tuple (the
    sharded case, where the last shard of a scene can be shorter)."""
    if isinstance(num_points, int):
        num_points = (num_points,) * group
    return _fps_kernel_body(x_ref, y_ref, z_ref, out_ref,
                            num_points=num_points,
                            num_centroids=num_centroids, group=group)


def _fps_kernel_body(x_ref, y_ref, z_ref, out_ref, *, num_points,
                     num_centroids, group):
    """One group of `group` batch elements, interleaved in ONE loop.

    Refs: x/y/z (group, R, 128) planes, out (group, M_pad/128, 128) i32
    (row-major linear slots).

    Per-iteration cost is kept to the distance/argmax passes: the running
    min-distance fields live in the fori_loop carry (vector registers, no
    VMEM round-trip), the current point is read with ONE dynamic-sublane
    row read + lane mask per plane (not a full-plane masked reduction), and
    selected indices accumulate in rolling 128-lane register rows flushed
    once every 128 iterations (not a masked write over the whole output).

    Why a group: a single chain is LATENCY-bound — each iteration serializes
    distance pass -> min -> max-reduce -> index-reduce -> scalar hop, and a
    2x unroll measures flat because consecutive iterations depend on each
    other.  Independent batch elements have independent chains, so
    interleaving `group` of them fills the reduce/scalar latency bubbles
    (measured on v5e: 2.57 -> 1.76 ms/scene at group=2; group=4 regresses to
    2.33 -- four (200, 128) f32 min-distance fields exceed what the
    scheduler can keep resident, so 2 is the default)."""
    rows = x_ref.shape[1]
    lin = (lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0) * _LANES
           + lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1))
    # Padded tail can never be selected: its min-distance stays at -1.
    md0s = [jnp.where(lin < num_points[e], jnp.inf, -1.0).astype(jnp.float32)
            for e in range(group)]
    lane = lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)

    big = jnp.int32(rows * _LANES)
    # Slot 0 is always point 0 (sampling_kernel.cu:67): the zero init of the
    # rolling rows already encodes it.
    acc0 = jnp.zeros((1, _LANES), jnp.int32)

    def body(i, carry):
        new = []
        for e in range(group):
            cur, acc, min_d = carry[e]
            row = cur // _LANES
            lane_sel = lane == (cur % _LANES)
            x_row = x_ref[e, pl.ds(row, 1), :]
            y_row = y_ref[e, pl.ds(row, 1), :]
            z_row = z_ref[e, pl.ds(row, 1), :]
            cx = jnp.max(jnp.where(lane_sel, x_row, -jnp.inf))
            cy = jnp.max(jnp.where(lane_sel, y_row, -jnp.inf))
            cz = jnp.max(jnp.where(lane_sel, z_row, -jnp.inf))
            dx = x_ref[e] - cx
            dy = y_ref[e] - cy
            dz = z_ref[e] - cz
            d = dx * dx + dy * dy + dz * dz
            md = jnp.minimum(min_d, d)
            max_val = jnp.max(md)
            # Lowest linear index attaining the max (deterministic tie-break).
            nxt = jnp.min(jnp.where(md == max_val, lin, big))
            acc = jnp.where(lane == (i % _LANES), nxt, acc)
            new.append((nxt, acc, md))

        @pl.when(i % _LANES == _LANES - 1)
        def _flush():
            for e in range(group):
                out_ref[e, pl.ds(i // _LANES, 1), :] = new[e][1]

        return tuple(new)

    final = lax.fori_loop(1, num_centroids, body,
                          tuple((jnp.int32(0), acc0, md0s[e])
                                for e in range(group)), unroll=False)
    if num_centroids % _LANES != 0:  # static: flush the partial final rows
        for e in range(group):
            out_ref[e, pl.ds((num_centroids - 1) // _LANES, 1), :] = \
                final[e][1]


def _fps_pallas(points: Array, num_centroids: int, *, interpret: bool = False,
                group: int | None = None) -> Array:
    b, _, n = points.shape
    n_pad = ((n + _LANES - 1) // _LANES) * _LANES
    rows = n_pad // _LANES
    if group is None:
        group = _ENV_FPS_GROUP
    group = max(1, min(group, b))
    b_pad = ((b + group - 1) // group) * group
    planes = jnp.pad(points.astype(jnp.float32),
                     ((0, b_pad - b), (0, 0), (0, n_pad - n)))
    planes = planes.reshape(b_pad, 3, rows, _LANES)
    # Mosaic requires the minor output dim to be lane-aligned (128); output
    # slots are row-major linear over a (M_pad/128, 128) grid.
    m_pad = ((num_centroids + _LANES - 1) // _LANES) * _LANES
    rows_out = m_pad // _LANES

    kernel = functools.partial(
        _fps_kernel, num_points=n, num_centroids=num_centroids, group=group)

    def squeeze_kernel(x_ref, y_ref, z_ref, out_ref):
        kernel(x_ref.at[:, 0], y_ref.at[:, 0], z_ref.at[:, 0], out_ref)

    out = pl.pallas_call(
        squeeze_kernel,
        grid=(b_pad // group,),
        in_specs=[
            pl.BlockSpec((group, 1, rows, _LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] * 3,
        out_specs=pl.BlockSpec((group, rows_out, _LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, rows_out, _LANES), jnp.int32),
        interpret=interpret,
    )(planes[:, 0:1], planes[:, 1:2], planes[:, 2:3])
    return out.reshape(b_pad, m_pad)[:b, :num_centroids]


def _shard_views(points: Array, num_shards: int):
    """(B, 3, N) -> ((B*G, 3, Ns) contiguous shard views, Ns).

    Shard s of scene b is the contiguous point slice [s*Ns, (s+1)*Ns); when
    the input is sorted along an axis (the deployment SORT_POINTS path),
    shards are spatial slabs along that axis."""
    b, _, n = points.shape
    g = num_shards
    assert n % g == 0, f"N={n} must be divisible by num_shards={g}"
    ns = n // g
    return points.reshape(b, 3, g, ns).transpose(0, 2, 1, 3) \
        .reshape(b * g, 3, ns), ns


def _shard_offsets(num_shards: int, ns: int) -> Array:
    return (jnp.arange(num_shards, dtype=jnp.int32) * ns)[None, :, None]


def _fps_sharded_xla(points: Array, num_centroids: int,
                     num_shards: int) -> Array:
    """Oracle for the sharded kernel: exact FPS per contiguous shard."""
    b = points.shape[0]
    g = num_shards
    m_g = num_centroids // g
    shards, ns = _shard_views(points, g)
    loc = _fps_xla(shards, m_g)                              # (B*G, M_g)
    out = loc.reshape(b, g, m_g) + _shard_offsets(g, ns)
    return out.reshape(b, num_centroids)


def _fps_sharded_pallas(points: Array, num_centroids: int, num_shards: int,
                        *, interpret: bool = False) -> Array:
    """Sharded FPS: G independent exact-FPS chains over the G contiguous
    shards of each scene, interleaved in ONE kernel loop.

    This breaks the single-chain latency wall (docs/perf_roadmap.md): exact
    FPS serializes distance pass -> min -> max-reduce -> index-reduce ->
    scalar hop every iteration (~475 ns/iteration on v5e regardless of point
    count), but the G chains are independent, so their reduce/scalar bubbles
    interleave AND each chain only runs M/G iterations.  Unlike batch-group
    interleaving (group=4 regressed: 4 full min-distance fields), the G
    per-shard fields sum to ONE scene's field, so register pressure is
    independent of G.

    NOT exact FPS over the whole scene (each shard gets exactly M/G
    centroids); see docs/divergences.md.  Exact per shard, deterministic.
    """
    b = points.shape[0]
    g = num_shards
    m_g = num_centroids // g
    shards, ns = _shard_views(points, g)                     # (B*G, 3, Ns)
    ns_pad = ((ns + _LANES - 1) // _LANES) * _LANES
    rows = ns_pad // _LANES
    planes = jnp.pad(shards.astype(jnp.float32),
                     ((0, 0), (0, 0), (0, ns_pad - ns)))
    planes = planes.reshape(b * g, 3, rows, _LANES)
    m_pad = ((m_g + _LANES - 1) // _LANES) * _LANES
    rows_out = m_pad // _LANES

    kernel = functools.partial(
        _fps_kernel, num_points=ns, num_centroids=m_g, group=g)

    def squeeze_kernel(x_ref, y_ref, z_ref, out_ref):
        kernel(x_ref.at[:, 0], y_ref.at[:, 0], z_ref.at[:, 0], out_ref)

    out = pl.pallas_call(
        squeeze_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((g, 1, rows, _LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] * 3,
        out_specs=pl.BlockSpec((g, rows_out, _LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * g, rows_out, _LANES), jnp.int32),
        interpret=interpret,
    )(planes[:, 0:1], planes[:, 1:2], planes[:, 2:3])
    loc = out.reshape(b * g, m_pad)[:, :m_g]
    out = loc.reshape(b, g, m_g) + _shard_offsets(g, ns)
    return out.reshape(b, num_centroids)


def _fps_lane_kernel(x_ref, y_ref, z_ref, out_ref, *, ns, m_g):
    """128-shard FPS: one independent chain per LANE.

    x/y/z: (Ns_pad, 128) planes where lane g holds shard g's points along
    sublanes; out: (M_g_pad, 128) i32, row i lane g = i-th selection (local
    row index) of shard g.

    Unlike the chain-interleaved variant (measured 1.83 ms at G=8 — Mosaic
    runs the unrolled chains back-to-back, so the serial reduce/scalar
    latency never overlaps), every per-iteration step here is a per-lane
    COLUMN op on the full (Ns, 128) field: distance pass, running min,
    cross-sublane max/argmin reduces, and masked coordinate extraction.  No
    cross-lane reduce, no scalar hop, and only M/128 iterations.
    """
    rows = x_ref.shape[0]
    row_io = lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0)
    md0 = jnp.where(row_io < ns, jnp.inf, -1.0).astype(jnp.float32)
    big = jnp.int32(rows)

    out_ref[0:1, :] = jnp.zeros((1, _LANES), jnp.int32)  # slot 0 = local row 0

    def body(i, carry):
        nxt, md = carry                       # nxt: (1, 128) current row/lane
        sel = row_io == nxt                   # (rows, 128)
        cx = jnp.sum(jnp.where(sel, x_ref[:], 0.0), axis=0, keepdims=True)
        cy = jnp.sum(jnp.where(sel, y_ref[:], 0.0), axis=0, keepdims=True)
        cz = jnp.sum(jnp.where(sel, z_ref[:], 0.0), axis=0, keepdims=True)
        dx = x_ref[:] - cx
        dy = y_ref[:] - cy
        dz = z_ref[:] - cz
        d = dx * dx + dy * dy + dz * dz
        md = jnp.minimum(md, d)
        mx = jnp.max(md, axis=0, keepdims=True)
        # Lowest local row attaining the max (deterministic tie-break).
        nxt = jnp.min(jnp.where(md == mx, row_io, big), axis=0, keepdims=True)
        out_ref[pl.ds(i, 1), :] = nxt
        return nxt, md

    lax.fori_loop(1, m_g, body, (jnp.zeros((1, _LANES), jnp.int32), md0),
                  unroll=False)


def _fps_lane_sharded_pallas(points: Array, num_centroids: int,
                             *, interpret: bool = False) -> Array:
    """Sharded FPS with G = 128 lane-parallel chains (see _fps_lane_kernel).

    Requires 128 | N and 128 | M.  Output order is shard-major: scene b's
    centroid list is the concatenation of the 128 shards' selections, so a
    sorted input yields block-sorted centroid indices."""
    b, _, n = points.shape
    g = _LANES
    ns = n // g
    m_g = num_centroids // g
    rows = ((ns + 7) // 8) * 8
    m_rows = ((m_g + 7) // 8) * 8
    # (B, 3, N) -> (B, 3, Ns, G): lane g = shard g (contiguous point slice).
    planes = points.astype(jnp.float32).reshape(b, 3, g, ns)
    planes = jnp.swapaxes(planes, 2, 3)
    planes = jnp.pad(planes, ((0, 0), (0, 0), (0, rows - ns), (0, 0)))

    kernel = functools.partial(_fps_lane_kernel, ns=ns, m_g=m_g)

    def squeeze_kernel(x_ref, y_ref, z_ref, out_ref):
        kernel(x_ref.at[0, 0], y_ref.at[0, 0], z_ref.at[0, 0],
               out_ref.at[0])

    out = pl.pallas_call(
        squeeze_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, rows, _LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] * 3,
        out_specs=pl.BlockSpec((1, m_rows, _LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m_rows, _LANES), jnp.int32),
        interpret=interpret,
    )(planes[:, 0:1], planes[:, 1:2], planes[:, 2:3])
    # (B, M_g, G) local rows -> shard-major global indices (B, G * M_g).
    loc = jnp.swapaxes(out[:, :m_g, :], 1, 2)              # (B, G, M_g)
    out_idx = loc + _shard_offsets(g, ns)
    return out_idx.reshape(b, num_centroids)


def fps_sharding_applies(n: int, num_centroids: int,
                         num_shards: int) -> bool:
    """True iff farthest_point_sample(num_shards=G) will actually take the
    sharded path for these static sizes (callers use this to know whether
    the output index order is per-shard, e.g. for sortedness invariants)."""
    return (num_shards > 1 and n % num_shards == 0
            and num_centroids % num_shards == 0
            and num_centroids >= num_shards
            and n // num_shards >= num_centroids // num_shards)


def farthest_point_sample(points: Array, num_centroids: int,
                          impl: str = "auto", num_shards: int = 1,
                          sort_local: bool = False) -> Array:
    """Farthest point sampling.  (Unjitted wrapper: "auto" resolves the
    module impl flag HERE, before jit, and the concrete impl is a static
    argument of the jitted body — resolving at trace time would bake the
    route into a pjit cache keyed only on shapes, so bench.py's
    compile-failure fallback flip would silently reuse the stale route.)

    Args:
        points: (B, 3, N) xyz, channels-first (reference layout).
        num_centroids: number of centroids M to select (M <= N).
        impl: "auto" (pallas on TPU, xla elsewhere), "pallas", "xla",
              or "pallas_interpret" (debugging).
        num_shards: 1 = exact FPS (reference semantics).  G > 1 = sharded
            FPS: exact FPS per contiguous N/G-point shard, M/G centroids
            each (deployment fast path; documented divergence).  Requires
            G | N and G | M; falls back to exact FPS otherwise.
        sort_local: sharded path only — sort each shard's selections by
            point index before concatenating.  When the input cloud is
            sorted ascending along an axis (SORT_POINTS), the returned
            index list is then globally ascending, i.e. the gathered
            centroids are themselves sorted along that axis.

    Returns:
        (B, M) int32 centroid indices; index 0 is always first (exact path).
    """
    if impl == "auto":
        impl = resolved_fps_impl()
    return _farthest_point_sample_jit(points, num_centroids, impl,
                                      num_shards, sort_local)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _farthest_point_sample_jit(points: Array, num_centroids: int,
                               impl: str, num_shards: int,
                               sort_local: bool) -> Array:
    n = points.shape[2]
    if fps_sharding_applies(n, num_centroids, num_shards):
        interp = impl == "pallas_interpret"
        if impl == "xla":
            out = _fps_sharded_xla(points, num_centroids, num_shards)
        elif num_shards == _LANES:
            out = _fps_lane_sharded_pallas(points, num_centroids,
                                           interpret=interp)
        else:
            out = _fps_sharded_pallas(points, num_centroids, num_shards,
                                      interpret=interp)
        if sort_local:
            g = num_shards
            m_g = num_centroids // g
            out = jnp.sort(out.reshape(-1, g, m_g), axis=2) \
                .reshape(-1, num_centroids)
        return out

    if impl == "xla":
        return _fps_xla(points, num_centroids)
    if impl == "pallas":
        return _fps_pallas(points, num_centroids)
    if impl == "pallas_interpret":
        return _fps_pallas(points, num_centroids, interpret=True)
    raise ValueError(f"unknown impl {impl!r}")
