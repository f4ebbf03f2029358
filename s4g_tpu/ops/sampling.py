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

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_LANES = 128


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
    valid = lin < num_points
    md0 = jnp.where(valid, jnp.inf, -1.0).astype(jnp.float32)
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
                          tuple((jnp.int32(0), acc0, md0)
                                for _ in range(group)), unroll=False)
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
        import os
        group = int(os.environ.get("S4G_FPS_GROUP", "2"))
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


@functools.partial(jax.jit, static_argnums=(1, 2))
def farthest_point_sample(points: Array, num_centroids: int,
                          impl: str = "auto") -> Array:
    """Farthest point sampling.

    Args:
        points: (B, 3, N) xyz, channels-first (reference layout).
        num_centroids: number of centroids M to select (M <= N).
        impl: "auto" (pallas on TPU, xla elsewhere), "pallas", "xla",
              or "pallas_interpret" (debugging).

    Returns:
        (B, M) int32 centroid indices; index 0 is always first.
    """
    if impl == "auto":
        import os
        override = os.environ.get("S4G_FPS_IMPL")
        if override:
            impl = override
        else:
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "xla":
        return _fps_xla(points, num_centroids)
    if impl == "pallas":
        return _fps_pallas(points, num_centroids)
    if impl == "pallas_interpret":
        return _fps_pallas(points, num_centroids, interpret=True)
    raise ValueError(f"unknown impl {impl!r}")
