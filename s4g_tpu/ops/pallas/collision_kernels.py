"""Fused gripper-collision counting kernel.

The XLA collision path (pipeline/collision.py) materializes the
(G, 4, N) gripper-local cloud — ~420 MB of HBM traffic at deployment scale
(1024 candidate poses x 25,600 points) for what is ~20 VPU ops per
(pose, point) pair.  This kernel tiles poses onto lanes and points onto
sublanes, transforms + classifies each tile in VMEM, and emits only the
per-pose box counts.

Geometry matches the reference boxes exactly
(reference: cloud_processor/view_collision_checker.py:38-65).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...configs import gripper_config as G
from ...configs import processing_config as P

Array = jax.Array

_LANES = 128
_PT_TILE = 2048


def _collision_kernel(mats_ref, pts_ref, out_ref, acc_ref):
    """One (pose tile, point tile) pair; point tiles iterate fastest.

    mats_ref: (16, 128) — element (r, c) of pose g's world->local matrix at
    row 4r + c, lane g.  pts_ref: (8, PT) — rows x/y/z/valid (padded points
    carry valid=0).  out_ref: (8, 128) — row 0 back-box counts, row 1
    finger-box counts.  acc_ref: (8, 128) f32 scratch accumulator.
    """
    t = pl.program_id(1)
    num_t = pl.num_programs(1)

    # (PT, 128) coordinate columns via identity matmul (HIGHEST: the f32
    # MXU path truncates to bf16; x * 1.0 must recombine to x exactly).
    eye = (lax.broadcasted_iota(jnp.int32, (8, _LANES), 0)
           == lax.broadcasted_iota(jnp.int32, (8, _LANES), 1)
           ).astype(jnp.float32)
    cols = lax.dot_general(pts_ref[:], eye,
                           dimension_numbers=(((0,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32,
                           precision=lax.Precision.HIGHEST)
    px, py, pz = cols[:, 0:1], cols[:, 1:2], cols[:, 2:3]
    valid = cols[:, 3:4]

    def row(r, c):
        return mats_ref[4 * r + c:4 * r + c + 1, :]          # (1, 128)

    x = px * row(0, 0) + py * row(0, 1) + pz * row(0, 2) + row(0, 3)
    y = px * row(1, 0) + py * row(1, 1) + pz * row(1, 2) + row(1, 3)
    z = px * row(2, 0) + py * row(2, 1) + pz * row(2, 2) + row(2, 3)

    close_plane = (x < G.FINGER_LENGTH) & (x > -G.BOTTOM_LENGTH)
    z_slab = (z < G.HALF_HAND_THICKNESS) & (z > -G.HALF_HAND_THICKNESS)
    base = close_plane & z_slab & (valid > 0.5)
    back = (base & (y < G.HALF_BOTTOM_WIDTH) & (y > -G.HALF_BOTTOM_WIDTH)
            & (x < -P.BACK_COLLISION_MARGIN))
    finger_y = (((y < G.HALF_BOTTOM_WIDTH) & (y > G.HALF_BOTTOM_SPACE))
                | ((y > -G.HALF_BOTTOM_WIDTH) & (y < -G.HALF_BOTTOM_SPACE)))
    fingers = base & finger_y

    back_cnt = jnp.sum(back.astype(jnp.float32), axis=0)[None]    # (1, 128)
    fing_cnt = jnp.sum(fingers.astype(jnp.float32), axis=0)[None]

    @pl.when(t == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[0:1, :] = acc_ref[0:1, :] + back_cnt
    acc_ref[1:2, :] = acc_ref[1:2, :] + fing_cnt

    @pl.when(t == num_t - 1)
    def _emit():
        out_ref[...] = acc_ref[:]


@functools.partial(jax.jit, static_argnums=(2,))
def collision_counts_pallas(global_to_local: Array, cloud_valid: Array,
                            interpret: bool = False):
    """Per-pose back/finger box point counts.

    Args:
        global_to_local: (G, 4, 4) world->gripper-local matrices.
        cloud_valid: (N, 4) — xyz + validity column (0 excludes a point).

    Returns:
        back_count, finger_count: (G,) float32.
    """
    g, _, _ = global_to_local.shape
    n = cloud_valid.shape[0]
    g_pad = ((g + _LANES - 1) // _LANES) * _LANES
    n_pad = ((n + _PT_TILE - 1) // _PT_TILE) * _PT_TILE

    mats = jnp.pad(global_to_local.reshape(g, 16),
                   ((0, g_pad - g), (0, 0))).T                  # (16, G_pad)
    pts = jnp.pad(cloud_valid.astype(jnp.float32),
                  ((0, n_pad - n), (0, 4))).T                   # (8, N_pad)

    def wrapper(mats_ref, pts_ref, out_ref, acc_ref):
        _collision_kernel(mats_ref, pts_ref, out_ref.at[0], acc_ref)

    out = pl.pallas_call(
        wrapper,
        grid=(g_pad // _LANES, n_pad // _PT_TILE),
        in_specs=[
            pl.BlockSpec((16, _LANES), lambda i, t: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _PT_TILE), lambda i, t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, _LANES), lambda i, t: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g_pad // _LANES, 8, _LANES),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, _LANES), jnp.float32)],
        interpret=interpret,
    )(mats, pts)
    counts = out.transpose(0, 2, 1).reshape(g_pad, 8)[:g]
    return counts[:, 0], counts[:, 1]
