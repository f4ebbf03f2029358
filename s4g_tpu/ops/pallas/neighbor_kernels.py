"""Fused Pallas neighbour kernels.

The XLA formulations of 3-NN and ball query materialize (M, N) distance /
mask matrices in HBM and re-read them several times; these kernels keep the
distance tiles in VMEM, reading only the xyz planes:

* three_nn_pallas — distances via MXU per (Q_TILE, K_TILE) tile, merged into
  per-lane running top-3 (value+index sorting network); a lane holds at most
  all 3 global nearest, so the union of lane-local top-3s contains the
  global top-3, extracted by three min+mask passes at the end.

STATUS: validated in interpreter mode (tests/test_pallas_kernels.py); not
yet wired into the model path — the hosting image's remote Mosaic compile
helper rejects fresh kernel builds at the time of writing, so ops/neighbors
keeps the XLA formulations as the production path.  Wire-in is a 2-3x win on
the FP-stage 3-NN once compiles are available.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_LANES = 128
Q_TILE = 512
K_TILE = 256


def _three_nn_kernel(q_ref, k_ref, idx_ref, dist_ref, *, num_keys):
    """One query tile vs ALL keys.

    q_ref: (Q_TILE, 3) queries; k_ref: (8, NK_pad) keys (rows 0:3 = xyz,
    rows 3:8 sublane padding; padded key columns parked at +1e9).
    idx_ref: (Q_TILE, 3) out; dist_ref: (Q_TILE, 3) out.

    Distances use the exact difference form (x1-x2)^2 + ... — the same
    arithmetic as the reference CUDA kernel (interpolate_kernel.cu:60), so
    no re-sort pass is needed downstream.
    """
    qx = q_ref[:, 0:1]                               # (Q, 1)
    qy = q_ref[:, 1:2]
    qz = q_ref[:, 2:3]
    nk_pad = k_ref.shape[1]
    num_tiles = nk_pad // K_TILE

    big = jnp.float32(jnp.inf)
    m1 = jnp.full((Q_TILE, K_TILE), big)
    m2 = jnp.full((Q_TILE, K_TILE), big)
    m3 = jnp.full((Q_TILE, K_TILE), big)
    i1 = jnp.zeros((Q_TILE, K_TILE), jnp.int32)
    i2 = jnp.zeros((Q_TILE, K_TILE), jnp.int32)
    i3 = jnp.zeros((Q_TILE, K_TILE), jnp.int32)
    col = lax.broadcasted_iota(jnp.int32, (Q_TILE, K_TILE), 1)

    def body(t, carry):
        m1, m2, m3, i1, i2, i3 = carry
        kx = k_ref[0:1, pl.ds(t * K_TILE, K_TILE)]             # (1, K)
        ky = k_ref[1:2, pl.ds(t * K_TILE, K_TILE)]
        kz = k_ref[2:3, pl.ds(t * K_TILE, K_TILE)]
        dx = qx - kx
        dy = qy - ky
        dz = qz - kz
        d = dx * dx + dy * dy + dz * dz                        # (Q, K)
        idx = col + t * K_TILE
        # guard padded keys (k2 = +inf -> d = +inf)
        # insertion sorting network: (d, idx) into (m1..m3, i1..i3)
        swap1 = d < m1
        d1 = jnp.where(swap1, m1, d)
        j1 = jnp.where(swap1, i1, idx)
        m1 = jnp.where(swap1, d, m1)
        i1 = jnp.where(swap1, idx, i1)
        swap2 = d1 < m2
        d2 = jnp.where(swap2, m2, d1)
        j2 = jnp.where(swap2, i2, j1)
        m2 = jnp.where(swap2, d1, m2)
        i2 = jnp.where(swap2, j1, i2)
        swap3 = d2 < m3
        m3 = jnp.where(swap3, d2, m3)
        i3 = jnp.where(swap3, j2, i3)
        return m1, m2, m3, i1, i2, i3

    m1, m2, m3, i1, i2, i3 = lax.fori_loop(
        0, num_tiles, body, (m1, m2, m3, i1, i2, i3), unroll=False)

    # cross-lane extraction: global top-3 from the 3*K_TILE lane candidates
    cand_d = jnp.concatenate([m1, m2, m3], axis=1)             # (Q, 3K)
    cand_i = jnp.concatenate([i1, i2, i3], axis=1)
    big_i = jnp.int32(2 ** 30)
    out_i, out_d = [], []
    for s in range(3):
        best = jnp.min(cand_d, axis=1, keepdims=True)          # (Q, 1)
        at_best = cand_d == best
        best_idx = jnp.min(jnp.where(at_best, cand_i, big_i), axis=1,
                           keepdims=True)
        out_i.append(best_idx)
        out_d.append(best)
        # remove the selected candidate (by index, handles ties)
        taken = at_best & (cand_i == best_idx)
        cand_d = jnp.where(taken, jnp.inf, cand_d)
    idx_ref[:] = jnp.concatenate(out_i, axis=1)
    dist_ref[:] = jnp.concatenate(out_d, axis=1)


@functools.partial(jax.jit, static_argnums=(2,))
def three_nn_pallas(query_xyz: Array, key_xyz: Array,
                    interpret: bool = False):
    """(B, 3, N1) x (B, 3, N2) -> (index (B, N1, 3) i32, dist (B, N1, 3)).

    Distances are matmul-form; callers needing exact difference-form values
    recompute on the selected 3 (see ops.neighbors.three_nn)."""
    b, _, n1 = query_xyz.shape
    n2 = key_xyz.shape[2]
    q_pad = (-n1) % Q_TILE
    k_pad = (-n2) % K_TILE
    # pad queries with zeros; park padded keys far away so they never win.
    # Keys are padded to 8 coordinate rows: Mosaic rejects 3-sublane blocks.
    q = jnp.pad(query_xyz, ((0, 0), (0, 0), (0, q_pad)))
    k = jnp.pad(key_xyz, ((0, 0), (0, 5), (0, k_pad)),
                constant_values=1e9)
    qt = jnp.swapaxes(q, 1, 2)                                 # (B, NQ, 3)

    grid = (b, (n1 + q_pad) // Q_TILE)
    kernel = functools.partial(_three_nn_kernel, num_keys=n2)

    def wrapper(q_ref, k_ref, idx_ref, dist_ref):
        kernel(q_ref.at[0], k_ref.at[0], idx_ref.at[0], dist_ref.at[0])

    idx, dist = pl.pallas_call(
        wrapper,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Q_TILE, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, n2 + k_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Q_TILE, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q_TILE, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n1 + q_pad, 3), jnp.int32),
            jax.ShapeDtypeStruct((b, n1 + q_pad, 3), jnp.float32),
        ],
        interpret=interpret,
    )(qt, k)
    return idx[:, :n1], dist[:, :n1]
