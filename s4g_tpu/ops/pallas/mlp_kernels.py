"""Fused point-wise MLP chain kernel (inference path).

The SharedMLP stacks (reference: nn_utils/mlp.py:55-114) are 1x1-conv
chains: y = relu(BN(W x)) per layer over hundreds of thousands of points.
XLA runs each Dense as its own HLO, so every intermediate activation
round-trips HBM (~0.9 GB per forward at deployment scale — profiled as most
of the "MLP residual" time).  This kernel tiles the POINT axis and runs the
whole chain (+ the set-abstraction max-pool over neighbour groups) on one
VMEM-resident tile, so only the chain input and the pooled output touch HBM.

Inference-only: BatchNorm is pre-folded into each layer's (W, b) by the
caller (eval mode is a pure affine); training keeps the flax path for
autodiff and running-stat updates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_TILE_P = 2048


def _mlp_chain_kernel(x_ref, *refs, num_layers, relu, pool_k, compute_dtype,
                      transposed_in):
    """One point tile through the full chain.

    refs = (w0, b0, w1, b1, ..., out_ref); x_ref (TILE_P, C_in) — or, when
    `transposed_in`, (C_sub, TILE_P) channel-planes that are transposed
    in-kernel to (TILE_P, 128) via an identity matmul (Mosaic block minors
    must be 128-aligned, and padding a 3-channel grouped-xyz input to 128
    lanes in HBM would inflate it 42x); out_ref (TILE_P or TILE_P/pool_k,
    C_out).
    """
    out_ref = refs[-1]
    if transposed_in:
        c_sub = x_ref.shape[0]
        eye = (lax.broadcasted_iota(jnp.int32, (c_sub, 128), 0)
               == lax.broadcasted_iota(jnp.int32, (c_sub, 128), 1)
               ).astype(jnp.float32)
        # HIGHEST: the f32 MXU path truncates multiplies to bf16; x * 1.0
        # must recombine to x exactly.
        t = lax.dot_general(x_ref[:], eye,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST)
        t = t.astype(compute_dtype)
    else:
        t = x_ref[:].astype(compute_dtype)
    for i in range(num_layers):
        w = refs[2 * i][:]
        b = refs[2 * i + 1][:]
        t = lax.dot_general(t, w, dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        t = t + b
        if relu[i]:
            t = jnp.maximum(t, 0.0)
        if i + 1 < num_layers:
            t = t.astype(compute_dtype)
    if pool_k is not None:
        groups = t.shape[0] // pool_k
        t = jnp.max(t.reshape(groups, pool_k, t.shape[1]), axis=1)
    out_ref[...] = t.astype(out_ref.dtype)


def _pad_lanes(a: Array, mult: int = 128) -> Array:
    pad = (-a.shape[-1]) % mult
    if pad:
        a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])
    return a


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def mlp_chain_pallas(x: Array, params, relu, pool_k=None,
                     compute_dtype=jnp.bfloat16, interpret: bool = False):
    """Run a point-wise MLP chain (optionally + group max-pool) fused.

    Args:
        x: (P, C_in) points-by-channels. P must be a multiple of pool_k
            (when pooling); it is padded to the tile size internally.
        params: tuple of (W (C_in_i, C_out_i), b (C_out_i,)) per layer —
            BatchNorm already folded in (eval).
        relu: tuple of per-layer bools.
        pool_k: optional neighbour-group size; output is max over each
            consecutive group of pool_k points.

    Returns:
        (P, C_out) — or (P / pool_k, C_out) when pooling.
    """
    num_layers = len(params)
    assert len(relu) == num_layers
    p, c_in = x.shape
    c_out = params[-1][0].shape[1]

    tile = _TILE_P
    if pool_k is not None:
        assert p % pool_k == 0
        assert tile % pool_k == 0
    p_pad = ((p + tile - 1) // tile) * tile
    # Narrow inputs (C_in < 128) go in TRANSPOSED as (C_sub, P) channel
    # planes and are transposed per tile in-kernel: Mosaic block minors must
    # be 128-aligned, and padding a 3-channel grouped-xyz input to 128 lanes
    # in HBM would inflate it 42x (the whole point of the kernel is to avoid
    # that traffic).  Wide inputs pad their channel axis to a 128 multiple.
    transposed_in = c_in < 128
    if transposed_in:
        c_sub = ((c_in + 7) // 8) * 8
        x_in = jnp.pad(x.T, ((0, c_sub - c_in), (0, p_pad - p)))
        x_spec = pl.BlockSpec((c_sub, tile), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
        cc = 128
    else:
        x_in = _pad_lanes(jnp.pad(x, ((0, p_pad - p), (0, 0))))
        x_in = x_in.reshape(p_pad // tile, tile, x_in.shape[1])
        x_spec = pl.BlockSpec((1, tile, x_in.shape[2]), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        cc = x_in.shape[2]

    flat_params = []
    in_specs = [x_spec]
    for w, b in params:
        w = _pad_lanes(jnp.pad(w.astype(compute_dtype),
                               ((0, cc - w.shape[0]), (0, 0))))
        b = _pad_lanes(b.astype(jnp.float32)[None, :])
        flat_params += [w, b]
        in_specs += [
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        cc = w.shape[1]

    out_rows = tile if pool_k is None else tile // pool_k
    total_out = p_pad if pool_k is None else p_pad // pool_k

    kernel = functools.partial(
        _mlp_chain_kernel, num_layers=num_layers, relu=tuple(relu),
        pool_k=pool_k, compute_dtype=compute_dtype,
        transposed_in=transposed_in)

    def wrapper(x_ref, *refs):
        kernel(x_ref if transposed_in else x_ref.at[0],
               *[r if r is not refs[-1] else r.at[0] for r in refs])

    out = pl.pallas_call(
        wrapper,
        grid=(p_pad // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, out_rows, cc), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (p_pad // tile, out_rows, cc), jnp.float32),
        interpret=interpret,
    )(x_in, *flat_params)
    out = out.reshape(total_out, cc)[:p if pool_k is None else p // pool_k,
                                     :c_out]
    return out
