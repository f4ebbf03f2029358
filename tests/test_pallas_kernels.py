"""Interpreter-mode validation of the fused Pallas neighbour kernels
(logic check; compiled TPU execution covered by ops differential tests and
bench.py on the real chip)."""

import numpy as np
import pytest

import jax.numpy as jnp

from s4g_tpu import ops
from s4g_tpu.ops.neighbors import three_nn
from s4g_tpu.ops.pallas.neighbor_kernels import three_nn_pallas


@pytest.mark.slow
def test_three_nn_pallas_matches_xla_interpret():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.rand(1, 3, 512).astype(np.float32))
    k = jnp.asarray(rng.rand(1, 3, 256).astype(np.float32))
    idx_p, d_p = three_nn_pallas(q, k, interpret=True)
    idx_x, d_x = ops.three_nn(q, k)
    # selection must agree exactly; the kernel's matmul-form distances may
    # differ from the exact difference-form values by fp32 rounding only
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_x), atol=2e-6)


@pytest.mark.slow
def test_ball_query_phase1_pallas_interpret():
    """Packed-mask phase-1 kernel + phase-2 rank selection == XLA path."""
    import jax
    from s4g_tpu.ops.neighbors import _first_k_from_packed
    from s4g_tpu.ops.pallas.neighbor_kernels import ball_query_phase1_pallas

    rng = np.random.RandomState(2)
    pts = jnp.asarray((rng.rand(1, 3, 700) * 0.6).astype(np.float32))
    cent = pts[:, :, :300]
    radius, k = 0.1, 16
    mask16, wsum, bsum = ball_query_phase1_pallas(pts, cent, radius,
                                                  interpret=True)
    idx_p, cnt_p = jax.vmap(
        lambda m16, ws, bs: _first_k_from_packed(m16, ws, bs, k, 700)
    )(mask16, wsum, bsum)
    idx_x, cnt_x = ops.ball_query(pts, cent, radius, k)
    np.testing.assert_array_equal(np.asarray(cnt_p), np.asarray(cnt_x))
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))


@pytest.mark.slow
def test_three_nn_full_pipeline_pallas_interpret(monkeypatch):
    """impl='pallas' end-to-end (selection + exact re-sort) vs impl='xla'."""
    import s4g_tpu.ops.pallas.neighbor_kernels as nk

    orig = nk.three_nn_pallas
    monkeypatch.setattr(
        nk, "three_nn_pallas",
        lambda q, k, interpret=False: orig(q, k, interpret=True))
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.rand(2, 3, 300).astype(np.float32))
    k = jnp.asarray(rng.rand(2, 3, 200).astype(np.float32))
    idx_p, d_p = three_nn(q, k, impl="pallas")
    idx_x, d_x = three_nn(q, k, impl="xla")
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))
    np.testing.assert_array_equal(np.asarray(d_p), np.asarray(d_x))
