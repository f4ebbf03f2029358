"""Interpreter-mode validation of the fused Pallas neighbour kernels
(logic check; TPU execution covered by bench/ops once the hosting image's
Mosaic compiler accepts fresh kernels)."""

import numpy as np
import pytest

import jax.numpy as jnp

from s4g_tpu import ops
from s4g_tpu.ops.pallas.neighbor_kernels import three_nn_pallas


@pytest.mark.slow
def test_three_nn_pallas_matches_xla_interpret():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.rand(1, 3, 512).astype(np.float32))
    k = jnp.asarray(rng.rand(1, 3, 256).astype(np.float32))
    idx_p, d_p = three_nn_pallas(q, k, interpret=True)
    idx_x, d_x = ops.three_nn(q, k)
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_x),
                               rtol=1e-5, atol=1e-7)
