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
@pytest.mark.parametrize("n,m,radius,k", [
    (700, 300, 0.1, 16),      # counts straddle k
    (700, 300, 0.9, 64),      # counts far above k (first-k ordering)
    (700, 300, 0.001, 8),     # mostly-empty balls (duplicate fill, count 0)
    (2500, 600, 0.05, 32),    # multiple key tiles + centroid tiles
])
def test_ball_query_fused_pallas_interpret(n, m, radius, k):
    """Fused distance+pack+bisect kernel == XLA reference path."""
    from s4g_tpu.ops.pallas.neighbor_kernels import ball_query_fused_pallas

    rng = np.random.RandomState(2)
    pts = jnp.asarray((rng.rand(2, 3, n) * 0.6).astype(np.float32))
    cent = pts[:, :, :m]
    idx_p, cnt_p = ball_query_fused_pallas(pts, cent, radius, k,
                                           interpret=True)
    idx_x, cnt_x = ops.ball_query(pts, cent, radius, k, impl="xla")
    np.testing.assert_array_equal(np.asarray(cnt_p), np.asarray(cnt_x))
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))
    # Stratified mode: same kernel, rank-spread slot targets.
    idx_s, cnt_s = ball_query_fused_pallas(pts, cent, radius, k,
                                           interpret=True, stratified=True)
    idx_sx, cnt_sx = ops.ball_query(pts, cent, radius, k, impl="xla",
                                    stratified=True)
    np.testing.assert_array_equal(np.asarray(cnt_s), np.asarray(cnt_sx))
    np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx_sx))


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


@pytest.mark.slow
def test_mlp_chain_pallas_interpret():
    """Fused MLP-chain kernel == jnp reference chain (bf16, pooled+plain)."""
    from s4g_tpu.ops.pallas.mlp_kernels import mlp_chain_pallas

    rng = np.random.RandomState(0)
    for p, cs, pool in [(1024, (3, 16, 32), 64), (700, (5, 8), None),
                        (512, (515, 64), 8)]:
        x = jnp.asarray(rng.randn(p, cs[0]).astype(np.float32))
        params = tuple(
            (jnp.asarray(rng.randn(cs[i], cs[i + 1]).astype(np.float32) * .1),
             jnp.asarray(rng.randn(cs[i + 1]).astype(np.float32) * .1))
            for i in range(len(cs) - 1))
        relu = tuple([True] * (len(params) - 1) + [False])
        out = mlp_chain_pallas(x, params, relu, pool, interpret=True)

        t = x.astype(jnp.bfloat16)
        for i, ((w, b), r) in enumerate(zip(params, relu)):
            t = jnp.dot(t, w.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32) + b
            if r:
                t = jnp.maximum(t, 0.0)
            if i + 1 < len(params):
                t = t.astype(jnp.bfloat16)
        if pool:
            t = jnp.max(t.reshape(-1, pool, t.shape[1]), axis=1)
        np.testing.assert_allclose(np.asarray(out), np.asarray(t), atol=1e-5)


@pytest.mark.slow
def test_shared_mlp_fused_eval_matches_flax(monkeypatch):
    """SharedMLP's fused inference path (BN folded, pooled) == normal path."""
    import jax
    from s4g_tpu.models.nn_layers import SharedMLP

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 6, 16, 5).astype(np.float32))  # (B,M,K,C)
    mlp = SharedMLP((8, 12), dtype=jnp.float32)
    # init with train=True so batch_stats exist and differ from init
    vs = mlp.init(jax.random.key(0), x, train=False)
    # give running stats non-trivial values
    vs = jax.tree.map(lambda a: a, vs)
    import flax
    stats = flax.core.unfreeze(vs)["batch_stats"]
    for layer in stats.values():
        layer["bn"]["mean"] = jnp.asarray(
            rng.randn(*layer["bn"]["mean"].shape).astype(np.float32) * 0.1)
        layer["bn"]["var"] = jnp.asarray(
            rng.rand(*layer["bn"]["var"].shape).astype(np.float32) + 0.5)
    vs = {"params": flax.core.unfreeze(vs)["params"], "batch_stats": stats}

    from s4g_tpu.models import nn_layers
    monkeypatch.setattr(nn_layers, "ENV_MLP_IMPL", "xla")
    ref_out = mlp.apply(vs, x, train=False, max_pool_k=16)
    monkeypatch.setattr(nn_layers, "ENV_MLP_IMPL", "pallas_interpret")
    fused = mlp.apply(vs, x, train=False, max_pool_k=16)
    assert fused.shape == ref_out.shape == (2, 6, 12)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref_out),
                               atol=2e-2)  # bf16 folded-BN tolerance

    # un-pooled chains (FP stages / seg head shape) fuse too when forced
    # (round-4 extension: the A/B now covers the whole MLP block)
    y = jnp.asarray(rng.randn(2, 50, 5).astype(np.float32))
    from s4g_tpu.models import nn_layers
    monkeypatch.setattr(nn_layers, "ENV_MLP_IMPL", "xla")
    a = mlp.apply(vs, y, train=False)
    monkeypatch.setattr(nn_layers, "ENV_MLP_IMPL", "pallas_interpret")
    b = mlp.apply(vs, y, train=False)
    assert b.shape == a.shape == (2, 50, 12)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-2)


@pytest.mark.slow
def test_collision_counts_pallas_interpret():
    """Fused collision-count kernel == XLA einsum path (incl. valid mask)."""
    from s4g_tpu.ops.pallas.collision_kernels import collision_counts_pallas
    from s4g_tpu.pipeline.collision import batch_view_non_collision

    rng = np.random.RandomState(4)
    g, n = 70, 900
    poses = np.tile(np.eye(4, dtype=np.float32), (g, 1, 1))
    import s4g_tpu.utils.math_utils as mu
    rots = np.linalg.qr(rng.randn(g, 3, 3))[0].astype(np.float32)
    poses[:, :3, :3] = rots
    poses[:, :3, 3] = rng.rand(g, 3).astype(np.float32) * 0.2 - 0.1
    cloud = (rng.rand(n, 3).astype(np.float32) * 0.4 - 0.2)
    valid = rng.rand(n) > 0.2

    g2l = jnp.asarray(poses)
    cv = jnp.concatenate([jnp.asarray(cloud),
                          jnp.asarray(valid.astype(np.float32))[:, None]], 1)
    back_p, fing_p = collision_counts_pallas(g2l, cv, interpret=True)

    ok_x = batch_view_non_collision(g2l, jnp.asarray(cloud),
                                    valid=jnp.asarray(valid), impl="xla")
    # reproduce raw counts from the XLA mask helpers
    from s4g_tpu.pipeline.collision import gripper_local_masks
    homo = jnp.concatenate([jnp.asarray(cloud).T, jnp.ones((1, n))], axis=0)
    local = jnp.einsum("gij,jn->gin", g2l, homo)
    masks = gripper_local_masks(local[:, :3, :], jnp.asarray(valid))
    np.testing.assert_array_equal(np.asarray(back_p).astype(int),
                                  np.asarray(jnp.sum(masks["back"], -1)))
    np.testing.assert_array_equal(np.asarray(fing_p).astype(int),
                                  np.asarray(jnp.sum(masks["fingers"], -1)))
    ok_p = batch_view_non_collision(g2l, jnp.asarray(cloud),
                                    valid=jnp.asarray(valid), impl="xla")
    np.testing.assert_array_equal(np.asarray(ok_p), np.asarray(ok_x))


@pytest.mark.slow
def test_ball_query_fused_slab_pallas_interpret():
    """Slab kernel (sorted points, scalar-prefetch key windows) must match
    the f64 oracle exactly; exercised in interpreter mode on CPU."""
    from s4g_tpu.ops.pallas.neighbor_kernels import (
        BQ_C_TILE, BQ_K_TILE, BQ_SLAB_TILES, ball_query_fused_slab_pallas)
    from reference_ops import np_ball_query

    rng = np.random.RandomState(11)
    n, m, r, k = 9000, 700, 0.06, 16
    pts = rng.rand(1, 3, n).astype(np.float32) * 0.7
    ax = 0
    pts = pts[:, :, np.argsort(pts[0, ax], kind="stable")]
    cents = pts[:, :, np.sort(rng.choice(n, m, replace=False))]

    ntile = -(-m // BQ_C_TILE)
    ck = np.concatenate([cents[0, ax],
                         np.repeat(cents[0, ax, -1:], ntile * BQ_C_TILE - m)])
    pk = pts[0, ax]
    n_pad = max(-(-n // BQ_K_TILE) * BQ_K_TILE, BQ_SLAB_TILES * BQ_K_TILE)
    lo_tile = []
    for t in range(ntile):
        lo = np.searchsorted(pk, ck[t * BQ_C_TILE] - r, side="left")
        hi = np.searchsorted(pk, ck[(t + 1) * BQ_C_TILE - 1] + r,
                             side="right")
        lt = min(max(lo // BQ_K_TILE, 0),
                 n_pad // BQ_K_TILE - BQ_SLAB_TILES)
        assert hi - lt * BQ_K_TILE <= BQ_SLAB_TILES * BQ_K_TILE
        lo_tile.append(lt)
    idx, cnt = ball_query_fused_slab_pallas(
        jnp.asarray(pts), jnp.asarray(cents),
        jnp.asarray(lo_tile, jnp.int32), r, k, True)
    want_idx, want_cnt = np_ball_query(pts.astype(np.float64),
                                       cents.astype(np.float64), r, k)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    np.testing.assert_array_equal(np.asarray(cnt), want_cnt)
    # Stratified mode (the deployment default for sorted clouds).
    from reference_ops import np_ball_query_stratified
    idx_s, cnt_s = ball_query_fused_slab_pallas(
        jnp.asarray(pts), jnp.asarray(cents),
        jnp.asarray(lo_tile, jnp.int32), r, k, True, stratified=True)
    want_si, want_sc = np_ball_query_stratified(
        pts.astype(np.float64), cents.astype(np.float64), r, k)
    np.testing.assert_array_equal(np.asarray(idx_s), want_si)
    np.testing.assert_array_equal(np.asarray(cnt_s), want_sc)
