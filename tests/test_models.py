"""Model forward/loss/metric/grad smoke tests on tiny shapes — the jax
equivalent of the reference's inline __main__ self-checks
(reference: models/PointNet2.py:283-317, GPD.py:93-97, PointNetGPD.py:142-147).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s4g_tpu.configs.config import load_cfg_from_dict
from s4g_tpu.models import build_model

TINY_PN2 = dict(
    NUM_INPUT=64,
    NUM_CENTROIDS=(16, 8),
    RADIUS=(0.2, 0.4),
    NUM_NEIGHBOURS=(8, 8),
    SA_CHANNELS=((8, 16), (16, 32)),
    FP_CHANNELS=((16, 16), (16, 8)),
    NUM_FP_NEIGHBOURS=(3, 3),
    SEG_CHANNELS=(16, 8),
)

B, N, NF = 2, 64, 10


def _tiny_cfg(model_type, section="PN2"):
    return load_cfg_from_dict({
        "MODEL": {"TYPE": model_type, section: dict(TINY_PN2),
                  "COMPUTE_DTYPE": "float32"},
        "DATA": {"SCORE_CLASSES": 3},
    })


def _pn2_batch(rng, t_is_cls):
    labels = {
        "scene_points": jnp.asarray(rng.randn(B, 3, N).astype(np.float32)),
        "scene_score_labels": jnp.asarray(rng.randint(0, 3, (B, N))),
        "scene_score": jnp.asarray(rng.rand(B, N).astype(np.float32)),
        "scene_movable_labels": jnp.asarray(
            rng.rand(B, 5, N).astype(np.float32)),
        "best_frame_R": jnp.asarray(rng.randn(B, 9, NF).astype(np.float32)),
    }
    if t_is_cls:
        labels["best_frame_t"] = jnp.asarray(rng.randint(0, 4, (B, NF)))
    else:
        labels["best_frame_t"] = jnp.asarray(
            rng.randn(B, 3, NF).astype(np.float32))
    return labels


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(7)


@pytest.mark.parametrize("model_type,t_is_cls,score_key", [
    pytest.param("PN2", False, "scene_score_logits",
                 marks=pytest.mark.slow),
    ("PN2_CLS", True, "score"),
    ("EDGEPN2D", False, "scene_score_logits"),
    pytest.param("EDGEPN2DU", False, "scene_score_logits",
                 marks=pytest.mark.slow),
])
def test_pn2_family_forward_loss_grad(rng, model_type, t_is_cls, score_key):
    section = model_type if model_type.startswith("EDGE") else "PN2"
    cfg = _tiny_cfg(model_type, section)
    net, loss_fn, metric_fn = build_model(cfg)
    batch = _pn2_batch(rng, t_is_cls)

    variables = net.init(jax.random.key(0), batch, train=False)
    preds = net.apply(variables, batch, train=False)

    assert preds[score_key].shape == (B, 3, N)
    assert preds["frame_R"].shape == (B, 9, N)
    assert preds["movable_logits"].shape == (B, 5, N)
    if t_is_cls:
        assert preds["frame_t"].shape == (B, 4, N)
    else:
        assert preds["frame_t"].shape == (B, 3, N)

    loss_dict = loss_fn(preds, batch)
    assert set(loss_dict) == {"cls_loss", "R_loss", "t_loss", "mov_loss"}
    for v in jax.tree.leaves(loss_dict):
        assert np.isfinite(np.asarray(v)).all()

    metrics = metric_fn(preds, batch)
    assert "cls_acc" in metrics and "R_err" in metrics

    def total_loss(params):
        p = net.apply({**variables, "params": params}, batch, train=False)
        return sum(jax.tree.leaves(loss_fn(p, batch)))

    grads = jax.grad(total_loss)(variables["params"])
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_rot6d_gives_orthonormal_rotations(rng):
    """rot6d Gram-Schmidt (reference functions.py:179-190) must emit proper
    rotations for any non-degenerate 6-D input."""
    from s4g_tpu.models.functional import rot6d_to_mat9
    r6 = jnp.asarray(rng.randn(2, 6, 40).astype(np.float32))
    r9 = np.asarray(rot6d_to_mat9(r6))
    r = r9.transpose(0, 2, 1).reshape(-1, 3, 3)
    eye = np.einsum("nij,nkj->nik", r, r)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (r.shape[0], 1, 1)),
                               atol=1e-4)
    det = np.linalg.det(r)
    np.testing.assert_allclose(det, 1.0, atol=1e-4)


@pytest.mark.slow
def test_pn2_local_both_modes(rng):
    cfg = _tiny_cfg("PN2_LOCAL")
    net, loss_fn, metric_fn = build_model(cfg)
    v_frames, s_poses = NF, 4
    batch = {
        "scene_points": jnp.asarray(rng.randn(B, 3, N).astype(np.float32)),
        "local_search_frame": jnp.asarray(
            rng.randn(B, 12, v_frames, s_poses).astype(np.float32)),
    }
    variables = net.init(jax.random.key(2), batch, train=False)
    preds = net.apply(variables, batch, train=False)
    assert preds["local_search_logits"].shape == (B, 3, v_frames, s_poses)

    labels = {
        "scored_grasp_labels": jnp.asarray(
            rng.randint(0, 3, (B, v_frames, s_poses))),
        "scene_movable_labels": jnp.asarray(rng.randint(0, 2, (B, N))),
        "best_frame_R": jnp.asarray(rng.randn(B, 9, NF).astype(np.float32)),
        "best_frame_t": jnp.asarray(rng.randn(B, 3, NF).astype(np.float32)),
    }
    loss_dict = loss_fn(preds, labels)
    for val in jax.tree.leaves(loss_dict):
        assert np.isfinite(np.asarray(val)).all()
    metrics = metric_fn(preds, labels)
    assert np.isfinite(np.asarray(metrics["R_err"]))

    # deployment mode: grades its own prediction
    batch2 = {"scene_points": batch["scene_points"]}
    preds2 = net.apply(variables, batch2, train=False)
    assert preds2["local_search_logits"].shape == (B, 3, N, 1)


def test_gpd_forward_loss(rng):
    cfg = load_cfg_from_dict({
        "MODEL": {"TYPE": "GPD", "COMPUTE_DTYPE": "float32"},
        "DATA": {"SCORE_CLASSES": 3, "GPD_IN_CHANNELS": 12}})
    net, loss_fn, metric_fn = build_model(cfg)
    batch = {"close_region_projection_maps": jnp.asarray(
        rng.rand(2, 5, 12, 60, 60).astype(np.float32))}
    variables = net.init(jax.random.key(3), batch, train=False)
    preds = net.apply(variables, batch, train=False)
    assert preds["grasp_logits"].shape == (10, 3)
    labels = {"grasp_score_labels": jnp.asarray(rng.randint(0, 3, (10,)))}
    assert np.isfinite(np.asarray(loss_fn(preds, labels)["cls_loss"]))
    m = metric_fn(preds, labels)
    assert {"cls_acc", "prec", "recall"} <= set(m)


def test_pointnet_gpd_forward_loss(rng):
    cfg = load_cfg_from_dict({
        "MODEL": {"TYPE": "PointNetGPD", "COMPUTE_DTYPE": "float32"},
        "DATA": {"SCORE_CLASSES": 3}})
    net, loss_fn, metric_fn = build_model(cfg)
    batch = {"close_region_points": jnp.asarray(
        rng.randn(2, 4, 3, 128).astype(np.float32))}
    variables = net.init(jax.random.key(4), batch, train=False)
    preds = net.apply(variables, batch, train=False)
    assert preds["grasp_logits"].shape == (8, 3)
    labels = {"grasp_score_labels": jnp.asarray(rng.randint(0, 3, (8,)))}
    assert np.isfinite(np.asarray(loss_fn(preds, labels)["cls_loss"]))


def test_weighted_ce_matches_torch_semantics():
    """torch F.cross_entropy(weight=w) normalizes by summed target weights."""
    from s4g_tpu.models.functional import weighted_cross_entropy
    logits = jnp.asarray(np.random.RandomState(0).randn(2, 3, 5).astype(np.float32))
    target = jnp.asarray(np.array([[0, 1, 2, 0, 1], [2, 2, 1, 0, 0]]))
    w = jnp.asarray(np.array([0.5, 1.0, 1.0], np.float32))
    got = float(weighted_cross_entropy(logits, target, w))

    import torch
    import torch.nn.functional as TF
    want = TF.cross_entropy(torch.tensor(np.asarray(logits)),
                            torch.tensor(np.asarray(target, dtype=np.int64)),
                            torch.tensor(np.asarray(w))).item()
    assert abs(got - want) < 1e-5


def test_sort_points_permutation_equivariant(rng):
    """With SORT_POINTS the backbone's internal order is the widest-axis
    sort — a permutation-invariant canonical order — so permuting the
    input cloud must permute the per-point outputs identically (ties
    aside), proving the exit unsort restores the caller's order."""
    cfg = load_cfg_from_dict({
        "MODEL": {"TYPE": "PN2_CLS", "COMPUTE_DTYPE": "float32", "PN2": {
            "NUM_INPUT": N, "SORT_POINTS": True,
            "NUM_CENTROIDS": (16, 8),
            "RADIUS": (0.1, 0.3),
            "NUM_NEIGHBOURS": (8, 8),
            "SA_CHANNELS": ((8, 16), (16, 32)),
            "FP_CHANNELS": ((16, 16), (16, 8)),
            "NUM_FP_NEIGHBOURS": (3, 3),
            "SEG_CHANNELS": (16,),
        }},
        "DATA": {"SCORE_CLASSES": 3},
    })
    net, _, _ = build_model(cfg)
    pts = jnp.asarray(rng.randn(1, 3, N).astype(np.float32))
    variables = net.init(jax.random.key(0), {"scene_points": pts},
                         train=False)
    out = net.apply(variables, {"scene_points": pts}, train=False)

    perm = rng.permutation(N)
    out_p = net.apply(variables,
                      {"scene_points": pts[:, :, perm]}, train=False)
    for key in ("score", "frame_R", "frame_t", "movable_logits"):
        np.testing.assert_allclose(np.asarray(out[key])[:, :, perm],
                                   np.asarray(out_p[key]), atol=1e-5,
                                   err_msg=key)


def test_sorted_batched_forward_matches_single(rng):
    """Batched serving correctness: with SORT_POINTS + sharded FPS, a real
    (B, 3, N) batch through the backbone must equal the per-scene runs
    stacked (the batch-linear fast paths may not change results).  Scenes
    share the same widest axis so the batched shared-axis choice matches
    each scene's own choice."""
    N = 256
    cfg = load_cfg_from_dict({
        "MODEL": {"TYPE": "PN2_CLS", "COMPUTE_DTYPE": "float32", "PN2": {
            "NUM_INPUT": N, "SORT_POINTS": True, "FPS_SHARDS": 4,
            "NUM_CENTROIDS": (64, 16),
            "RADIUS": (0.1, 0.3),
            "NUM_NEIGHBOURS": (8, 8),
            "SA_CHANNELS": ((8, 16), (16, 32)),
            "FP_CHANNELS": ((16, 16), (16, 8)),
            "NUM_FP_NEIGHBOURS": (3, 3),
            "SEG_CHANNELS": (16,),
        }},
        "DATA": {"SCORE_CLASSES": 3},
    })
    net, _, _ = build_model(cfg)
    scale = np.array([1.0, 0.5, 0.3], np.float32)[None, :, None]
    pts = jnp.asarray(rng.rand(3, 3, N).astype(np.float32) * scale)
    variables = net.init(jax.random.key(0),
                         {"scene_points": pts[:1]}, train=False)
    out_b = net.apply(variables, {"scene_points": pts}, train=False)
    for i in range(3):
        out_1 = net.apply(variables, {"scene_points": pts[i:i + 1]},
                          train=False)
        for key in ("score", "frame_R", "frame_t", "movable_logits"):
            np.testing.assert_allclose(
                np.asarray(out_b[key])[i], np.asarray(out_1[key])[0],
                atol=1e-5, err_msg=f"scene {i} {key}")


def test_cast_activations_close_to_f32_activations(rng, monkeypatch):
    """S4G_CAST_ACTIVATIONS=1 keeps inter-layer activations bf16 when the
    backbone computes in bf16 (BatchNorm emits f32 otherwise, doubling the
    HBM traffic of every SA/FP stage).  The cast is a perf default
    candidate (round-4 A/B), so pin its numerics: outputs must stay within
    bf16-roundoff distance of the default mixed path on the same params."""
    from s4g_tpu.models import nn_layers

    cfg = load_cfg_from_dict({
        "MODEL": {"TYPE": "PN2_CLS", "PN2": dict(TINY_PN2),
                  "COMPUTE_DTYPE": "bfloat16"},
        "DATA": {"SCORE_CLASSES": 3},
    })
    net, _, _ = build_model(cfg)
    pts = jnp.asarray(rng.randn(1, 3, N).astype(np.float32))
    variables = net.init(jax.random.key(0), {"scene_points": pts},
                         train=False)

    monkeypatch.setattr(nn_layers, "ENV_CAST_ACTIVATIONS", False)
    ref = net.apply(variables, {"scene_points": pts}, train=False)
    monkeypatch.setattr(nn_layers, "ENV_CAST_ACTIVATIONS", True)
    cast = net.apply(variables, {"scene_points": pts}, train=False)

    # frame_R is post-Gram-Schmidt (normalized); score/movable are logits.
    for key, tol in (("score", 0.05), ("frame_R", 0.02), ("frame_t", 0.05),
                     ("movable_logits", 0.05)):
        np.testing.assert_allclose(np.asarray(ref[key], np.float32),
                                   np.asarray(cast[key], np.float32),
                                   atol=tol, err_msg=key)
