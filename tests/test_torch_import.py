"""Torch .pth weight-import tests: build a state_dict with the reference's
exact module naming (PointNet2_tcls.py:56-97), convert, and verify the flax
model consumes it — including BN running statistics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s4g_tpu.configs.config import load_cfg_from_dict
from s4g_tpu.models import build_model
from s4g_tpu.utils.checkpoint import (import_pn2_torch_state_dict,
                                      import_torch_checkpoint)

TINY = dict(
    NUM_INPUT=64,
    NUM_CENTROIDS=(16, 8),
    RADIUS=(0.2, 0.4),
    NUM_NEIGHBOURS=(8, 8),
    SA_CHANNELS=((8, 16), (16, 32)),
    FP_CHANNELS=((16, 16), (16, 8)),
    NUM_FP_NEIGHBOURS=(3, 3),
    SEG_CHANNELS=(16,),
)


def _torch_style_state_dict(rng, prefix=""):
    """Reference PN2_CLS layout for the TINY config; channels follow the
    backbone wiring (PointNet2_tcls.py:56-97)."""
    sd = {}

    def conv_bn(name, c_in, c_out, ndim):
        shape = (c_out, c_in, 1, 1) if ndim == 2 else (c_out, c_in, 1)
        sd[f"{name}.conv.weight"] = rng.randn(*shape).astype(np.float32)
        sd[f"{name}.bn.weight"] = rng.rand(c_out).astype(np.float32) + 0.5
        sd[f"{name}.bn.bias"] = rng.randn(c_out).astype(np.float32) * 0.1
        sd[f"{name}.bn.running_mean"] = rng.randn(c_out).astype(np.float32) * 0.1
        sd[f"{name}.bn.running_var"] = rng.rand(c_out).astype(np.float32) + 0.5
        sd[f"{name}.bn.num_batches_tracked"] = np.array(10)

    # SA stages: in 3 (use_xyz), then 16+3
    conv_bn(prefix + "sa_modules.0.mlp.0", 3, 8, 2)
    conv_bn(prefix + "sa_modules.0.mlp.1", 8, 16, 2)
    conv_bn(prefix + "sa_modules.1.mlp.0", 16 + 3, 16, 2)
    conv_bn(prefix + "sa_modules.1.mlp.1", 16, 32, 2)
    # FP stages: fp0 in = 32 + 16 = 48; fp1 in = 16 + 0 = 16
    conv_bn(prefix + "fp_modules.0.mlp.0", 48, 16, 1)
    conv_bn(prefix + "fp_modules.0.mlp.1", 16, 16, 1)
    conv_bn(prefix + "fp_modules.1.mlp.0", 16, 16, 1)
    conv_bn(prefix + "fp_modules.1.mlp.1", 16, 8, 1)
    # heads: SharedMLP(8 -> 16) + logit convs
    for head in ("mlp_seg", "mlp_R", "mlp_t", "mlp_movable"):
        conv_bn(prefix + f"{head}.0", 8, 16, 1)

    def logit(name, c_in, c_out):
        sd[f"{name}.weight"] = rng.randn(c_out, c_in, 1).astype(np.float32)
        sd[f"{name}.bias"] = rng.randn(c_out).astype(np.float32) * 0.1

    logit(prefix + "seg_logit", 16, 3)
    logit(prefix + "R_logit", 16, 9)
    logit(prefix + "t_logit", 16, 4)
    logit(prefix + "movable_logit.0", 16, 5)
    return sd


@pytest.fixture
def cfg():
    return load_cfg_from_dict({
        "MODEL": {"TYPE": "PN2_CLS", "PN2": dict(TINY),
                  "COMPUTE_DTYPE": "float32"},
        "DATA": {"SCORE_CLASSES": 3}})


@pytest.mark.slow
def test_import_matches_init_structure(cfg):
    rng = np.random.RandomState(0)
    sd = _torch_style_state_dict(rng)
    variables = import_pn2_torch_state_dict(sd)

    net, _, _ = build_model(cfg)
    batch = {"scene_points": jnp.asarray(
        rng.randn(1, 3, 64).astype(np.float32) * 0.2)}
    ref = net.init(jax.random.key(0), batch, train=False)

    got_paths = {jax.tree_util.keystr(k)
                 for k, _ in jax.tree_util.tree_flatten_with_path(
                     variables["params"])[0]}
    want_paths = {jax.tree_util.keystr(k)
                  for k, _ in jax.tree_util.tree_flatten_with_path(
                      ref["params"])[0]}
    assert got_paths == want_paths, (
        want_paths - got_paths, got_paths - want_paths)

    # shapes line up leaf by leaf
    for (k, a), (_, b) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(
                variables["params"])[0], key=lambda t: jax.tree_util.keystr(t[0])),
            sorted(jax.tree_util.tree_flatten_with_path(
                ref["params"])[0], key=lambda t: jax.tree_util.keystr(t[0]))):
        assert a.shape == b.shape, (jax.tree_util.keystr(k), a.shape, b.shape)


def test_imported_weights_forward_and_use_bn_stats(cfg):
    rng = np.random.RandomState(1)
    sd = _torch_style_state_dict(rng)
    variables = import_pn2_torch_state_dict(sd)
    net, _, _ = build_model(cfg)
    batch = {"scene_points": jnp.asarray(
        rng.randn(1, 3, 64).astype(np.float32) * 0.2)}
    preds = net.apply(variables, batch, train=False)
    assert np.isfinite(np.asarray(preds["score"])).all()

    # BN running stats must influence the output (eval mode)
    sd2 = dict(sd)
    sd2["sa_modules.0.mlp.0.bn.running_mean"] = (
        sd["sa_modules.0.mlp.0.bn.running_mean"] + 5.0)
    variables2 = import_pn2_torch_state_dict(sd2)
    preds2 = net.apply(variables2, batch, train=False)
    assert not np.allclose(np.asarray(preds["score"]),
                           np.asarray(preds2["score"]))


def test_dataparallel_prefix_stripped(cfg):
    rng = np.random.RandomState(2)
    sd = _torch_style_state_dict(rng, prefix="module.")
    variables = import_pn2_torch_state_dict(sd)
    assert "backbone" in variables["params"]
    assert "head_seg" in variables["params"]


def test_import_torch_checkpoint_pth(tmp_path, cfg):
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(3)
    sd = {k: torch.tensor(v) for k, v in _torch_style_state_dict(rng).items()}
    path = str(tmp_path / "model.pth")
    torch.save({"model": sd, "epoch": 7}, path)
    variables = import_torch_checkpoint(path)
    net, _, _ = build_model(cfg)
    batch = {"scene_points": jnp.asarray(
        rng.randn(1, 3, 64).astype(np.float32) * 0.2)}
    preds = net.apply(variables, batch, train=False)
    assert preds["frame_R"].shape == (1, 9, 64)
