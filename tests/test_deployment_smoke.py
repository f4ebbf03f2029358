"""Fast-tier trace smoke for the FLAGSHIP deployment config.

Round 4 shipped with the deployment forward broken at trace time (a kernel
refactor left a stale call-site arity) while the default test tier stayed
green — tiny-model tests never route through the sorted-slab machinery
(VERDICT r4 weak #1).  This test traces the EXACT `__graft_entry__.entry()`
/ curvature_model.yaml configuration (SORT_POINTS + FPS_SHARDS=128,
25,600 points) with the REAL Pallas kernel routes pinned in interpret mode,
via jax.eval_shape — abstract tracing, no 25k-point execution, so it runs
in seconds on the CPU host.  Any arity/import/shape break on the deployment
path now fails `pytest -q`, not just the scale tier.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import pytest

from s4g_tpu.ops import neighbors, sampling


@pytest.fixture
def kernel_routes(monkeypatch):
    """Pin the TPU kernel routes (interpret mode) for CPU tracing."""
    monkeypatch.setattr(neighbors, "_ENV_BQ_SLAB_IMPL", "pallas_interpret")
    monkeypatch.setattr(sampling, "_ENV_FPS_IMPL", "pallas_interpret")


def _trace_forward(cfg_dict_or_yaml):
    from s4g_tpu.models import build_model

    if isinstance(cfg_dict_or_yaml, dict):
        from s4g_tpu.configs.config import load_cfg_from_dict
        cfg = load_cfg_from_dict(cfg_dict_or_yaml)
    else:
        from s4g_tpu.configs.config import load_cfg_from_file
        cfg = load_cfg_from_file(cfg_dict_or_yaml)
    net, _, _ = build_model(cfg)

    batch = {"scene_points": jax.ShapeDtypeStruct((1, 3, 25600),
                                                  jnp.float32)}
    variables = jax.eval_shape(
        lambda k, b: net.init(k, b, train=False), jax.random.key(0), batch)
    out = jax.eval_shape(lambda v, b: net.apply(v, b, train=False),
                         variables, batch)
    assert out["score"].shape == (1, 3, 25600)
    assert out["frame_R"].shape == (1, 9, 25600)
    assert out["frame_t"].shape == (1, 4, 25600)
    assert out["movable_logits"].shape == (1, 5, 25600)


def test_graft_entry_deployment_config_traces(kernel_routes):
    import __graft_entry__ as ge
    _trace_forward(ge.DEPLOYMENT_CFG)


def test_curvature_yaml_deployment_config_traces(kernel_routes):
    # The bench.py headline config (bf16 compute) — same trace guard.
    _trace_forward(str(Path(__file__).resolve().parents[1]
                       / "s4g_tpu" / "configs" / "curvature_model.yaml"))
