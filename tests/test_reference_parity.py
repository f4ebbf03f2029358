"""END-TO-END NUMERICAL PARITY vs the actual reference network.

Imports the reference's torch PN2_CLS model (read-only from /root/reference),
stubbing its CUDA extensions (pn2_ext / dgcnn_ext) with CPU implementations
of the documented kernel semantics, then:
  torch model (random init, eval mode) -> state_dict -> our importer ->
  flax model -> SAME input -> outputs must match to float32 tolerance.

This validates the complete chain: op semantics, module wiring, weight
mapping, BN statistics handling.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from s4g_tpu.configs.config import load_cfg_from_dict
from s4g_tpu.models import build_model
from s4g_tpu.utils.checkpoint import import_pn2_torch_state_dict

sys.path.insert(0, os.path.dirname(__file__))
from reference_ops import (np_ball_query, np_farthest_point_sample,
                           np_three_nn)

REFERENCE_PKG = "/root/reference/inference"


def _install_cuda_ext_stubs():
    """CPU stand-ins for pn2_ext / dgcnn_ext with the CUDA semantics
    (forward only — parity runs in eval mode)."""
    pn2 = types.ModuleType(
        "grasp_proposal.network_models.models.pointnet2_utils.pn2_ext")

    def farthest_point_sample(points, num_centroids):
        idx = np_farthest_point_sample(
            points.detach().numpy().astype(np.float64), num_centroids)
        return torch.tensor(idx, dtype=torch.int64)

    def ball_query(points, centroids, radius, num_neighbours):
        idx, cnt = np_ball_query(points.detach().numpy().astype(np.float64),
                                 centroids.detach().numpy().astype(np.float64),
                                 radius, num_neighbours)
        return torch.tensor(idx), torch.tensor(cnt)

    def group_points_forward(points, index):
        b, c, _ = points.shape
        m, k = index.shape[1], index.shape[2]
        flat = index.reshape(b, 1, m * k).expand(b, c, m * k)
        return torch.gather(points, 2, flat).reshape(b, c, m, k)

    def point_search(query, key, k):
        idx, dist = np_three_nn(query.detach().numpy().astype(np.float64),
                                key.detach().numpy().astype(np.float64))
        return torch.tensor(idx), torch.tensor(dist, dtype=query.dtype)

    def interpolate_forward(feature, index, weight):
        b, c, _ = feature.shape
        n1 = index.shape[1]
        flat = index.reshape(b, 1, n1 * 3).expand(b, c, n1 * 3)
        nbr = torch.gather(feature, 2, flat).reshape(b, c, n1, 3)
        return (nbr * weight.unsqueeze(1)).sum(-1)

    pn2.farthest_point_sample = farthest_point_sample
    pn2.ball_query = ball_query
    pn2.group_points_forward = group_points_forward
    pn2.group_points_backward = lambda *a: None
    pn2.point_search = point_search
    pn2.interpolate_forward = interpolate_forward
    pn2.interpolate_backward = lambda *a: None

    dg = types.ModuleType(
        "grasp_proposal.network_models.functions.dgcnn_ext")

    def gather_knn_forward(feature, index):
        b, c, n = feature.shape
        k = index.shape[2]
        flat = index.reshape(b, 1, n * k).expand(b, c, n * k)
        return torch.gather(feature, 2, flat).reshape(b, c, n, k)

    dg.gather_knn_forward = gather_knn_forward
    dg.gather_knn_backward = lambda *a: None

    sys.modules[pn2.__name__] = pn2
    sys.modules[dg.__name__] = dg


@pytest.fixture(scope="module")
def reference_model_cls():
    if not os.path.isdir(REFERENCE_PKG):
        pytest.skip("reference repo not mounted")
    sys.path.insert(0, REFERENCE_PKG)
    _install_cuda_ext_stubs()
    from grasp_proposal.network_models.models import PointNet2_tcls
    return PointNet2_tcls.PointNet2


TINY = dict(
    num_centroids=(16, 8),
    radius=(0.2, 0.4),
    num_neighbours=(8, 8),
    sa_channels=((8, 16), (16, 32)),
    fp_channels=((16, 16), (16, 8)),
    num_fp_neighbours=(3, 3),
    seg_channels=(16,),
)


@pytest.mark.slow
def test_full_network_parity_with_reference(reference_model_cls):
    torch.manual_seed(0)
    ref_net = reference_model_cls(score_classes=3,
                                  num_removal_directions=5,
                                  dropout_prob=0.5, **TINY)
    ref_net.eval()

    rng = np.random.RandomState(0)
    points = (rng.rand(2, 3, 64) * 0.5 - 0.25).astype(np.float32)
    with torch.no_grad():
        ref_preds = ref_net({"scene_points": torch.tensor(points)})

    variables = import_pn2_torch_state_dict(ref_net.state_dict())
    cfg = load_cfg_from_dict({
        "MODEL": {"TYPE": "PN2_CLS", "COMPUTE_DTYPE": "float32", "PN2": {
            "NUM_INPUT": 64,
            "NUM_CENTROIDS": TINY["num_centroids"],
            "RADIUS": TINY["radius"],
            "NUM_NEIGHBOURS": TINY["num_neighbours"],
            "SA_CHANNELS": TINY["sa_channels"],
            "FP_CHANNELS": TINY["fp_channels"],
            "NUM_FP_NEIGHBOURS": TINY["num_fp_neighbours"],
            "SEG_CHANNELS": TINY["seg_channels"],
        }},
        "DATA": {"SCORE_CLASSES": 3}})
    net, _, _ = build_model(cfg)
    preds = net.apply(variables, {"scene_points": jnp.asarray(points)},
                      train=False)

    key_map = {"score": "score", "frame_R": "frame_R",
               "frame_t": "frame_t", "movable_logits": "movable_logits"}
    for ours, theirs in key_map.items():
        a = np.asarray(preds[ours])
        b = ref_preds[theirs].detach().numpy()
        assert a.shape == b.shape, (ours, a.shape, b.shape)
        np.testing.assert_allclose(
            a, b, rtol=2e-4, atol=2e-5,
            err_msg=f"output {ours} diverges from the reference network")
