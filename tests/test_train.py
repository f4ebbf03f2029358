"""Training stack tests: collation from the bundled scene pickle, optimizer
factory semantics, and a data-parallel train step on the virtual 8-device
CPU mesh (gradients psum over the mesh)."""

import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s4g_tpu.configs.config import load_cfg_from_dict
from s4g_tpu.parallel.mesh import make_mesh
from s4g_tpu.train.dataset import (SceneGraspDataset, collate_scene,
                                   t_bin_class, scene_quality_score)
from s4g_tpu.train.optim import build_lr_schedule, build_optimizer
from s4g_tpu.train.trainer import Trainer

REFERENCE_SCENE = "/root/reference/inference/2638_view_0.p"

TINY_PN2 = dict(
    NUM_INPUT=128,
    NUM_CENTROIDS=(32, 8),
    RADIUS=(0.02, 0.08),
    NUM_NEIGHBOURS=(8, 8),
    SA_CHANNELS=((8, 16), (16, 32)),
    FP_CHANNELS=((16, 16), (16, 8)),
    NUM_FP_NEIGHBOURS=(3, 3),
    SEG_CHANNELS=(16,),
)


def _tiny_cfg(**overrides):
    cfg = {
        "MODEL": {"TYPE": "PN2_CLS", "PN2": dict(TINY_PN2),
                  "COMPUTE_DTYPE": "float32"},
        "DATA": {"SCORE_CLASSES": 3},
        "TRAIN": {"BATCH_SIZE": 8, "LOG_PERIOD": 1},
        "SCHEDULER": {"MAX_EPOCH": 1, "TYPE": "StepLR",
                      "StepLR": {"step_size": 20, "gamma": 0.5}},
    }
    for k, v in overrides.items():
        cfg.setdefault(k, {}).update(v)
    return load_cfg_from_dict(cfg)


@pytest.mark.skipif(not os.path.exists(REFERENCE_SCENE),
                    reason="bundled scene not available")
class TestCollation:
    def test_collate_bundled_scene(self):
        data = dict(np.load(REFERENCE_SCENE, allow_pickle=True))
        sample = collate_scene(data, num_points=1024, score_classes=3,
                               rng=np.random.RandomState(0))
        assert sample["scene_points"].shape == (3, 1024)
        gf = sample["num_frame_points"]
        assert gf == min(306, 1024) == 306
        assert sample["best_frame_R"].shape == (9, gf)
        assert sample["best_frame_t"].shape == (gf,)
        assert sample["scene_score"][:gf].max() <= 1.0
        assert (sample["scene_score"][gf:] == 0).all()
        # frame points must be first: their scores come from the quality formula
        q = scene_quality_score(data["search_score"], data["antipodal_score"])
        np.testing.assert_allclose(sample["scene_score"][:gf],
                                   np.clip(q, 0, 1)[:306], atol=1e-6)
        # rotations must be orthonormal (they come from SE(3) poses)
        r = sample["best_frame_R"].T.reshape(-1, 3, 3)
        eye = np.einsum("nij,nkj->nik", r, r)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (gf, 1, 1)),
                                   atol=1e-4)

    def test_t_bins_recoverable(self):
        data = dict(np.load(REFERENCE_SCENE, allow_pickle=True))
        pts = data["point_cloud"][:, data["valid_index"]].T
        cls = t_bin_class(pts, data["valid_frame"])
        assert cls.min() >= 0 and cls.max() <= 3
        # depths should be near the bins they map to
        x = data["valid_frame"][:, :3, 0]
        depth = np.sum(x * (pts - data["valid_frame"][:, :3, 3]), axis=1)
        bins = np.array([0.08, 0.06, 0.04, 0.02])
        err = np.abs(depth - bins[cls])
        # real dumped frames sit near but not exactly on the bins (the
        # grasp-search grid plus pose noise); nearest-bin must be tight for
        # the bulk and bounded overall
        assert np.percentile(err, 90) < 0.011
        assert err.max() < 0.03


class TestOptim:
    def test_step_lr_schedule(self):
        cfg = _tiny_cfg()
        sched = build_lr_schedule(cfg, steps_per_epoch=10)
        assert np.isclose(float(sched(0)), 0.001)
        assert np.isclose(float(sched(199)), 0.001)      # epoch 19
        assert np.isclose(float(sched(200)), 0.0005)     # epoch 20
        assert np.isclose(float(sched(400)), 0.00025)    # epoch 40

    def test_multistep_lr(self):
        cfg = load_cfg_from_dict({
            "SCHEDULER": {"TYPE": "MultiStepLR",
                          "MultiStepLR": {"milestones": "(2, 4)",
                                          "gamma": 0.1}},
            "SOLVER": {"BASE_LR": 1.0}})
        sched = build_lr_schedule(cfg, steps_per_epoch=1)
        assert np.isclose(float(sched(0)), 1.0)
        assert np.isclose(float(sched(2)), 0.1)
        assert np.isclose(float(sched(4)), 0.01)

    @pytest.mark.parametrize("solver", ["Adam", "SGD", "RMSprop"])
    def test_optimizers_build_and_step(self, solver):
        cfg = load_cfg_from_dict({"SOLVER": {"TYPE": solver,
                                             "WEIGHT_DECAY": 0.01}})
        opt = build_optimizer(cfg)
        params = {"w": jnp.ones(3)}
        state = opt.init(params)
        updates, _ = opt.update({"w": jnp.ones(3)}, state, params)
        assert np.isfinite(np.asarray(updates["w"])).all()


@pytest.mark.skipif(not os.path.exists(REFERENCE_SCENE),
                    reason="bundled scene not available")
@pytest.mark.slow
def test_data_parallel_training_on_mesh(tmp_path):
    """Two real train steps, batch sharded over the 8-device CPU mesh."""
    # materialize a small dataset from the bundled scene
    data = dict(np.load(REFERENCE_SCENE, allow_pickle=True))
    data_dir = tmp_path / "training_data"
    data_dir.mkdir()
    for i in range(8):
        with open(data_dir / f"0_view_{i}.p", "wb") as f:
            pickle.dump(data, f)

    cfg = _tiny_cfg()
    ds = SceneGraspDataset(str(data_dir), num_points=128, score_classes=3,
                           batch_size=8, num_frame_points=32, seed=0)
    mesh = make_mesh()
    assert mesh.devices.size == 8

    trainer = Trainer(cfg, output_dir=str(tmp_path / "out"),
                      steps_per_epoch=len(ds), mesh=mesh)
    batches = list(ds)
    assert batches, "dataset produced no batches"
    batch = batches[0]
    assert batch["scene_points"].shape == (8, 3, 128)

    trainer._build_steps()
    state = trainer.init_state(batch)
    from s4g_tpu.parallel.mesh import shard_batch
    sharded = shard_batch(mesh, batch)
    key = jax.random.key(0)
    state, scalars1 = trainer._train_step(state, sharded, key)
    state, scalars2 = trainer._train_step(state, sharded, key)
    assert int(state.step) == 2
    for v in scalars2.values():
        assert np.isfinite(np.asarray(v)).all()

    # checkpoint round-trip
    trainer.checkpointer.save("model_001", jax.device_get(state))
    assert trainer.checkpointer.has_checkpoint()
    restored = trainer.checkpointer.load(None, resume=True,
                                         target=jax.device_get(state))
    assert int(restored.step) == 2


@pytest.mark.skipif(not os.path.exists(REFERENCE_SCENE),
                    reason="bundled scene not available")
def test_data_parallel_step_equivalence(tmp_path):
    """The 8-device sharded step must produce the SAME losses and the SAME
    gradients as the single-device step on the same batch — the correctness
    property of replacing nn.DataParallel (reference grasp_detector.py:62-63),
    whose scatter/gather is numerically equivalent to single-GPU.  A wrong
    psum axis or a double-counted gradient fails this test.

    Gradients are the right thing to compare: parameters after one Adam step
    amplify reduction-order sign flips of near-zero gradients to the full
    +/-lr, and Adam's scale invariance would HIDE a uniformly doubled
    gradient anyway."""
    data = dict(np.load(REFERENCE_SCENE, allow_pickle=True))
    data_dir = tmp_path / "training_data"
    data_dir.mkdir()
    for i in range(8):
        with open(data_dir / f"0_view_{i}.p", "wb") as f:
            pickle.dump(data, f)

    cfg = _tiny_cfg()
    ds = SceneGraspDataset(str(data_dir), num_points=128, score_classes=3,
                           batch_size=8, num_frame_points=32, seed=0)
    batch = next(iter(ds))
    key = jax.random.key(0)

    from s4g_tpu.models import build_model
    from s4g_tpu.parallel.mesh import replicate_sharding, shard_batch
    net, loss_fn, metric_fn = build_model(cfg)
    variables = net.init(jax.random.key(1), batch, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    def loss_and_grads(params, batch):
        def loss_of(p):
            preds, _ = net.apply(
                {"params": p, "batch_stats": batch_stats}, batch,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": key})
            loss_dict = loss_fn(preds, batch)
            return sum(jax.tree.leaves(loss_dict)), loss_dict
        (total, loss_dict), grads = jax.value_and_grad(
            loss_of, has_aux=True)(params)
        return total, loss_dict, grads

    mesh = make_mesh()
    assert mesh.devices.size == 8
    total_s, losses_s, grads_s = jax.jit(loss_and_grads)(
        jax.device_put(params, replicate_sharding(mesh)),
        shard_batch(mesh, batch))

    dev0 = jax.devices()[0]
    total_d, losses_d, grads_d = jax.jit(loss_and_grads)(
        jax.device_put(params, dev0),
        jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), dev0), batch))

    np.testing.assert_allclose(np.asarray(total_s), np.asarray(total_d),
                               rtol=2e-5)
    for k in losses_d:
        np.testing.assert_allclose(
            np.asarray(losses_s[k]), np.asarray(losses_d[k]),
            rtol=2e-5, atol=2e-6, err_msg=f"loss {k} diverges under DP")
    flat_s = jax.tree_util.tree_flatten_with_path(jax.device_get(grads_s))[0]
    flat_d = jax.tree_util.tree_flatten_with_path(jax.device_get(grads_d))[0]
    assert len(flat_s) == len(flat_d) > 0
    # Tolerances sized for f32 reduction-order noise amplified through
    # train-mode BatchNorm statistics (measured ~1e-4 of the leaf scale on
    # the worst leaf); a wrong psum axis (8x) or a double-counted gradient
    # (2x) is orders of magnitude outside them.
    for (path_s, gs), (_, gd) in zip(flat_s, flat_d):
        name = jax.tree_util.keystr(path_s)
        scale = max(float(np.max(np.abs(gd))), 1e-3)
        np.testing.assert_allclose(
            gs, gd, rtol=2e-3, atol=5e-4 * scale,
            err_msg=f"gradient {name} diverges under data parallelism")
        np.testing.assert_allclose(
            float(np.linalg.norm(gs)), float(np.linalg.norm(gd)),
            rtol=1e-4, atol=1e-6,
            err_msg=f"gradient norm of {name} diverges under data "
                    "parallelism")


@pytest.mark.skipif(not os.path.exists(REFERENCE_SCENE),
                    reason="bundled scene not available")
@pytest.mark.slow
def test_trainer_fit_and_resume(tmp_path):
    """fit() trains, checkpoints, and a NEW Trainer resumes at the right
    epoch (AUTO_RESUME semantics, reference checkpoint.py:45-53)."""
    data = dict(np.load(REFERENCE_SCENE, allow_pickle=True))
    data_dir = tmp_path / "training_data"
    data_dir.mkdir()
    for i in range(8):
        with open(data_dir / f"0_view_{i}.p", "wb") as f:
            pickle.dump(data, f)

    cfg = _tiny_cfg(TRAIN={"BATCH_SIZE": 8, "LOG_PERIOD": 1,
                           "CHECKPOINT_PERIOD": 1},
                    SCHEDULER={"MAX_EPOCH": 2, "TYPE": "StepLR",
                               "StepLR": {"step_size": 20, "gamma": 0.5}})
    ds = SceneGraspDataset(str(data_dir), num_points=128, score_classes=3,
                           batch_size=8, num_frame_points=32, seed=0)
    out = str(tmp_path / "out")
    trainer = Trainer(cfg, output_dir=out, steps_per_epoch=len(ds))
    state = trainer.fit(ds, max_epochs=2)
    assert int(state.step) == 2 * len(ds)
    assert trainer.checkpointer.has_checkpoint()

    # resume with a fresh trainer: no further epochs should run
    trainer2 = Trainer(cfg, output_dir=out, steps_per_epoch=len(ds))
    state2 = trainer2.fit(ds, max_epochs=2)
    assert int(state2.step) == 2 * len(ds)  # resumed complete, unchanged
