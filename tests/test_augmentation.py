"""Augmentation tests: label consistency under rotation/translation, config
parsing, trainer integration, and loss decrease when overfitting a batch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s4g_tpu.configs.config import load_cfg_from_dict
from s4g_tpu.train.augmentation import (build_augmentation,
                                        point_cloud_rotate,
                                        point_cloud_rotate_perturbation,
                                        point_cloud_translate)


def _batch(rng, b=2, n=50, nf=8, t_reg=True):
    return {
        "scene_points": jnp.asarray(rng.randn(b, 3, n).astype(np.float32)),
        "best_frame_R": jnp.asarray(
            np.tile(np.eye(3).reshape(9), (b, nf, 1)).transpose(0, 2, 1)
            .astype(np.float32)),
        "best_frame_t": (jnp.asarray(rng.randn(b, 3, nf).astype(np.float32))
                         if t_reg else
                         jnp.asarray(rng.randint(0, 4, (b, nf)))),
    }


class TestAugmentations:
    def test_rotation_preserves_distances_and_rotates_frames(self):
        rng = np.random.RandomState(0)
        batch = _batch(rng)
        out = point_cloud_rotate(jax.random.key(0), batch)
        a = np.asarray(batch["scene_points"])
        b = np.asarray(out["scene_points"])
        # pairwise distances invariant
        da = np.linalg.norm(a[:, :, :1] - a, axis=1)
        db = np.linalg.norm(b[:, :, :1] - b, axis=1)
        np.testing.assert_allclose(da, db, atol=1e-5)
        # frames stay orthonormal and rotate with the cloud
        r = np.asarray(out["best_frame_R"]).transpose(0, 2, 1).reshape(-1, 3, 3)
        eye = np.einsum("nij,nkj->nik", r, r)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (len(r), 1, 1)),
                                   atol=1e-5)
        # z-rotation: frame z column unchanged for identity input frames
        np.testing.assert_allclose(r[:, 2, 2], 1.0, atol=1e-5)

    def test_rotation_keeps_relative_pose(self):
        """Rotating cloud+labels together must leave the grasp's pose
        RELATIVE to the points invariant."""
        rng = np.random.RandomState(1)
        batch = _batch(rng)
        out = point_cloud_rotate_perturbation(jax.random.key(1), batch,
                                              0.3, 0.9)
        p0 = np.asarray(batch["scene_points"])[:, :, :8]
        t0 = np.asarray(batch["best_frame_t"])
        r0 = np.asarray(batch["best_frame_R"]).transpose(0, 2, 1).reshape(
            2, 8, 3, 3)
        p1 = np.asarray(out["scene_points"])[:, :, :8]
        t1 = np.asarray(out["best_frame_t"])
        r1 = np.asarray(out["best_frame_R"]).transpose(0, 2, 1).reshape(
            2, 8, 3, 3)
        # local offset of the point in the grasp frame is invariant
        off0 = np.einsum("bnji,bjn->bni", r0, p0 - t0)
        off1 = np.einsum("bnji,bjn->bni", r1, p1 - t1)
        np.testing.assert_allclose(off0, off1, atol=1e-4)

    def test_translate_moves_labels(self):
        rng = np.random.RandomState(2)
        batch = _batch(rng)
        out = point_cloud_translate(jax.random.key(2), batch, std=0.05)
        shift_pts = (np.asarray(out["scene_points"])
                     - np.asarray(batch["scene_points"]))
        shift_t = (np.asarray(out["best_frame_t"])
                   - np.asarray(batch["best_frame_t"]))
        np.testing.assert_allclose(shift_pts[:, :, 0], shift_t[:, :, 0],
                                   atol=1e-6)

    def test_class_t_labels_untouched(self):
        rng = np.random.RandomState(3)
        batch = _batch(rng, t_reg=False)
        out = point_cloud_translate(jax.random.key(3), batch, std=0.05)
        np.testing.assert_array_equal(np.asarray(out["best_frame_t"]),
                                      np.asarray(batch["best_frame_t"]))

    def test_build_from_reference_format(self):
        fn = build_augmentation(
            ("PointCloudRotate", ("PointCloudRotatePerturbation", 0.1, 0.2)))
        rng = np.random.RandomState(4)
        batch = _batch(rng)
        out = fn(jax.random.key(4), batch)
        assert out["scene_points"].shape == batch["scene_points"].shape

    def test_unknown_name_raises(self):
        with pytest.raises(ValueError):
            build_augmentation(("NoSuchAug",))


@pytest.mark.slow
def test_training_overfits_one_batch():
    """Loss must drop when overfitting a single batch — validates the whole
    train step (augment off), the missing-trainer reconstruction."""
    from s4g_tpu.models import build_model
    from s4g_tpu.train.optim import build_optimizer
    from s4g_tpu.train.state import TrainState

    cfg = load_cfg_from_dict({
        "MODEL": {"TYPE": "PN2_CLS", "COMPUTE_DTYPE": "float32", "PN2": {
            "NUM_INPUT": 64, "NUM_CENTROIDS": (16, 8),
            "RADIUS": (0.2, 0.4), "NUM_NEIGHBOURS": (8, 8),
            "SA_CHANNELS": ((8, 16), (16, 32)),
            "FP_CHANNELS": ((16, 16), (16, 8)),
            "NUM_FP_NEIGHBOURS": (3, 3), "SEG_CHANNELS": (16,),
            "DROPOUT_PROB": 0.0}},
        "DATA": {"SCORE_CLASSES": 3},
        "SOLVER": {"BASE_LR": 0.01}})
    net, loss_fn, _ = build_model(cfg)
    opt = build_optimizer(cfg)

    rng = np.random.RandomState(0)
    b, n, nf = 2, 64, 8
    batch = {
        "scene_points": jnp.asarray(rng.randn(b, 3, n).astype(np.float32)),
        "scene_score_labels": jnp.asarray(rng.randint(0, 3, (b, n))),
        "scene_score": jnp.asarray(rng.rand(b, n).astype(np.float32)),
        "scene_movable_labels": jnp.asarray(
            rng.rand(b, 5, n).astype(np.float32)),
        "best_frame_R": jnp.asarray(
            np.tile(np.eye(3).reshape(9, 1), (b, 1, nf)).astype(np.float32)),
        "best_frame_t": jnp.asarray(rng.randint(0, 4, (b, nf))),
    }
    variables = net.init(jax.random.key(0), batch, train=False)
    params, stats = variables["params"], variables["batch_stats"]
    opt_state = opt.init(params)

    @jax.jit
    def step(params, stats, opt_state):
        def loss_of(p):
            preds, mut = net.apply({"params": p, "batch_stats": stats},
                                   batch, train=True,
                                   mutable=["batch_stats"],
                                   rngs={"dropout": jax.random.key(1)})
            return sum(jax.tree.leaves(loss_fn(preds, batch))), mut
        (loss, mut), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree.map(lambda a, u: a + u, params, updates)
        return params, mut["batch_stats"], opt_state, loss

    losses = []
    for _ in range(60):
        params, stats, opt_state, loss = step(params, stats, opt_state)
        losses.append(float(loss))
    # random labels on a tiny net: expect a clear downward trend
    assert losses[-1] < losses[0] - 0.1, losses[:3] + losses[-3:]
