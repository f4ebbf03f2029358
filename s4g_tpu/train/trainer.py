"""Trainer: data-parallel pjit training loop with checkpoint/resume.

The reference released no training loop; this reconstructs it from the
config surface (reference: yacs_config.py:99-153 — solver, scheduler,
BATCH_SIZE, LOG_PERIOD, VAL_PERIOD, CHECKPOINT_PERIOD, AUTO_RESUME) and the
loss contract (sum of the per-model loss dict, as exercised by the inline
self-checks, PointNet2.py:312-317).

TPU design: one jitted train_step — forward (train-mode BN), summed loss,
grad, optax update — with the batch sharded over the mesh's data axis and
parameters replicated; XLA inserts the gradient all-reduce over ICI.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.config import Config
from ..models import build_model
from ..parallel.mesh import (batch_sharding, make_mesh, replicate_sharding,
                             shard_batch)
from ..utils.checkpoint import Checkpointer
from ..utils.logger import MetricLogger, setup_logger
from .augmentation import build_augmentation
from .optim import build_optimizer
from .state import TrainState


class Trainer:
    def __init__(self, cfg: Config, output_dir: str = "output",
                 steps_per_epoch: int = 1, mesh=None, logger=None):
        self.cfg = cfg
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)
        self.logger = logger or setup_logger("S4G.train", output_dir, "train")
        self.net, self.loss_fn, self.metric_fn = build_model(cfg)
        self.optimizer = build_optimizer(cfg, steps_per_epoch)
        self.augment = build_augmentation(cfg.TRAIN.AUGMENTATION)
        self.mesh = mesh if mesh is not None else make_mesh()
        self.checkpointer = Checkpointer(output_dir, self.logger)
        self._train_step = None
        self._val_step = None

    # -- state ---------------------------------------------------------------

    def init_state(self, example_batch: dict, seed: Optional[int] = None
                   ) -> TrainState:
        seed = self.cfg.RNG_SEED if seed is None else seed
        variables = self.net.init(jax.random.key(seed), example_batch,
                                  train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.optimizer.init(params)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           batch_stats=batch_stats, opt_state=opt_state)
        return jax.device_put(state, replicate_sharding(self.mesh))

    def resume_or_init(self, example_batch: dict) -> TrainState:
        state = self.init_state(example_batch)
        if self.cfg.AUTO_RESUME and self.checkpointer.has_checkpoint():
            restored = self.checkpointer.load(None, resume=True, target=state)
            if restored is not None:
                self.logger.info("Resumed from step %d",
                                 int(restored.step))
                return jax.device_put(restored,
                                      replicate_sharding(self.mesh))
        return state

    # -- compiled steps -------------------------------------------------------

    def _build_steps(self):
        net, loss_fn, metric_fn, optimizer = (
            self.net, self.loss_fn, self.metric_fn, self.optimizer)

        augment = self.augment

        def train_step(state: TrainState, batch: dict, dropout_key):
            aug_key, dropout_key = jax.random.split(dropout_key)
            batch = augment(aug_key, batch)

            def loss_of(params):
                variables = {"params": params,
                             "batch_stats": state.batch_stats}
                preds, mutated = net.apply(
                    variables, batch, train=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": dropout_key})
                loss_dict = loss_fn(preds, batch)
                total = sum(jax.tree.leaves(loss_dict))
                return total, (loss_dict, mutated, preds)

            (total, (loss_dict, mutated, preds)), grads = jax.value_and_grad(
                loss_of, has_aux=True)(state.params)
            updates, opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
            params = jax.tree.map(lambda p, u: p + u, state.params, updates)
            new_state = TrainState(
                step=state.step + 1, params=params,
                batch_stats=mutated.get("batch_stats", state.batch_stats),
                opt_state=opt_state)
            metrics = metric_fn(preds, batch)
            scalars = {k: jnp.mean(v) for k, v in {**loss_dict,
                                                   **metrics}.items()}
            scalars["total_loss"] = total
            return new_state, scalars

        def val_step(state: TrainState, batch: dict):
            preds = net.apply(state.variables, batch, train=False)
            loss_dict = loss_fn(preds, batch)
            metrics = metric_fn(preds, batch)
            return {k: jnp.mean(v) for k, v in {**loss_dict,
                                                **metrics}.items()}

        self._train_step = jax.jit(train_step, donate_argnums=(0,))
        self._val_step = jax.jit(val_step)

    # -- loop ----------------------------------------------------------------

    def fit(self, train_data, state: Optional[TrainState] = None,
            val_data=None, max_epochs: Optional[int] = None) -> TrainState:
        if self._train_step is None:
            self._build_steps()
        max_epochs = max_epochs or self.cfg.SCHEDULER.MAX_EPOCH
        log_period = self.cfg.TRAIN.LOG_PERIOD
        val_period = self.cfg.TRAIN.VAL_PERIOD
        ckpt_period = self.cfg.TRAIN.CHECKPOINT_PERIOD
        key = jax.random.key(self.cfg.RNG_SEED)

        meters = MetricLogger(delimiter="  ")
        if state is None:
            example = next(iter(train_data), None)
            if example is None:
                return None
            state = self.resume_or_init(example)
        steps_per_epoch = max(len(train_data), 1) if hasattr(
            train_data, "__len__") else 1
        start_epoch = int(state.step) // steps_per_epoch
        if start_epoch:
            self.logger.info("Resuming at epoch %d (step %d)", start_epoch,
                             int(state.step))
        for epoch in range(start_epoch, max_epochs):
            tic = time.time()
            # Scalars stay ON DEVICE between logs: np.asarray blocks on the
            # step, and on a tunnel-attached TPU that round-trip per
            # iteration serializes dispatch (measured ~2 s/step of host gap
            # in the round-2 at-scale run vs 0.136 s device time).
            # Deferring materialization to the log period keeps up to
            # LOG_PERIOD steps in flight.
            pending = []
            for it, batch in enumerate(train_data):
                data_time = time.time() - tic
                batch = shard_batch(self.mesh, batch)
                key, sub = jax.random.split(key)
                state, scalars = self._train_step(state, batch, sub)
                batch_time = time.time() - tic
                tic = time.time()
                pending.append((batch_time, data_time, scalars))
                if (it + 1) % log_period == 0:
                    for bt, dt, sc in pending:
                        meters.update(time=bt, data=dt,
                                      **jax.tree.map(np.asarray, sc))
                    pending.clear()
                    self.logger.info("epoch %d iter %d  %s", epoch, it + 1,
                                     meters)
            for bt, dt, sc in pending:
                meters.update(time=bt, data=dt,
                              **jax.tree.map(np.asarray, sc))
            pending.clear()

            if val_data is not None and (epoch + 1) % val_period == 0:
                val_meters = MetricLogger(delimiter="  ")
                for batch in val_data:
                    batch = shard_batch(self.mesh, batch)
                    scalars = self._val_step(state, batch)
                    val_meters.update(**jax.tree.map(np.asarray, scalars))
                self.logger.info("VAL epoch %d  %s", epoch, val_meters)

            if (epoch + 1) % ckpt_period == 0 or epoch + 1 == max_epochs:
                self.checkpointer.save(f"model_{epoch + 1:03d}",
                                       jax.device_get(state))
        return state
