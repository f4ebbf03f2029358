"""Optimizer + LR-schedule factory (optax).

Mirrors the reference's solver/scheduler config surface (reference:
configs/yacs_config.py:99-134): Adam (betas), SGD (momentum), RMSprop
(alpha), weight decay added to the gradient torch-style, and StepLR /
MultiStepLR epoch schedules.
"""

from __future__ import annotations

import optax

from ..configs.config import Config


def build_lr_schedule(cfg: Config, steps_per_epoch: int):
    """Per-step schedule implementing the reference's per-epoch StepLR /
    MultiStepLR semantics."""
    base_lr = cfg.SOLVER.BASE_LR
    sched_type = cfg.SCHEDULER.TYPE
    if not sched_type:
        return optax.constant_schedule(base_lr)
    if sched_type == "StepLR":
        step_size = max(cfg.SCHEDULER.StepLR.step_size, 1)
        gamma = cfg.SCHEDULER.StepLR.gamma

        def schedule(step):
            epoch = step // steps_per_epoch
            return base_lr * gamma ** (epoch // step_size)
        return schedule
    if sched_type == "MultiStepLR":
        milestones = cfg.SCHEDULER.MultiStepLR.milestones
        gamma = cfg.SCHEDULER.MultiStepLR.gamma

        def schedule(step):
            epoch = step // steps_per_epoch
            factor = 1.0
            for m in milestones:
                factor = factor * (gamma if epoch >= m else 1.0)
            return base_lr * factor
        return schedule
    raise ValueError(f"Unknown scheduler {sched_type!r}")


def build_optimizer(cfg: Config, steps_per_epoch: int = 1):
    """Returns an optax GradientTransformation for SOLVER.TYPE."""
    schedule = build_lr_schedule(cfg, steps_per_epoch)
    wd = cfg.SOLVER.WEIGHT_DECAY
    parts = []
    if wd > 0:
        # torch semantics: weight decay is L2 added to the RAW gradient
        # before the optimizer statistics.
        parts.append(optax.add_decayed_weights(wd))

    solver = cfg.SOLVER.TYPE
    if solver == "Adam":
        b1, b2 = cfg.SOLVER.Adam.betas
        parts.append(optax.scale_by_adam(b1=b1, b2=b2))
    elif solver == "SGD":
        momentum = cfg.SOLVER.SGD.momentum
        if momentum > 0:
            parts.append(optax.trace(decay=momentum))
    elif solver == "RMSprop":
        parts.append(optax.scale_by_rms(decay=cfg.SOLVER.RMSprop.alpha))
    else:
        raise ValueError(f"Unknown solver {solver!r}")

    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts)
