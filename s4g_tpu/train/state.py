"""Train state: one pytree carrying params, BN statistics, optimizer state
and the step counter — the checkpointable unit (the reference checkpointed
{model, optimizer, scheduler} dicts, utils/checkpoint.py:26-43)."""

from __future__ import annotations

from typing import Any

import jax
from flax import struct


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any

    @property
    def variables(self) -> dict:
        return {"params": self.params, "batch_stats": self.batch_stats}
