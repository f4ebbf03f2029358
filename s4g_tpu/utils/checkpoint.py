"""Checkpointing: orbax-backed save/load with last-checkpoint pointer, plus a
PyTorch `.pth` weight importer for the reference's pretrained models.

Same contract as the reference CheckPointer (reference:
utils/checkpoint.py:9-89): checkpoints carry {model, optimizer-state, extra},
a `last_checkpoint` pointer file enables AUTO_RESUME, and torch checkpoints
with a DataParallel "module." prefix load transparently.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class Checkpointer:
    """Save/restore a train-state pytree with last-checkpoint semantics."""

    def __init__(self, save_dir: str = "", logger=None):
        self.save_dir = os.path.abspath(save_dir) if save_dir else ""
        self.logger = logger or logging.getLogger(__name__)
        self._ckpt = ocp.PyTreeCheckpointer()

    def _pointer_file(self) -> str:
        return os.path.join(self.save_dir, "last_checkpoint")

    def save(self, name: str, state: Any) -> str:
        if not self.save_dir:
            self.logger.warning("No save directory specified; skipping save")
            return ""
        path = os.path.join(self.save_dir, f"{name}.ckpt")
        self._ckpt.save(path, state, force=True)
        with open(self._pointer_file(), "w") as f:
            f.write(path)
        self.logger.info("Saved checkpoint to %s", path)
        return path

    def has_checkpoint(self) -> bool:
        return os.path.exists(self._pointer_file())

    def last_checkpoint_path(self) -> str:
        try:
            with open(self._pointer_file()) as f:
                return f.read().strip()
        except IOError:
            self.logger.warning("last_checkpoint pointer missing in %s",
                                self.save_dir)
            return ""

    def load(self, filename: Optional[str] = None, resume: bool = True,
             target: Any = None) -> Any:
        if resume and self.has_checkpoint():
            filename = self.last_checkpoint_path()
        if not filename:
            self.logger.info("No checkpoint found; initializing from scratch")
            return None
        self.logger.info("Loading checkpoint from %s", filename)
        if filename.endswith((".pth", ".pt")):
            raise ValueError(
                "PyTorch checkpoints must go through import_torch_checkpoint")
        return self._ckpt.restore(filename, item=target)


# -----------------------------------------------------------------------------
# PyTorch weight import
# -----------------------------------------------------------------------------

def _strip_module_prefix(state_dict: dict) -> dict:
    """Drop DataParallel's "module." prefix (reference: checkpoint.py:80-89)."""
    return {(k[7:] if k.startswith("module.") else k): v
            for k, v in state_dict.items()}


def _to_np(value) -> np.ndarray:
    if hasattr(value, "detach"):
        value = value.detach().cpu().numpy()
    return np.asarray(value)


def _import_shared_mlp(sd: dict, torch_prefix: str, params: dict,
                       stats: dict) -> None:
    """Map torch SharedMLP (stack of ConvNd+BN) -> our SharedMLP layers."""
    j = 0
    while f"{torch_prefix}.{j}.conv.weight" in sd:
        w = _to_np(sd[f"{torch_prefix}.{j}.conv.weight"])
        # torch conv kernel (C_out, C_in, 1[, 1]) -> Dense kernel (C_in, C_out)
        kernel = w.reshape(w.shape[0], w.shape[1]).T
        layer = params.setdefault(f"layer{j}", {})
        layer.setdefault("conv", {})["kernel"] = kernel
        if f"{torch_prefix}.{j}.conv.bias" in sd:
            layer["conv"]["bias"] = _to_np(sd[f"{torch_prefix}.{j}.conv.bias"])
        if f"{torch_prefix}.{j}.bn.weight" in sd:
            layer.setdefault("bn", {})
            layer["bn"]["scale"] = _to_np(sd[f"{torch_prefix}.{j}.bn.weight"])
            layer["bn"]["bias"] = _to_np(sd[f"{torch_prefix}.{j}.bn.bias"])
            st = stats.setdefault(f"layer{j}", {}).setdefault("bn", {})
            st["mean"] = _to_np(sd[f"{torch_prefix}.{j}.bn.running_mean"])
            st["var"] = _to_np(sd[f"{torch_prefix}.{j}.bn.running_var"])
        j += 1


def _import_logit(sd: dict, torch_key: str, params: dict) -> None:
    w = _to_np(sd[f"{torch_key}.weight"])
    params["kernel"] = w.reshape(w.shape[0], w.shape[1]).T
    params["bias"] = _to_np(sd[f"{torch_key}.bias"])


def import_pn2_torch_state_dict(state_dict: dict) -> dict:
    """Convert a reference PN2/PN2_CLS torch state_dict into flax variables
    {params, batch_stats} matching PointNet2CLS/PointNet2Reg.

    Torch layout (reference PointNet2_tcls.py:56-97):
      sa_modules.{i}.mlp.{j}.{conv,bn}.*   fp_modules.{i}.mlp.{j}.*
      mlp_{seg,R,t,movable}.{j}.*          {seg,R,t}_logit.*
      movable_logit.0.*  (Sequential(conv, sigmoid))
    """
    sd = _strip_module_prefix(state_dict)
    params: dict = {"backbone": {}}
    stats: dict = {"backbone": {}}

    i = 0
    while f"sa_modules.{i}.mlp.0.conv.weight" in sd:
        p = params["backbone"].setdefault(f"sa{i}", {}).setdefault("mlp", {})
        s = stats["backbone"].setdefault(f"sa{i}", {}).setdefault("mlp", {})
        _import_shared_mlp(sd, f"sa_modules.{i}.mlp", p, s)
        i += 1
    i = 0
    while f"fp_modules.{i}.mlp.0.conv.weight" in sd:
        p = params["backbone"].setdefault(f"fp{i}", {}).setdefault("mlp", {})
        s = stats["backbone"].setdefault(f"fp{i}", {}).setdefault("mlp", {})
        _import_shared_mlp(sd, f"fp_modules.{i}.mlp", p, s)
        i += 1

    head_map = {"mlp_seg": "head_seg", "mlp_R": "head_R", "mlp_t": "head_t",
                "mlp_movable": "head_movable"}
    logit_map = {"seg_logit": "head_seg", "R_logit": "head_R",
                 "t_logit": "head_t", "movable_logit.0": "head_movable",
                 "movable_logit": None}
    for torch_name, ours in head_map.items():
        if f"{torch_name}.0.conv.weight" in sd:
            p = params.setdefault(ours, {}).setdefault("mlp", {})
            s = stats.setdefault(ours, {}).setdefault("mlp", {})
            _import_shared_mlp(sd, torch_name, p, s)
    for torch_name, ours in logit_map.items():
        if ours and f"{torch_name}.weight" in sd:
            _import_logit(sd, torch_name,
                          params.setdefault(ours, {}).setdefault("logit", {}))

    as_jnp = lambda t: jax.tree.map(
        lambda x: np.asarray(x, dtype=np.float32), t)
    return {"params": as_jnp(params), "batch_stats": as_jnp(stats)}


def import_torch_checkpoint(path: str) -> dict:
    """Load a reference .pth checkpoint (CPU) and convert the model weights."""
    import torch  # local import: torch is only needed for legacy import
    checkpoint = torch.load(path, map_location="cpu", weights_only=False)
    model_sd = checkpoint.get("model", checkpoint)
    return import_pn2_torch_state_dict(model_sd)
