"""Parameter freezing by regex patterns — the functional-JAX analogue of the
reference's Freezer (reference: nn_utils/freezer.py:15-113).

In torch, freezing flips requires_grad on parameters; with optax the same
effect is a masked optimizer: parameters whose path matches a pattern get
zero updates.  BN "freezing" (use running stats) is a call-site choice here
(train=False on the module), so freeze_bn reduces to masking the bn params.
"""

from __future__ import annotations

import re
from typing import Sequence

import jax
import optax


def param_path_matches(path: str, patterns: Sequence[str]) -> bool:
    return any(re.search(p, path) for p in patterns)


def make_freeze_mask(params, patterns: Sequence[str]):
    """Pytree of bools: True = trainable, False = frozen (path matched)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        return ".".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in kp)

    paths = {path_str(kp): not param_path_matches(path_str(kp), patterns)
             for kp, _ in flat}

    def label(kp, _):
        return paths[path_str(kp)]

    return jax.tree_util.tree_map_with_path(label, params)


def freeze_by_patterns(optimizer: optax.GradientTransformation, params,
                       patterns: Sequence[str]) -> optax.GradientTransformation:
    """Wrap an optimizer so params matching any pattern receive no updates.

    Example patterns (reference freezer.py:4-6):
        ['backbone']                  - freeze the whole backbone
        ['^((?!head_seg).)*$']        - freeze everything except head_seg
        ['bn']                        - freeze all BatchNorm scales/biases
    """
    mask = make_freeze_mask(params, patterns)
    return optax.multi_transform(
        {True: optimizer, False: optax.set_to_zero()}, mask)


def frozen_param_names(params, patterns: Sequence[str]) -> list:
    """Names of parameters that would be frozen (for logging, mirrors the
    reference's verbose mode, freezer.py:20-29)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        return ".".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in kp)

    return [path_str(kp) for kp, _ in flat
            if param_path_matches(path_str(kp), patterns)]
