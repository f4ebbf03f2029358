"""Test configuration: run everything on a virtual 8-device CPU mesh so the
suite needs no TPU and the pjit sharding tests exercise real partitioning.

The hosting image pre-registers a TPU PJRT plugin via sitecustomize and
initializes jax before pytest starts, so plain env vars are too late; we
switch the platform and drop the materialized backends instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if jax.default_backend() != "cpu":  # pragma: no cover - depends on host image
    jax.config.update("jax_platforms", "cpu")
    from jax.extend import backend as _jexb
    _jexb.clear_backends()

assert jax.default_backend() == "cpu", jax.default_backend()
