"""Device-mesh sharding for data-parallel training and batched inference.

The reference's only multi-device path is single-process nn.DataParallel
(reference: grasp_proposal_test.py:52-53, grasp_detector.py:62-63).  The
TPU-native design replaces it with a jax.sharding.Mesh over a "data" axis:
batches are sharded across devices, parameters are replicated, and XLA
inserts the gradient psum over ICI automatically when a jitted loss is
differentiated under these shardings.  Multi-host extends the same mesh via
jax.distributed.initialize (no NCCL/MPI equivalents needed).

S4G has no tensor/pipeline/sequence parallel structure to exploit (the model
is ~12M params; the point dimension could in principle be sharded with halo
exchanges for the neighbour ops, but a single 25,600-point scene fits one
chip with huge headroom — batch parallelism is the right axis).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated across the mesh (parameters, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = DATA_AXIS):
    """Place a pytree of host arrays with the batch axis sharded over the
    mesh.  Leading dims must divide the mesh size."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
