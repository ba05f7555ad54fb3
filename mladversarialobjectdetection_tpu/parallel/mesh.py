"""Device mesh + sharding utilities (the distributed layer).

The reference's distributed machinery is tf.distribute strategies
(TPUStrategy / MirroredStrategy, tf2/train.py:174-200) and
cross_replica_sum sync-BN (automl utils.py:166-241). The TPU-native
equivalent is a single `jax.sharding.Mesh` over the chips with batch-dim
data parallelism: parameters and attack state are replicated, batches are
sharded on the 'data' axis, and XLA inserts psum collectives for gradient
reduction over ICI. Sync-BN maps to BatchNorm(axis_name='data') when
detector training is enabled (frozen BN needs no collective — parity with
is_training_bn=False at infer_lib.py:171).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the first n) local devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_for_batch(batch_size: int, axis_name: str = DATA_AXIS) -> Mesh:
    """Largest data-parallel mesh whose size divides the global batch."""
    devices = jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return Mesh(np.asarray(devices[:n]), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard dim 0 (batch) over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = DATA_AXIS):
    """Device_put a host batch with the leading dim sharded over the mesh."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / attack state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
