"""Mesh construction and sharding helpers."""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first n (or all) local devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device-put a pytree of host arrays with the batch dim sharded."""
    s = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def shard_stacked_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device-put (S, B, ...) arrays with dim 1 (the batch) sharded.

    Transfer layout for multi-step dispatch (`make_gfs_multi_train_step`):
    dim 0 is the scan/steps axis and must stay whole on every device.
    """
    s = NamedSharding(mesh, P(None, axis))
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(tree, mesh: Mesh):
    """Device-put a pytree fully replicated over the mesh."""
    s = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
