"""jax.sharding Mesh helpers.

The model is small (≈10M params) and the batch large (256-512), so the
production layout is pure data parallelism over ICI: batches sharded on the
"dp" axis, parameters replicated; XLA inserts the gradient psum. A second
"mp" axis is supported for tensor-parallel experiments (attention-head
sharding) and for the multi-chip dry-run.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = -1, axis_names: Sequence[str] = ("dp",),
              mesh_shape: Optional[Sequence[int]] = None) -> Mesh:
    devices = jax.devices()
    if num_devices > 0:
        devices = devices[:num_devices]
    if mesh_shape is None:
        mesh_shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.array(devices).reshape(mesh_shape)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch) dim over the data-parallel axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "dp"):
    """Device-put a pytree of host arrays with the batch dim sharded."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree.map(lambda a: jax.device_put(a, sharding), batch)
