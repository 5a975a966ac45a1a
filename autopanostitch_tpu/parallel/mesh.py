"""Device mesh helpers.

The reference's parallel runtime is a parfor worker pool (`main.m:39-47`);
the TPU-native equivalent is a 1-D device mesh with images / feature blocks
/ canvas tiles sharded over the `data` axis and XLA collectives over ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_leading(x, mesh: Mesh, axis: str = "data"):
    """Place an array with its leading dim sharded over the mesh axis."""
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))
