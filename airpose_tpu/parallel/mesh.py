"""Device mesh + sharding rules.

The reference has no real multi-device strategy (single GPU; SURVEY.md §2.8).
Here scaling is data-parallel pjit over a 1-D ``("data",)`` mesh: the batch
axis is sharded, parameters are replicated, and XLA inserts the gradient
psum over ICI. BatchNorm statistics are computed with global-mean semantics
automatically under GSPMD (jnp.mean over a sharded axis lowers to a
cross-replica reduction), which the reference never had.

The model's view axis is NOT a mesh axis — both views of a sample live on
the same chip so the cross-view exchange stays collective-free (SURVEY.md
§2.8 "sequence parallel" row).
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim, replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a pytree of host arrays batch-sharded on the mesh."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
