"""Device mesh + sharding rules.

The reference has no real multi-device strategy (single GPU; SURVEY.md §2.8).
Here scaling is data-parallel pjit over a 1-D ``("data",)`` mesh: the batch
axis is sharded, parameters are replicated, and XLA inserts the gradient
psum over ICI. BatchNorm statistics are computed with global-mean semantics
automatically under GSPMD (jnp.mean over a sharded axis lowers to a
cross-replica reduction), which the reference never had.

An optional 2-D ``("data", "model")`` mesh adds tensor parallelism for the
wide parameters (the IEF fc1/fc2 kernels and the deep conv stacks'
output-channel dims — SURVEY.md §2.8 "optionally shard the 2048×1024 fc"):
weights are sharded on "model", GSPMD propagates the activation shardings
and inserts the all-gathers/reduce-scatters over ICI. ResNet-50 fits one
chip comfortably, so TP here is a scale-out option (bigger trunks, larger
per-chip batches), not a necessity — exactly the posture the survey
prescribes.

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


def make_mesh_2d(n_data: int, n_model: int) -> Mesh:
    """2-D ("data", "model") mesh: dp × tp."""
    devices = jax.devices()[: n_data * n_model]
    return Mesh(np.asarray(devices).reshape(n_data, n_model),
                ("data", "model"))


def param_spec(a, n_model: int, min_dim: int = 512) -> P:
    """Tensor-parallel partition rule for one parameter-shaped leaf:
    shard the output dim of wide Dense kernels ((in, out) with out ≥
    min_dim) and of wide conv kernels ((kh, kw, cin, cout)) over "model";
    replicate everything else (biases, BN, small heads). Applied uniformly
    to params AND the optimizer moments (same shapes → consistent)."""
    shape = np.shape(a)
    if len(shape) == 2 and shape[1] >= min_dim and shape[1] % n_model == 0:
        return P(None, "model")
    if len(shape) == 4 and shape[3] >= min_dim and shape[3] % n_model == 0:
        return P(None, None, None, "model")
    return P()


def shard_params_tp(tree, mesh: Mesh, min_dim: int = 512):
    """Place a parameter-shaped pytree (params / batch_stats / optimizer
    moments) on a 2-D mesh with the TP rule."""
    n_model = mesh.shape["model"]

    def put(a):
        return jax.device_put(
            a, NamedSharding(mesh, param_spec(a, n_model, min_dim))
        )

    return jax.tree.map(put, tree)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim, replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a pytree of host arrays batch-sharded on the mesh. Leaves
    whose leading dim does not divide the mesh size are REPLICATED instead
    of erroring — per-view constants like ``focal`` (leading dim = views)
    and undersized validation tail batches stay correct (every device sees
    the whole array; GSPMD resharding inside jit is unaffected)."""
    n = mesh.shape[axis]
    sharded = batch_sharding(mesh, axis)
    full = replicate(mesh)

    def put(x):
        ok = np.ndim(x) >= 1 and np.shape(x)[0] % n == 0
        return jax.device_put(x, sharded if ok else full)

    return jax.tree.map(put, batch)
