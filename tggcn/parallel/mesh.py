"""Device mesh + sharding for data-parallel training.

The reference is single-process/single-device (SURVEY.md §2.7); here the
batch axis shards across a 1-D ``data`` mesh (ICI on a TPU pod slice) via
NamedSharding, parameters are replicated, and XLA inserts the psum for the
gradient all-reduce — no user-level collectives.

The mesh generalises to ('data', 'model') for future tensor-parallel axes;
this workload (few-M-param GRU/GCN models) only needs data parallelism, which
SURVEY.md §2.7 records as the design decision.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "data",
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a 1-D mesh over the first num_devices devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        if len(devices) < num_devices:
            raise ValueError(f"Requested {num_devices} devices, have {len(devices)}")
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(arrays, mesh: Mesh, axis_name: str = "data"):
    """Place a pytree of batch-leading arrays with the batch axis sharded."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), arrays)


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, replicated_sharding(mesh)), tree)
