"""Device mesh + sharding for data-parallel training.

The reference is single-process/single-device (SURVEY.md §2.7); here the
batch axis shards across a ``data`` mesh axis (ICI on a TPU pod slice) via
NamedSharding, parameters are replicated, and XLA inserts the psum for the
gradient all-reduce — no user-level collectives.

For multi-slice deployments, make_mesh_2d builds a ('dcn', 'data') mesh: the
outer axis maps across slices (DCN links), the inner within a slice (ICI).
The batch axis shards over BOTH axes (batch_sharding uses every mesh axis),
so the gradient all-reduce decomposes into a fast intra-slice reduce over ICI
followed by a small inter-slice reduce over DCN — the layout the scaling-book
recipe prescribes for pure data parallelism across slices.
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


def make_mesh_2d(num_slices: int, devices_per_slice: int,
                 devices: Optional[Sequence] = None) -> Mesh:
    """('dcn', 'data') mesh for multi-slice data parallelism.

    Row i of the device grid holds slice i's chips; with real multi-slice
    hardware pass `devices` ordered slice-major (jax.devices() already is).
    """
    if devices is None:
        devices = jax.devices()
    need = num_slices * devices_per_slice
    if len(devices) < need:
        raise ValueError(f"Requested {need} devices, have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(num_slices, devices_per_slice)
    return Mesh(grid, ("dcn", "data"))


def batch_sharding(mesh: Mesh, axis_name: Optional[str] = None) -> NamedSharding:
    """Shard the leading (batch) axis across every mesh axis (or one axis)."""
    axes = axis_name if axis_name is not None else tuple(mesh.axis_names)
    return NamedSharding(mesh, P(axes))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(arrays, mesh: Mesh, axis_name: Optional[str] = None):
    """Place a pytree of batch-leading arrays with the batch axis sharded."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), arrays)


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, replicated_sharding(mesh)), tree)
