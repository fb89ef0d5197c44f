"""Multi-process (multi-host) data parallelism.

SURVEY.md §5.8 names the TPU-native equivalent of a comm backend: one JAX
process per host, ``jax.distributed.initialize`` to form the global runtime,
a device mesh spanning every host's chips, and per-host input feeding. The
reference is single-process (it has no comm backend at all); this module is
the blueprint's own obligation.

Design: every process runs the SAME deterministic input pipeline (the batch
iterators are pure functions of (seed, epoch)), so each process can
materialise the full global batch on host and contribute exactly its
processes' rows via ``jax.make_array_from_process_local_data``. Parameters
and optimizer state are replicated; the jitted train step's gradient psum
rides ICI within a host's chips and DCN across hosts (mesh layout:
tggcn/parallel/mesh.py). Checkpoint and scalar-log writes are gated to
process 0 (every process holds the replicated state, so process 0's write
is the global state).

Launch contract (one of):
  * explicit kwargs via ``maybe_initialize(coordinator_address=...,
    num_processes=..., process_id=...)`` (e.g. from resources config);
  * env vars TGGCN_COORDINATOR, TGGCN_NUM_PROCESSES, TGGCN_PROCESS_ID
    (set by the per-host launcher);
  * a TPU pod environment, where ``jax.distributed.initialize()`` resolves
    everything from the TPU metadata (pass ``auto=True``).

Verified end-to-end by tests/test_distributed.py: 2 local CPU processes x 4
virtual devices each train lockstep and reproduce the single-process
8-device loss trajectory exactly.
"""

import os
from typing import Optional

import jax
import numpy as np

_INITIALIZED = False


def maybe_initialize(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids=None, auto: bool = False) -> bool:
    """Join the multi-process runtime if a launch contract is present.

    Returns True when ``jax.distributed.initialize`` was called (now or
    earlier this process), False for plain single-process runs. Safe to call
    unconditionally from train.py: with no kwargs, no env vars and
    ``auto=False`` it is a no-op.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    coordinator_address = coordinator_address or os.environ.get("TGGCN_COORDINATOR")
    if num_processes is None and os.environ.get("TGGCN_NUM_PROCESSES"):
        num_processes = int(os.environ["TGGCN_NUM_PROCESSES"])
    if process_id is None and os.environ.get("TGGCN_PROCESS_ID"):
        process_id = int(os.environ["TGGCN_PROCESS_ID"])
    if coordinator_address is None and not auto:
        return False
    if coordinator_address is not None and not auto and \
            (num_processes is None or process_id is None):
        # Outside a real TPU-pod environment jax.distributed.initialize
        # cannot auto-detect these; it would block on the handshake and fail
        # obscurely at the timeout instead of reporting the launch gap.
        raise ValueError(
            "incomplete distributed launch contract: coordinator_address is "
            f"set but num_processes={num_processes!r}, "
            f"process_id={process_id!r}. Provide both (via "
            "resources.distributed.* or TGGCN_NUM_PROCESSES / "
            "TGGCN_PROCESS_ID), or use auto=True on a TPU pod.")
    # Coordinator handshake timeout: the jax default (300 s) can trip on a
    # loaded single-core host where two workers' jax imports serialize.
    init_timeout = int(os.environ.get("TGGCN_DIST_INIT_TIMEOUT", "600"))
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids,
                               initialization_timeout=init_timeout)
    _INITIALIZED = True
    return True


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    """True on the process that owns checkpoint/log writes."""
    return jax.process_index() == 0


def is_multiprocess(mesh) -> bool:
    """True when the mesh spans devices this process cannot address."""
    return mesh is not None and any(
        d.process_index != jax.process_index() for d in mesh.devices.flat)


def assert_same_across_processes(value: int, what: str):
    """Raise when an integer differs across processes (e.g. the epoch each
    process restored from last.ckpt — a host that misses the snapshot would
    silently restart from scratch and diverge)."""
    from jax.experimental import multihost_utils

    seen = multihost_utils.process_allgather(np.asarray(value, np.int32))
    if int(seen.min()) != int(seen.max()):
        raise RuntimeError(
            f"{what} differs across processes ({seen.tolist()}): every host "
            "must see the same state (is the run dir on shared storage?).")


def make_global_batch(arrays, mesh, sharding=None):
    """Assemble globally-sharded batch arrays from host-replicated numpy.

    Every process passes the FULL global batch (the deterministic pipeline
    reproduces it on each host); each device's shard is sliced out by the
    SHARDING's own index map (``jax.make_array_from_callback``), so any
    device order — process-major ``jax.devices()`` meshes and ICI-topology-
    permuted ``mesh_utils.create_device_mesh`` layouts alike — feeds every
    row exactly once, with no process-contiguity assumption.
    """
    if sharding is None:
        from tggcn.parallel.mesh import batch_sharding

        sharding = batch_sharding(mesh)
    pcount = jax.process_count()

    def put(arr):
        arr = np.asarray(arr)
        rows = arr.shape[0]
        if rows % pcount:
            raise ValueError(
                f"global batch of {rows} rows does not split over "
                f"{pcount} processes")
        return jax.make_array_from_callback(arr.shape, sharding,
                                            lambda idx: arr[idx])

    return jax.tree_util.tree_map(put, arrays)


def replicate_global(tree, mesh):
    """Replicate host values onto every device of a multi-process mesh."""
    from tggcn.parallel.mesh import replicated_sharding

    sharding = replicated_sharding(mesh)

    def put(arr):
        arr = np.asarray(arr)
        return jax.make_array_from_process_local_data(sharding, arr,
                                                      global_shape=arr.shape)

    return jax.tree_util.tree_map(put, tree)
