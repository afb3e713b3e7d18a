"""Mesh + sharding helpers for data-parallel training over ICI/DCN."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"


def create_mesh(num_devices: int | None = None, axis_name: str = DATA_AXIS, devices=None) -> Mesh:
    """1-D data-parallel mesh over the available (or given) devices.

    The GAN at this scale (generator ~15 M params + frozen WavLM ~300 M)
    fits comfortably per chip, so the scaling strategy is pure data
    parallelism with replicated parameters; the mesh API keeps an axis name
    so tensor/sequence axes can be added without changing call sites.
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard axis 0 (batch) across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_tree(tree, mesh: Mesh, spec: P):
    """Device-put a host pytree onto the mesh with the given PartitionSpec.

    Single-process: a plain sharded device_put. Multi-process (after
    :func:`initialize_multihost`): each host passes its LOCAL view — its
    slice of the global batch for a sharded spec, or identical values for a
    replicated ``P()`` — and the global array is assembled without
    cross-host data movement. One helper so the process-count branching
    lives in exactly one place.
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return jax.tree.map(
            lambda x: multihost_utils.host_local_array_to_global_array(
                np.asarray(x), mesh, spec),
            tree)
    return jax.device_put(tree, NamedSharding(mesh, spec))


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Device-put a host batch sharded over the batch axis.

    Single-process: ``batch`` is the global batch. Multi-process: ``batch``
    is THIS HOST'S slice (global_batch // process_count items).
    """
    return put_tree(batch, mesh, P(axis_name))


def replicate_tree(tree, mesh: Mesh):
    """Put a host pytree fully-replicated on the mesh (multi-process: every
    host must pass identical values — same PRNG seed or checkpoint files)."""
    return put_tree(tree, mesh, P())


def initialize_multihost(coordinator_address: str | None = None, num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Join a multi-host pod over DCN (no-op in single-process runs).

    Call before any jax device use on each host; input pipelines should then
    feed each host its 1/num_processes slice of the global batch.
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
