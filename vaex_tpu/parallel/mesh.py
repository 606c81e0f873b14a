"""Mesh construction + distributed executor factory."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def data_mesh(n_devices=None, axis_name="d") -> Mesh:
    """A 1-d data mesh over the first n devices (row-shard axis)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def distributed_executor(n_devices=None):
    """An ExecutorLocal that runs every pass SPMD over a device mesh."""
    from ..execution import ExecutorLocal
    mesh = data_mesh(n_devices)
    if mesh.size == 1:
        return ExecutorLocal()
    return ExecutorLocal(mesh=mesh)


def initialize_multihost(coordinator_address=None, num_processes=None, process_id=None):
    """jax.distributed init for pod-slice execution (multi-controller)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
