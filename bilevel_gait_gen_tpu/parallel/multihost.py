"""Multi-host initialization + sharded scenario sweeps (jax.distributed).

SURVEY §5 mapping: the reference has no distributed backend (robot I/O
only); the TPU-native scale-out is scenario-batched MPC over a multi-host
pod slice — DCN-capable data parallelism over `scenario`, ICI for any
within-host axes.  This module wraps the jax.distributed bootstrap and
global-mesh construction so the same batched solve functions run unchanged
from 1 chip to a pod slice.

Smoke-testable without TPUs: scripts/multihost_demo.py spawns N local CPU
processes with a coordinator and runs a cross-process psum + a sharded
batched MPC step.
"""
from __future__ import annotations

import os
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None):
    """Bootstrap jax.distributed from args or the standard env vars
    (JAX_COORDINATOR, JAX_NUM_PROCESSES, JAX_PROCESS_ID)."""
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR")
    if coordinator is None:
        return False  # single-process
    # `is None` (not falsy-or): an explicit process_id=0 must not be
    # silently overridden by the environment
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    num_processes = int(num_processes)
    process_id = int(process_id)
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def global_mesh(axis_name: str = "scenario") -> Mesh:
    """1-D mesh over ALL devices across all processes."""
    return Mesh(np.array(jax.devices()), (axis_name,))


def host_local_batch_to_global(tree, mesh: Mesh, axis: str = "scenario"):
    """Assemble per-host batches into a global sharded array
    (jax.make_array_from_process_local_data)."""
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree.map(put, tree)
