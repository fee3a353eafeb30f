"""Device mesh / distributed setup.

The reference is single-node multi-GPU with PCIe copies and OpenMP workers
(SURVEY.md §2e P3/P4/P9); spfx's scaling axis is a JAX device mesh: shardings
are annotated with PartitionSpecs and XLA inserts the ICI/DCN collectives
(all_gather for replicating read-side factor tables, psum for Gramians,
all_to_all style exchanges materialize inside the compiled step).

Multi-host: call ``init_distributed()`` once per process (jax.distributed),
then ``make_mesh()`` builds a global mesh over all addressable+remote devices.
Tests exercise the same code on a virtual 8-device CPU mesh.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize jax.distributed from args or env (no-op single-process)."""
    if num_processes is None:
        num_processes = int(os.environ.get("SPFX_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator
        or os.environ.get("SPFX_COORDINATOR", "localhost:9781"),
        num_processes=num_processes,
        process_id=process_id
        if process_id is not None
        else int(os.environ.get("SPFX_PROCESS_ID", "0")),
    )


def make_mesh(axis: str = "data", devices=None) -> Mesh:
    """1-D mesh over all devices (row-sharding axis for embedding tables)."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_rows(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
