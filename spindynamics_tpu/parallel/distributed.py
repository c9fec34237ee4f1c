"""Multi-host runtime glue: jax.distributed init + topology-aware meshes.

The reference is a single Julia process (SURVEY.md §5: 'Distributed
communication backend: none'); scaling past one host here means N processes,
each owning its local TPU chips, coordinated by jax.distributed. This module
is the thin, virtual-mesh-testable layer:

- `initialize_distributed()` wraps jax.distributed.initialize with env-var
  autodetection (no-op when single-process or already initialized, so library
  code can call it unconditionally).
- `mesh_from_topology()` builds the 1-D row mesh with devices ordered
  host-major (all chips of process 0 first, then process 1, ...). Row-sharded
  states then place NEIGHBORING shards on the SAME host: the kron layout's
  hi-axis collectives (psum_scatter / boundary slab ppermutes,
  parallel/sharded_kron_scaling.py) ride ICI within a host and only the
  group-boundary traffic crosses DCN.
- `local_shard_info(mesh)` reports which rows this process owns — the unit of
  per-host checkpoint IO (utils/checkpoint saves sharded arrays via orbax,
  which writes each shard from its owning host).

Real pods are unavailable in this environment; everything here is exercised
on the 8-virtual-device CPU mesh (tests/test_distributed.py), and
initialize_distributed is a documented no-op there.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import ROWS

__all__ = [
    "initialize_distributed",
    "mesh_from_topology",
    "local_shard_info",
    "is_multiprocess",
]

_initialized = False


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None,
                           local_device_ids=None) -> bool:
    """Initialize jax.distributed when running multi-process; no-op otherwise.

    Autodetects from the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID — or their arguments). Returns True if
    a multi-process runtime was initialized. Safe to call repeatedly."""
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes if num_processes is not None else int(
        os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    process_id = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "-1") or -1)
    if not coordinator_address or num_processes <= 1 or process_id < 0:
        return False  # single-process: nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True
    return True


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def mesh_from_topology(n_devices: int | None = None,
                       axis_name: str = ROWS) -> Mesh:
    """1-D mesh with devices ordered host-major (process_index, then local id).

    Host-major order keeps each host's shards CONTIGUOUS in the row
    partition, so the sector_kron hi-axis block exchanges between adjacent
    shards stay on ICI; only block-boundary traffic crosses DCN."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def local_shard_info(mesh: Mesh, axis_name: str = ROWS) -> dict:
    """Which slice of the row axis this process owns (for per-host IO)."""
    devs = list(mesh.devices.reshape(-1))
    mine = [i for i, d in enumerate(devs)
            if d.process_index == jax.process_index()]
    return {
        "n_shards": len(devs),
        "local_shard_ids": mine,
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
    }
