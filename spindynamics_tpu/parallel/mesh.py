"""Device mesh and sharding placement for row-partitioned state vectors.

This is the TPU-native replacement for the reference's shared-memory threading
(SURVEY.md §2.3): the Hilbert-space axis ("rows") is sharded over a 1-D
jax.sharding.Mesh; matvecs, dots and observables are written once in plain JAX
and parallelize under jit via XLA SPMD — psi gathers become all-gathers over
ICI, inner products reduce with psum, with zero code changes in the solvers.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..model import SpinModel

__all__ = [
    "make_mesh",
    "row_sharding",
    "replicated_sharding",
    "shard_model",
    "shard_state",
]

ROWS = "rows"


def make_mesh(n_devices: int | None = None, axis_name: str = ROWS) -> Mesh:
    """1-D mesh over the first n_devices (default: all) local devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def row_sharding(mesh: Mesh, axis_name: str = ROWS) -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_state(psi: jax.Array, mesh: Mesh, axis_name: str = ROWS) -> jax.Array:
    """Row-partition a state vector over the mesh, zero-padding to a multiple of
    the shard count (GSPMD requires even division)."""
    import jax.numpy as jnp

    n_shards = mesh.shape[axis_name]
    N = psi.shape[0]
    Np = -(-N // n_shards) * n_shards
    if Np != N:
        psi = jnp.pad(psi, (0, Np - N))
    return jax.device_put(psi, row_sharding(mesh, axis_name))


def shard_model(model: SpinModel, mesh: Mesh, axis_name: str = ROWS) -> SpinModel:
    """Pad (if needed) and place the model: O(N) arrays (states, diag, ELL rows)
    sharded over rows, O(L)/O(bonds) arrays replicated. Pad rows are an exact
    invariant null subspace (diag=0, nbr=-1); `model.dim` keeps the logical N.

    The ELL table is the static sparsity structure, so sharding its rows
    co-locates each basis-state's bond targets with its output row; the psi
    gather is then the only cross-shard traffic (an all-gather XLA inserts)."""
    from .sharded_apply import pad_model

    model = pad_model(model, mesh.shape[axis_name])
    rows = row_sharding(mesh, axis_name)
    rep = replicated_sharding(mesh)

    def place(name, x):
        if x is None:
            return None
        if name in ("states", "diag"):
            return jax.device_put(x, rows)
        if name == "nbr":
            return jax.device_put(x, NamedSharding(mesh, P(axis_name, None)))
        return jax.device_put(x, rep)

    import dataclasses

    return dataclasses.replace(
        model,
        **{
            f: place(f, getattr(model, f))
            for f in (
                "states",
                "diag",
                "field",
                "hop_i",
                "hop_j",
                "hop_J",
                "zz_i",
                "zz_j",
                "zz_J",
                "nbr",
                "binom",
            )
        },
    )
