"""Explicit shard_map matvec: row-partitioned SpMV with an all-gathered source.

The automatic SPMD path (shard arrays + jit, parallel/mesh.py) already works;
this module is the explicitly-scheduled variant for performance control: each
device holds a row block of (diag, nbr) and its psi shard, all-gathers psi over
the mesh axis (ICI), and computes its rows locally — gather-from-replica +
local ELL contraction, the communication pattern SURVEY.md §2.3 calls for
(halo-compression of the all-gather is a later optimization; at L<=32 the
full vector fits comfortably in HBM)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..model import SpinModel

__all__ = ["sharded_matvec_fn", "padded_dim", "pad_state", "unpad_state", "pad_model"]


def padded_dim(N: int, n_shards: int) -> int:
    return -(-N // n_shards) * n_shards


def pad_state(psi: jax.Array, n_shards: int) -> jax.Array:
    N = psi.shape[0]
    return jnp.pad(psi, (0, padded_dim(N, n_shards) - N))


def unpad_state(psi: jax.Array, N: int) -> jax.Array:
    return psi[:N]


def pad_model(model: SpinModel, n_shards: int) -> SpinModel:
    """Pad O(N) arrays to a multiple of the shard count. Padded rows have
    diag = 0 and nbr = -1, so they compute exact zeros and poison nothing
    (no real row ever points at a pad row: nbr targets are < N)."""
    import dataclasses

    N = model.n_states
    Np = padded_dim(N, n_shards)
    if Np == N:
        return model
    pad = Np - N
    new = {
        "diag": jnp.pad(model.diag, (0, pad)),
        "n_valid": model.dim,
        "n_states_static": Np if model.states is None else None,
    }
    if model.states is not None:
        new["states"] = jnp.pad(model.states, (0, pad))
    if model.nbr is not None:
        new["nbr"] = jnp.pad(model.nbr, ((0, pad), (0, 0)), constant_values=-1)
    return dataclasses.replace(model, **new)


def sharded_matvec_fn(model: SpinModel, mesh: Mesh, axis_name: str = "rows"):
    """Build a shard_map H-apply over `mesh` for a sector-mode model.

    Returns (matvec, padded_model). The matvec maps a row-sharded psi of the
    PADDED length to a row-sharded output; communication is one all-gather of
    psi per apply."""
    n_shards = mesh.shape[axis_name]
    pm = pad_model(model, n_shards)
    if pm.nbr is None:
        raise ValueError("sharded_matvec_fn requires an ELL neighbor table")

    rows = NamedSharding(mesh, P(axis_name))
    rows2d = NamedSharding(mesh, P(axis_name, None))
    rep = NamedSharding(mesh, P())
    diag = jax.device_put(pm.diag, rows)
    nbr = jax.device_put(pm.nbr, rows2d)
    hop_J = jax.device_put(pm.hop_J, rep)

    def local_apply(diag_blk, nbr_blk, hop_J_rep, psi_blk):
        # psi_blk: this device's rows; gather the full vector over ICI.
        psi_full = jax.lax.all_gather(psi_blk, axis_name, tiled=True)
        valid = nbr_blk >= 0
        safe = jnp.where(valid, nbr_blk, 0)
        gathered = jnp.take(psi_full, safe, axis=0)
        vals = jnp.where(valid, gathered, 0)
        out = psi_blk * diag_blk.astype(psi_blk.dtype)
        return out + vals @ hop_J_rep.astype(psi_blk.dtype)

    mapped = jax.shard_map(
        local_apply,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name, None), P(), P(axis_name)),
        out_specs=P(axis_name),
    )

    def matvec(psi):
        return mapped(diag, nbr, hop_J, psi)

    return matvec, pm
