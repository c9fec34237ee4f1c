"""Explicit shard_map matvec: row-partitioned ELL SpMV over a device mesh.

Two communication schedules (SURVEY.md §2.3 — the scatter in the reference's
threaded apply_H!, /root/reference/src/Hamiltonian.jl:167,171, becomes static
device-edge exchange):

- `sharded_matvec_fn`: all-gather the source vector over the mesh axis, then
  local ELL rows. Simple; per-device memory O(N) — fine while the full vector
  fits in HBM.
- `sharded_matvec_halo_fn`: MEMORY-SCALING static halo exchange. The ELL
  neighbor table is static (combinadic basis), so the exact set of remote
  rows each device needs — and therefore every (src -> dst) send list — is
  known at build time. Each apply runs D-1 ppermute rounds shipping only
  those rows; the neighbor table is remapped host-side into the
  [local block ‖ halo slabs ‖ zero-sentinel] extended vector. Per-device
  memory = B + (D-1)*Hp with Hp the max pair-halo (measured ~2.5*B total at
  D=8 for the NN chain vs the all-gather's (D-1)*B = 7*B, and the gap widens
  with D: halo volume per device is set by bond locality in rank space, not
  by the mesh size)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..model import SpinModel

__all__ = ["sharded_matvec_fn", "sharded_matvec_halo_fn", "padded_dim",
           "pad_state", "unpad_state", "pad_model", "build_halo_plan"]


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


def build_halo_plan(nbr_np: np.ndarray, Np: int, D: int):
    """Static halo plan for a row-partitioned ELL table.

    Returns (send_idx [D, D-1, Hp] int32, nbr_ext [Np, n_bonds] int32, Hp):
    send_idx[s, k-1] lists the LOCAL rows device s ships to (s+k)%D each
    apply (0-padded; padding is sent but never referenced); nbr_ext remaps
    every neighbor of device d's rows into d's extended vector
    [psi_blk (B) ‖ halo slab k=1..D-1 (Hp each) ‖ one zero sentinel]."""
    B = Np // D
    n_bonds = nbr_np.shape[1]
    need = [[None] * D for _ in range(D)]  # need[d][k]: rows from s=(d-k)%D
    for d in range(D):
        blk = nbr_np[d * B:(d + 1) * B]
        valid = blk >= 0
        owner = np.where(valid, blk // B, -1)
        for k in range(1, D):
            s = (d - k) % D
            need[d][k] = np.unique(blk[valid & (owner == s)])
    Hp = max([len(need[d][k]) for d in range(D) for k in range(1, D)]
             + [1])
    Hp = -(-Hp // 8) * 8  # sublane-align the halo slabs
    send_idx = np.zeros((D, max(D - 1, 1), Hp), np.int32)
    nbr_ext = np.zeros((Np, n_bonds), np.int32)
    sentinel = B + (D - 1) * Hp
    for d in range(D):
        blk = nbr_np[d * B:(d + 1) * B]
        valid = blk >= 0
        out = np.full(blk.shape, sentinel, np.int32)
        local = valid & (blk // B == d)
        out[local] = blk[local] - d * B
        for k in range(1, D):
            s = (d - k) % D
            rows = need[d][k]
            send_idx[s, k - 1, :len(rows)] = rows - s * B
            if len(rows) == 0:
                continue
            m = valid & (blk // B == s)
            out[m] = B + (k - 1) * Hp + np.searchsorted(rows, blk[m])
        nbr_ext[d * B:(d + 1) * B] = out
    return send_idx, nbr_ext, Hp


def sharded_matvec_halo_fn(model: SpinModel, mesh: Mesh,
                           axis_name: str = "rows"):
    """Memory-scaling shard_map H-apply: static per-pair halo exchange
    (D-1 ppermute rounds) instead of a full all-gather — per-device memory
    ~N/D + halo. Same signature/contract as `sharded_matvec_fn`."""
    D = mesh.shape[axis_name]
    pm = pad_model(model, D)
    if pm.nbr is None:
        raise ValueError("sharded_matvec_halo_fn requires an ELL neighbor table")
    Np = pm.n_states
    send_np, nbr_ext_np, Hp = build_halo_plan(np.asarray(pm.nbr), Np, D)

    rows = NamedSharding(mesh, P(axis_name))
    rows2d = NamedSharding(mesh, P(axis_name, None))
    rep = NamedSharding(mesh, P())
    diag = jax.device_put(pm.diag, rows)
    nbr_ext = jax.device_put(jnp.asarray(nbr_ext_np), rows2d)
    send_idx = jax.device_put(jnp.asarray(send_np),
                              NamedSharding(mesh, P(axis_name, None, None)))
    hop_J = jax.device_put(pm.hop_J, rep)

    def local_apply(diag_blk, nbrx_blk, hop_J_rep, psi_blk, send_blk):
        halos = []
        for k in range(1, D):  # static round count: compiled send/recv edges
            vals = jnp.take(psi_blk, send_blk[0, k - 1], axis=0)
            perm = [(s, (s + k) % D) for s in range(D)]
            halos.append(jax.lax.ppermute(vals, axis_name, perm))
        psi_ext = jnp.concatenate(
            [psi_blk, *halos, jnp.zeros((1,), psi_blk.dtype)])
        gathered = jnp.take(psi_ext, nbrx_blk, axis=0)
        out = psi_blk * diag_blk.astype(psi_blk.dtype)
        return out + gathered @ hop_J_rep.astype(psi_blk.dtype)

    mapped = jax.shard_map(
        local_apply,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name, None), P(), P(axis_name),
                  P(axis_name, None, None)),
        out_specs=P(axis_name),
    )

    def matvec(psi):
        return mapped(diag, nbr_ext, hop_J, psi, send_idx)

    return matvec, pm
