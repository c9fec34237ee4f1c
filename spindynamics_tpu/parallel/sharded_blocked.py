"""Explicitly-scheduled multi-chip blocked matvec: shard_map + ppermute halo.

The automatic path (jit over sharded arrays) lets XLA SPMD derive collectives
for the blocked backend's major-axis flips. This module is the hand-scheduled
equivalent for performance control, per SURVEY.md §2.3's plan:

  - psi sharded on the leading (block) axis of the [B, T, W] view over a 1-D
    mesh; since full/embedded N = 2^L and shard counts are powers of two, the
    mesh axis simply owns the TOP block bits.
  - bonds whose bits all live below the shard boundary apply locally (the
    in-shard blocked/pallas formulation, unchanged);
  - a bond with a bit ABOVE the boundary pairs shard s with shard
    s XOR (bit >> log2(B_local)): ONE jax.lax.ppermute moves the partner shard
    across ICI, followed by elementwise mask-accumulate (plus a residual local
    block flip if the bond's other bit is below the boundary).

Communication per matvec = (number of shard-crossing bonds) full-shard
ppermutes — for a nearest-neighbour chain on 2^d shards that is exactly d
bonds, each a pairwise exchange that rides a single ICI hop on a torus.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..model import SpinModel
from ..ops.blocked import (
    BlockedPlan,
    _flip_axis_bits,
    _matmul_last,
    _matmul_mid,
    _perm_matrix,
    make_blocked_plan,
)

__all__ = ["sharded_blocked_matvec_fn"]


def sharded_blocked_matvec_fn(model: SpinModel, mesh: Mesh,
                              axis_name: str = "rows",
                              plan: BlockedPlan | None = None):
    """Build a shard_map H-apply for a full/embedded model over a 1-D mesh.

    Returns a matvec on flat psi [2^L] sharded over `axis_name`. Requires the
    shard count to be a power of two (it owns the top block bits)."""
    if model.mode not in ("full", "embedded"):
        raise ValueError("sharded blocked matvec requires a full-space layout")
    if plan is None:
        plan = make_blocked_plan(model)
    L, w, t = plan.L, plan.w, plan.t
    W, T = plan.W, plan.T
    B = 1 << (L - w - t)
    n_shards = mesh.shape[axis_name]
    if n_shards & (n_shards - 1):
        raise ValueError("shard count must be a power of two")
    if B % n_shards:
        raise ValueError(f"B={B} blocks not divisible by {n_shards} shards")
    B_loc = B // n_shards
    shard_bits = (n_shards - 1).bit_length()

    # classify special bonds: local vs shard-crossing
    local_specials = []
    crossing = []  # (bond_idx, shard_xor, local_blk_xor, m_row, m_col, bi, bj)
    for (bidx, m_col, m_row, m_blk, bi, bj) in plan.special:
        shard_xor = m_blk // B_loc
        local_xor = m_blk % B_loc
        if shard_xor == 0:
            local_specials.append((bidx, m_col, m_row, m_blk, bi, bj))
        else:
            crossing.append((bidx, shard_xor, local_xor, m_row, m_col, bi, bj))

    rows = NamedSharding(mesh, P(axis_name))
    diag_sh = jax.device_put(model.diag, rows)
    hop_J_rep = jax.device_put(model.hop_J, NamedSharding(mesh, P()))

    perm_tables = [
        [(s, s ^ shard_xor) for s in range(n_shards)]
        for (_, shard_xor, *_rest) in crossing
    ]

    def _local_bit(bit, b_global_offset, rdtype):
        """0/1 broadcastable over the local [B_loc, T, W] for a global bit."""
        if bit < w:
            ar = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2) >> bit) & 1
        elif bit < w + t:
            ar = (jax.lax.broadcasted_iota(jnp.int32, (1, T, 1), 1) >> (bit - w)) & 1
        else:
            k = bit - w - t
            blk = jax.lax.broadcasted_iota(jnp.int32, (B_loc, 1, 1), 0)
            blk = blk + b_global_offset
            ar = (blk >> k) & 1
        return ar.astype(rdtype)

    def local_apply(diag_loc, hop_J, psi_loc):
        rdtype = psi_loc.dtype
        idx = jax.lax.axis_index(axis_name)
        b_off = idx * B_loc
        x3 = psi_loc.reshape(B_loc, T, W)
        out = (diag_loc * psi_loc).reshape(B_loc, T, W)

        if plan.cols_stack is not None:
            M = jnp.einsum("k,kwv->wv", hop_J[jnp.asarray(plan.cols_idx)],
                           jnp.asarray(plan.cols_stack, rdtype))
            out = out + _matmul_last(x3, M)
        if plan.rows_stack is not None:
            M = jnp.einsum("k,krs->rs", hop_J[jnp.asarray(plan.rows_idx)],
                           jnp.asarray(plan.rows_stack, rdtype))
            out = out + _matmul_mid(x3, M)

        for (bidx, m_col, m_row, m_blk, bi, bj) in local_specials:
            y = x3
            if m_blk:
                y = _flip_axis_bits(y, 0, m_blk, max((B_loc - 1).bit_length(), 1))
            if m_row:
                y = _matmul_mid(y, _perm_matrix(t, m_row, rdtype))
            if m_col:
                y = _matmul_last(y, _perm_matrix(w, m_col, rdtype))
            mask = jnp.abs(_local_bit(bi, b_off, rdtype)
                           - _local_bit(bj, b_off, rdtype))
            out = out + hop_J[bidx] * (mask * y)

        for k, (bidx, shard_xor, local_xor, m_row, m_col, bi, bj) in enumerate(
            crossing
        ):
            # halo: fetch the partner shard over ICI
            y = jax.lax.ppermute(x3, axis_name, perm_tables[k])
            if local_xor:
                y = _flip_axis_bits(y, 0, local_xor,
                                    max((B_loc - 1).bit_length(), 1))
            if m_row:
                y = _matmul_mid(y, _perm_matrix(t, m_row, rdtype))
            if m_col:
                y = _matmul_last(y, _perm_matrix(w, m_col, rdtype))
            mask = jnp.abs(_local_bit(bi, b_off, rdtype)
                           - _local_bit(bj, b_off, rdtype))
            out = out + hop_J[bidx] * (mask * y)
        return out.reshape(-1)

    mapped = jax.shard_map(
        local_apply,
        mesh=mesh,
        in_specs=(P(axis_name), P(), P(axis_name)),
        out_specs=P(axis_name),
    )

    def matvec(psi):
        return mapped(diag_sh, hop_J_rep, psi)

    return matvec
