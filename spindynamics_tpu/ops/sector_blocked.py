"""Compact-sector blocked matvec: full sector-memory efficiency, TPU-fast ops.

The embedded layout pays a ~sqrt(L) memory overcommit for gather-free kernels;
this layout keeps EXACTLY C(L, nup) amplitudes and still avoids per-element
gathers — the classic "sublattice coding" (Lin tables) of large-scale ED,
recast for the MXU:

  Split the chain into lo bits [0, Ll) and hi bits [Ll, L). Order the sector
  basis by (k_hi, rank_hi, rank_lo): the state vector becomes a concatenation
  over k_hi of rectangular matrices  M_k [C(Lh, k_hi) x C(Ll, nup - k_hi)].

  - lo bonds (both bits < Ll): fold ALL of them into the off-diagonal lo-sector
    Hamiltonian  Wlo_{k} [C_lo x C_lo]  -> ONE MXU matmul  M_k @ Wlo_k^T
    per group (mask is intrinsic to the sector operator).
  - hi bonds (both bits >= Ll): row permutation within the group — a gather of
    CONTIGUOUS rows (C_lo * 4 bytes each) by a small precomputed index table,
    masked rows dropped.
  - the single cut bond (Ll-1, Ll): maps group k -> k +- 1; the row map is a
    (masked) row gather, the column map a rectangular one-hot matmul. The
    bits-differ condition is enforced by the popcount bookkeeping itself.

Memory: state C(L, nup) + index tables sum_k C_hi(k) * n_hi_bonds (tiny).
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .. import basis as basis_mod
from ..model import SpinModel

__all__ = ["SectorBlockedLayout", "make_sector_blocked_layout",
           "apply_H_sector_blocked", "sector_blocked_tables",
           "blocked_order_states", "blocked_rank"]


class SectorBlockedLayout:
    """Static structure for the (k_hi, rank_hi, rank_lo) layout of one model."""

    def __init__(self, L, nup, Ll, groups, offsets, Wlo, hi_tables, cut):
        self.L = L
        self.nup = nup
        self.Ll = Ll
        self.Lh = L - Ll
        # groups: list of (k_hi, C_hi, C_lo)
        self.groups = groups
        self.offsets = offsets  # dict k_hi -> start index
        self.Wlo = Wlo  # dict k_hi -> np [C_lo, C_lo] weighted off-diag lo H (or None)
        # hi_tables: dict k_hi -> list of (J, rows_src np[C_hi] int32 with -1 masks)
        self.hi_tables = hi_tables
        # cut: dict k_hi -> (J, row_src np[C_hi] (-1 masked), colmap np[C_lo_src] int32
        #      mapping src col -> dst col (-1 masked), src_k) for contributions INTO k
        self.cut = cut

    @property
    def n_states(self):
        return sum(ch * cl for (_, ch, cl) in self.groups)


def _sector_states(L, k):
    return basis_mod.build_sector_basis(L, k) if L > 0 else np.zeros(1, np.uint32)


def blocked_order_states(L: int, nup: int, Ll: int) -> np.ndarray:
    """uint32 states in (k_hi, rank_hi, rank_lo) order."""
    Lh = L - Ll
    out = []
    for k_hi in range(max(0, nup - Ll), min(Lh, nup) + 1):
        k_lo = nup - k_hi
        his = _sector_states(Lh, k_hi).astype(np.uint64)
        los = _sector_states(Ll, k_lo).astype(np.uint64)
        blk = (his[:, None] << np.uint64(Ll)) | los[None, :]
        out.append(blk.reshape(-1))
    return np.concatenate(out).astype(np.uint32)


def blocked_rank(state: int, L: int, nup: int, Ll: int) -> int:
    """Host rank of a state in the blocked order."""
    Lh = L - Ll
    lo = state & ((1 << Ll) - 1)
    hi = state >> Ll
    k_hi = bin(hi).count("1")
    k_lo = nup - k_hi
    off = 0
    for k in range(max(0, nup - Ll), k_hi):
        off += math.comb(Lh, k) * math.comb(Ll, nup - k)
    C_lo = math.comb(Ll, k_lo)
    return (off + basis_mod.rank_state(hi, Lh, k_hi) * C_lo
            + basis_mod.rank_state(lo, Ll, k_lo))


def _lo_offdiag_dense(Ll, k_lo, lo_bonds, dtype=np.float32):
    """Weighted off-diagonal lo-sector Hamiltonian [C_lo, C_lo] (numpy).

    W[src, dst] so that out = M @ W gives out[., dst] += J * M[., src]."""
    states = _sector_states(Ll, k_lo)
    n = states.shape[0]
    W = np.zeros((n, n), dtype=dtype)
    for (i, j, J) in lo_bonds:
        mask = np.uint32((1 << i) | (1 << j))
        differ = (((states >> np.uint32(i)) ^ (states >> np.uint32(j))) & 1).astype(bool)
        flipped = states ^ mask
        dst = np.searchsorted(states, flipped)
        src = np.arange(n)
        W[src[differ], dst[differ]] += J
    return W


def _hi_row_table(Lh, k_hi, bi, bj):
    """src row index per dst row for hi bond (bi, bj), -1 where bits equal."""
    states = _sector_states(Lh, k_hi)
    mask = np.uint32((1 << bi) | (1 << bj))
    differ = (((states >> np.uint32(bi)) ^ (states >> np.uint32(bj))) & 1).astype(bool)
    flipped = states ^ mask
    src = np.searchsorted(states, flipped).astype(np.int32)
    return np.where(differ, src, np.int32(-1))


@lru_cache(maxsize=None)
def _cached_layout(L, nup, Ll, hop_sites, hop_J_key):
    hop_J = np.asarray(hop_J_key, np.float64)
    Lh = L - Ll
    lo_bonds, hi_bonds, cut_bonds = [], [], []
    for b, (si, sj) in enumerate(hop_sites):
        i, j = min(si, sj), max(si, sj)
        J = float(hop_J[b])
        if j < Ll:
            lo_bonds.append((i, j, J))
        elif i >= Ll:
            hi_bonds.append((i - Ll, j - Ll, J))
        else:
            if not (i == Ll - 1 and j == Ll):
                raise ValueError(
                    f"bond ({si},{sj}) crosses the lo/hi cut non-adjacently; "
                    "sector_blocked currently supports nearest-neighbour cut "
                    "bonds only — choose Ll at a chain cut or use the "
                    "embedded layout"
                )
            cut_bonds.append(J)

    ks = list(range(max(0, nup - Ll), min(Lh, nup) + 1))
    groups = [(k, math.comb(Lh, k), math.comb(Ll, nup - k)) for k in ks]
    offsets, off = {}, 0
    for (k, ch, cl) in groups:
        offsets[k] = off
        off += ch * cl

    Wlo = {}
    hi_tables = {}
    for (k, ch, cl) in groups:
        k_lo = nup - k
        Wlo[k] = _lo_offdiag_dense(Ll, k_lo, lo_bonds) if lo_bonds else None
        hi_tables[k] = [
            (J, _hi_row_table(Lh, k, bi, bj)) for (bi, bj, J) in hi_bonds
        ]

    # cut bond: contribution INTO group k from group k_src = k -+ 1.
    cut = {k: [] for (k, _, _) in groups}
    if cut_bonds:
        J_cut = float(sum(cut_bonds))
        for (k_src, ch_s, cl_s) in groups:
            k_lo_s = nup - k_src
            his_src = _sector_states(Lh, k_src)
            los_src = _sector_states(Ll, k_lo_s)
            for dk in (+1, -1):
                k_dst = k_src + dk
                if k_dst not in offsets:
                    continue
                # hi bit 0 flips 0->1 (dk=+1) or 1->0 (dk=-1); lo top bit opposite
                his_dst = _sector_states(Lh, k_dst)
                los_dst = _sector_states(Ll, nup - k_dst)
                want_hi_bit = 0 if dk == +1 else 1
                valid_r = ((his_src >> np.uint32(0)) & 1) == want_hi_bit
                hi_new = his_src ^ np.uint32(1)
                row_dst = np.searchsorted(his_dst, hi_new).astype(np.int32)
                row_dst = np.where(valid_r, row_dst, np.int32(-1))
                want_lo_bit = 1 if dk == +1 else 0
                valid_c = ((los_src >> np.uint32(Ll - 1)) & 1) == want_lo_bit
                lo_new = los_src ^ np.uint32(1 << (Ll - 1))
                col_dst = np.searchsorted(los_dst, lo_new).astype(np.int32)
                col_dst = np.where(valid_c, col_dst, np.int32(-1))
                # store as: INTO k_dst from k_src, with dst-row <- src-row map
                # inverted: for each dst row, which src row feeds it
                ch_d = his_dst.shape[0]
                inv_row = np.full(ch_d, -1, np.int32)
                ok = row_dst >= 0
                inv_row[row_dst[ok]] = np.arange(ch_s, dtype=np.int32)[ok]
                cut[k_dst].append((J_cut, inv_row, col_dst, k_src))
    return SectorBlockedLayout(L, nup, Ll, groups, offsets, Wlo, hi_tables, cut)


def make_sector_blocked_layout(model_or_args, Ll: int | None = None
                               ) -> SectorBlockedLayout:
    if isinstance(model_or_args, SpinModel):
        m = model_or_args
        if m.nup is None:
            raise ValueError("sector_blocked requires a sector (nup set)")
        L, nup = m.L, m.nup
        hop_sites = m.hop_sites
        hop_J = tuple(np.asarray(m.hop_J, np.float64).tolist())
    else:
        L, nup, hop_sites, hop_J = model_or_args
        hop_J = tuple(hop_J)
    if Ll is None:
        # pick C_lo(max) in the MXU sweet spot (<= ~512)
        Ll = 8 if L >= 16 else max(2, L // 2)
        while math.comb(Ll + 1, (Ll + 1) // 2) <= 512 and Ll + 1 < L - 1:
            Ll += 1
    return _cached_layout(L, nup, Ll, tuple(hop_sites), hop_J)


def _device_tables(layout: SectorBlockedLayout):
    """One-time conversion of the layout's host tables into DEVICE arrays.

    Tables referenced during tracing as host numpy become jaxpr constants whose
    VALUES are serialized into the (remote) compile request — at L=32 that is
    ~160 MB of index tables and blows the compile service's request limit.
    Pre-placed device arrays are captured by reference instead."""
    if getattr(layout, "_dev", None) is not None:
        return layout._dev
    # May be reached inside a jit trace (apply dispatched under jit); force
    # eager array creation so cached device arrays are not trace-local tracers.
    import contextlib

    ctx = jax.ensure_compile_time_eval()
    with ctx:
        return _device_tables_eager(layout)


def _device_tables_eager(layout: SectorBlockedLayout):
    dev = sector_blocked_tables(layout)
    layout._dev = jax.tree_util.tree_map(jnp.asarray, dev)
    return layout._dev


def sector_blocked_tables(layout: SectorBlockedLayout):
    """Arrays-only pytree of the layout's tables (host numpy).

    Pass `jax.tree_util.tree_map(jnp.asarray, tables)` as an EXPLICIT argument
    of your jitted function for very large L: on this environment's remote
    compiler even captured device constants are serialized into the compile
    request, and at L=32 the ~200 MB of index tables exceed its size limit —
    real arguments never ship with the program."""
    dev = {"Wlo": {}, "hi": {}, "cut": {}}
    for (k, ch, cl) in layout.groups:
        if layout.Wlo[k] is not None:
            dev["Wlo"][k] = layout.Wlo[k]
        if layout.hi_tables[k]:
            # stacked per-bond tables: the apply runs a fori_loop over bonds so
            # only ONE gathered temp is live at a time (unrolled per-bond
            # gathers kept ~n_bonds group-sized temps alive -> OOM at L=32)
            idx_stack = np.stack([
                np.where(rows_src >= 0, rows_src, 0).astype(np.int32)
                for (_, rows_src) in layout.hi_tables[k]
            ])
            valid_stack = np.stack([
                (rows_src >= 0).astype(np.float32)
                for (_, rows_src) in layout.hi_tables[k]
            ])
            J_vec = np.asarray([J for (J, _) in layout.hi_tables[k]], np.float32)
            dev["hi"][k] = (idx_stack, valid_stack, J_vec)
        else:
            dev["hi"][k] = None
        cut = []
        for (J, inv_row, col_dst, k_src) in layout.cut[k]:
            cl_src = col_dst.shape[0]
            C = np.zeros((cl_src, cl), np.float32)
            ok = col_dst >= 0
            C[np.arange(cl_src)[ok], col_dst[ok]] = 1.0
            cut.append((
                np.where(inv_row >= 0, inv_row, 0).astype(np.int32),
                (inv_row >= 0).astype(np.float32),
                C,
            ))
        dev["cut"][k] = cut
    return dev


def apply_H_sector_blocked(psi: jax.Array, diag: jax.Array,
                           layout: SectorBlockedLayout,
                           tables=None) -> jax.Array:
    """H|psi> in the blocked sector order. `diag` must be in the SAME order.

    `tables` (from sector_blocked_tables, device-converted) may be threaded as
    an explicit jit argument — required at very large L, see its docstring."""
    rdtype = psi.real.dtype if jnp.iscomplexobj(psi) else psi.dtype
    dev = tables if tables is not None else _device_tables(layout)
    out_parts = []
    # pre-slice groups
    slices = {}
    for (k, ch, cl) in layout.groups:
        o = layout.offsets[k]
        slices[k] = psi[o : o + ch * cl].reshape(ch, cl)

    for (k, ch, cl) in layout.groups:
        o = layout.offsets[k]
        Mk = slices[k]
        acc = (diag[o : o + ch * cl].astype(psi.dtype) * psi[o : o + ch * cl]
               ).reshape(ch, cl)
        if k in dev["Wlo"]:
            acc = acc + Mk @ jnp.asarray(dev["Wlo"][k]).astype(rdtype)
        if dev["hi"][k] is not None:
            idx_stack, valid_stack, J_vec = (
                jnp.asarray(dev["hi"][k][0]),
                jnp.asarray(dev["hi"][k][1]),
                jnp.asarray(dev["hi"][k][2]),
            )

            def hi_body(b, acc, Mk=Mk, idx_stack=idx_stack,
                        valid_stack=valid_stack, J_vec=J_vec):
                gathered = jnp.take(Mk, idx_stack[b], axis=0)
                return acc + J_vec[b].astype(rdtype) * (
                    valid_stack[b].astype(rdtype)[:, None] * gathered
                )

            acc = jax.lax.fori_loop(0, idx_stack.shape[0], hi_body, acc)
        for (J, _ir, _cd, k_src), (idx, rvalid, C) in zip(
            layout.cut[k], dev["cut"][k]
        ):
            Msrc = slices[k_src]
            rows = jnp.take(Msrc, jnp.asarray(idx), axis=0)  # [ch_dst, cl_src]
            rows = jnp.asarray(rvalid).astype(rdtype)[:, None] * rows
            acc = acc + jnp.asarray(J, rdtype) * (rows @ jnp.asarray(C).astype(rdtype))
        out_parts.append(acc.reshape(-1))
    return jnp.concatenate(out_parts)
