"""Memory-scaling multi-chip sector_kron matvec: NO replicated state anywhere.

The GSPMD path (parallel/sharded_kron.py) row-shards the flat state and lets
XLA derive collectives; correct, but XLA is free to all-gather, and the ELL
shard path (parallel/sharded_apply.py) explicitly all-gathers the whole psi —
per-device O(N) transient memory, defeating the point of sharding at L >= 32
(VERDICT r1 missing-1). This module is the explicitly-scheduled variant with
per-device memory ~ N/D at every point of the apply:

  DISTRIBUTION: each kron group's hi axis (its MAJOR axis — reserved for
  sharding by the layout design, ops/sector_kron.py) is dealt in D contiguous
  blocks: device d holds rows [d*b_g, (d+1)*b_g) of every group g, with
  b_g = ceil(C_h(g)/D) (hi axis zero-padded at the END to D*b_g; pad rows are
  a null subspace like the tile pads). The sharded state is the per-device
  concatenation of its group blocks — length D * local_len, sharded P(rows).

  LOCALITY ANALYSIS (why this needs so little communication):
  - diagonal, W_lo, W_mid: act on the mid/lo axes -> shard-local.
  - lo|mid cross terms: change (k_l, k_m) but NOT k_h, so source and
    destination groups have the SAME hi axis and block size -> shard-local.
  - W_hi and mid|hi cross terms: the only hi-axis-touching work. Every such
    term computes a full-dst-hi-axis PARTIAL from local rows (a [b_g, ..] x
    [b_g, C_h'] einsum for matmul factors; a masked slab placed at an
    axis_index-dependent offset for block-shift run factors — the static
    send/recv row sets of SURVEY.md §2.3), all partials for a destination
    group are summed into ONE buffer, and a single psum_scatter per (group,
    apply) reduces+redistributes it. Communication per apply ~ the size of
    the hi-coupled groups (<= N), riding ICI; peak per-device temp = one
    group tensor (~N/30 at L=32), transient.

Reference parity: distributes apply_H! (/root/reference/src/Hamiltonian.jl:119-184)
across devices; replaces the thread loop at src/Hamiltonian.jl:132 and the
scatter at :167,171 with static-offset slab exchanges + psum_scatter.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..model import SpinModel
from ..ops.sector_kron import (
    SectorKronLayout,
    make_sector_kron_layout,
    sector_kron_tables,
)
from .mesh import ROWS

__all__ = [
    "KronShardSpec",
    "kron_shard_spec",
    "shard_kron_state",
    "unshard_kron_state",
    "sharded_kron_scaling_matvec_fn",
]


class KronShardSpec:
    """Static shapes of the block-distributed kron state for D devices."""

    def __init__(self, layout: SectorKronLayout, n_devices: int):
        self.layout = layout
        self.D = n_devices
        self.b = []           # per group: local hi-block rows
        self.ch_pad = []      # per group: padded hi axis (= D * b)
        self.local_offsets = []  # per group: offset within one device block
        off = 0
        for (_, _, _, ch, _, _, cmp, clp) in layout.groups:
            b = -(-ch // n_devices)
            self.b.append(b)
            self.ch_pad.append(b * n_devices)
            self.local_offsets.append(off)
            off += b * cmp * clp
        self.local_len = off

    @property
    def n_sharded(self) -> int:
        """Total sharded-state length (= D * local_len)."""
        return self.D * self.local_len


def kron_shard_spec(layout: SectorKronLayout, n_devices: int) -> KronShardSpec:
    return KronShardSpec(layout, n_devices)


def shard_kron_state(psi_flat: jax.Array, spec: KronShardSpec) -> jax.Array:
    """Flat kron-order state -> block-distributed order (length D*local_len).

    Per group: [ch, cmp, clp] -> pad hi to D*b -> [D, b, cmp, clp]; the D axis
    is gathered across groups into the leading device axis. Pure reshapes and
    pads — jit-safe; apply the P(rows) sharding to the result."""
    lay, D = spec.layout, spec.D
    per_dev = []
    for gi, (_, _, _, ch, _, _, cmp, clp) in enumerate(lay.groups):
        o = lay.offsets[gi]
        T = psi_flat[o: o + ch * cmp * clp].reshape(ch, cmp * clp)
        T = jnp.pad(T, ((0, spec.ch_pad[gi] - ch), (0, 0)))
        per_dev.append(T.reshape(D, spec.b[gi] * cmp * clp))
    return jnp.concatenate(per_dev, axis=1).reshape(-1)

def unshard_kron_state(psi_sh: jax.Array, spec: KronShardSpec) -> jax.Array:
    """Inverse of shard_kron_state (drops the hi padding rows)."""
    lay, D = spec.layout, spec.D
    blocks = psi_sh.reshape(D, spec.local_len)
    outs = []
    for gi, (_, _, _, ch, _, _, cmp, clp) in enumerate(lay.groups):
        lo = spec.local_offsets[gi]
        T = blocks[:, lo: lo + spec.b[gi] * cmp * clp]
        T = T.reshape(spec.ch_pad[gi], cmp * clp)[:ch]
        outs.append(T.reshape(-1))
    return jnp.concatenate(outs)


def _local_apply(blk, tabs, spec: KronShardSpec, axis_name: str, rdtype):
    """One device's share of H|psi>: blk [local_len] -> [local_len]."""
    from ..ops.sector_kron import _contract

    lay, D = spec.layout, spec.D
    d = jax.lax.axis_index(axis_name)

    def gview(gi):
        (_, _, _, ch, _, _, cmp, clp) = lay.groups[gi]
        lo = spec.local_offsets[gi]
        return blk[lo: lo + spec.b[gi] * cmp * clp].reshape(
            spec.b[gi], cmp, clp)

    G = [gview(gi) for gi in range(len(lay.groups))]

    def hi_slice(vec, gi):
        """Device-local rows of a replicated per-hi [C_h or ch_pad] vector."""
        v = jnp.pad(vec, (0, spec.ch_pad[gi] - vec.shape[0]))
        return jax.lax.dynamic_slice(v, (d * spec.b[gi],), (spec.b[gi],))

    outs = []
    for gi, (k_h, k_m, k_l, ch, cm, cl, cmp, clp) in enumerate(lay.groups):
        kp = (k_l, k_m, k_h)
        T = G[gi]
        # ---- factored diagonal (local; hi vector sliced per device) --------
        dloc = None
        for p in range(3):
            v = tabs["dvec"][p].get(kp[p])
            if v is None:
                continue
            v = jnp.asarray(v).astype(rdtype)
            t = (hi_slice(v, gi)[:, None, None] if p == 2
                 else (v[None, :, None] if p == 1 else v[None, None, :]))
            dloc = t if dloc is None else dloc + t
        acc = jnp.zeros_like(T) if dloc is None else T * dloc
        for (pa, pb, _, _), (va, vb) in zip(lay.diag_cross, tabs["dcross"]):
            sa = jnp.asarray(va[kp[pa]]).astype(rdtype)
            sb = jnp.asarray(vb[kp[pb]]).astype(rdtype)
            def bc(vec, p):
                return (hi_slice(vec, gi)[:, None, None] if p == 2
                        else (vec[None, :, None] if p == 1
                              else vec[None, None, :]))
            acc = acc + T * (bc(sa, pa) * bc(sb, pb))
        # ---- local contractions: W_lo, W_mid --------------------------------
        for p, k in ((0, k_l), (1, k_m)):
            if k in tabs["W"][p]:
                acc = acc + _contract(T, tabs["W"][p][k], p, rdtype)

        # ---- hi-axis terms: partials into Z, ONE psum_scatter per group ----
        chp = spec.ch_pad[gi]
        Z = None
        # W_hi: local rows x W[d-block rows, :] -> full dst hi axis
        if k_h in tabs["W"][2]:
            W = tabs["W"][2][k_h].astype(rdtype)  # [C_h, C_h]
            W = jnp.pad(W, ((0, chp - W.shape[0]), (0, chp - W.shape[1])))
            Wblk = jax.lax.dynamic_slice(
                W, (d * spec.b[gi], 0), (spec.b[gi], chp))
            Z = jnp.einsum("hml,hn->nml", T, Wblk,
                           preferred_element_type=rdtype,
                           precision="high")
        # cross terms INTO this group
        for (g_src, pa, pb, a_key, b_key) in lay.cross_meta[gi]:
            (sk_h, sk_m, sk_l, sch, scm, scl, scmp, sclp) = lay.groups[g_src]
            Ts = G[g_src]
            runs_a = lay.cross_runs.get(a_key)
            runs_b = lay.cross_runs.get(b_key)
            # split factors by axis: hi (part 2) vs local (parts 0/1)
            fac = {pa: (a_key, runs_a), pb: (b_key, runs_b)}
            if 2 not in fac:
                # k_h unchanged -> same hi block size; fully local term
                acc = acc + _apply_local_cross(
                    Ts, fac, tabs, lay, rdtype)
                continue
            # apply the local-side factor first (slice/matmul on mid/lo)
            p_loc = pa if pb == 2 else pb
            X = Ts
            dst_ranges = (slice(None),)  # mid placement range
            key_loc, runs_loc = fac[p_loc]
            if runs_loc is not None:
                # single-run local factor: slice + scale (chain bonds give 1
                # run; multi-run local factors fall back below)
                if len(runs_loc) == 1:
                    (r0, c0, ln, val) = runs_loc[0]
                    X = X[:, r0:r0 + ln] if p_loc == 1 else X
                    if p_loc == 0:
                        raise NotImplementedError  # lo factors are matmuls
                    if val != 1.0:
                        X = jnp.asarray(val, rdtype).astype(X.dtype) * X
                    dst_ranges = (slice(c0, c0 + ln),)
                else:
                    M = _runs_to_matrix(runs_loc, lay.cross_shapes[key_loc])
                    X = _contract(X, jnp.asarray(M).astype(rdtype),
                                  p_loc, rdtype)
            else:
                X = _contract(X, tabs["cross"][key_loc], p_loc, rdtype)
            # hi-side factor: place local slab / partial into Z_ext
            key_hi, runs_hi = fac[2]
            schp = spec.ch_pad[g_src]
            if runs_hi is not None:
                guard = schp + chp
                for (r0, c0, ln, val) in runs_hi:
                    idx = d * spec.b[g_src] + jnp.arange(spec.b[g_src])
                    msk = ((idx >= r0) & (idx < r0 + ln)).astype(rdtype)
                    Xm = X * msk[:, None, None].astype(X.dtype)
                    if val != 1.0:
                        Xm = jnp.asarray(val, rdtype).astype(X.dtype) * Xm
                    Zext = jnp.zeros((guard + chp,) + Xm.shape[1:], Xm.dtype)
                    start = (d * spec.b[g_src] + (c0 - r0) + schp).astype(
                        jnp.int32)
                    zeros_i = (jnp.zeros((), jnp.int32),) * (Xm.ndim - 1)
                    Zext = jax.lax.dynamic_update_slice(
                        Zext, Xm, (start,) + zeros_i)
                    Zi = Zext[schp: schp + chp]
                    Z = _z_accum(Z, Zi, dst_ranges, T.shape, chp)
            else:
                M = tabs["cross"][key_hi].astype(rdtype)  # [C_h_src, C_h_dst]
                M = jnp.pad(M, ((0, schp - M.shape[0]), (0, chp - M.shape[1])))
                Mblk = jax.lax.dynamic_slice(
                    M, (d * spec.b[g_src], 0), (spec.b[g_src], chp))
                Zi = jnp.einsum("hml,hn->nml", X, Mblk,
                                preferred_element_type=rdtype,
                                precision="high")
                Z = _z_accum(Z, Zi, dst_ranges, T.shape, chp)
        if Z is not None:
            acc = acc + jax.lax.psum_scatter(
                Z, axis_name, scatter_dimension=0, tiled=True)
        outs.append(acc.reshape(-1))
    return jnp.concatenate(outs)


def _z_accum(Z, Zi, dst_ranges, dst_shape, chp):
    """Accumulate a partial Zi into the full-dst-hi-axis buffer Z, placing the
    mid axis at dst_ranges (static)."""
    if Zi.shape[1:] != dst_shape[1:]:
        full = jnp.zeros((Zi.shape[0],) + dst_shape[1:], Zi.dtype)
        full = full.at[(slice(None),) + dst_ranges].add(Zi)
        Zi = full
    return Zi if Z is None else Z + Zi


def _runs_to_matrix(runs, shape):
    M = np.zeros(shape, np.float32)
    for (r0, c0, ln, val) in runs:
        M[np.arange(r0, r0 + ln), np.arange(c0, c0 + ln)] = val
    return M


def _apply_local_cross(Ts, fac, tabs, lay, rdtype):
    """lo|mid cross term (k_h unchanged): both factors shard-local."""
    from ..ops.sector_kron import _contract

    out = Ts
    adds = []
    # apply runs factor(s) as slice adds, matmul factors as contractions —
    # mirror of the single-device apply's mixed case
    parts = sorted(fac)
    (p1, (k1, r1)), (p2, (k2, r2)) = ((parts[0], fac[parts[0]]),
                                      (parts[1], fac[parts[1]]))
    # at most one runs factor here (lo factors are always matmuls)
    if r1 is not None or r2 is not None:
        runs, pr = (r1, p1) if r1 is not None else (r2, p2)
        km, pm = (k2, p2) if r1 is not None else (k1, p1)
        pieces = None
        for (r0, c0, ln, val) in runs:
            X = out[:, r0:r0 + ln] if pr == 1 else out
            X = _contract(X, tabs["cross"][km], pm, rdtype)
            if val != 1.0:
                X = jnp.asarray(val, rdtype).astype(X.dtype) * X
            adds.append((pr, c0, ln, X))
        # assemble into a dst-shaped tensor
        # dst mid length comes from the runs factor's matrix shape
        dst_m = lay.cross_shapes[k1 if r1 is not None else k2][1]
        base = jnp.zeros((X.shape[0], dst_m, X.shape[2]), X.dtype)
        for (pr, c0, ln, X) in adds:
            base = base.at[:, c0:c0 + ln].add(X)
        return base
    X = _contract(out, tabs["cross"][k1], p1, rdtype)
    return _contract(X, tabs["cross"][k2], p2, rdtype)


def sharded_kron_scaling_matvec_fn(model: SpinModel, mesh,
                                   axis_name: str = ROWS):
    """Build the memory-scaling multi-device kron matvec.

    Returns (matvec, layout, spec). matvec maps a BLOCK-DISTRIBUTED state
    (shard_kron_state order, length spec.n_sharded, sharded P(axis_name)) to
    the same; use shard_kron_state/unshard_kron_state at the boundaries."""
    if model.kron_splits is None:
        raise ValueError("model must be built with layout='sector_kron'")
    layout = make_sector_kron_layout(model, model.kron_splits, model.kron_pads)
    D = 1
    for s in mesh.shape.values():
        D *= s
    spec = KronShardSpec(layout, D)
    sh = NamedSharding(mesh, P(axis_name))
    rep = NamedSharding(mesh, P())
    tables = jax.device_put(
        jax.tree_util.tree_map(jnp.asarray, sector_kron_tables(layout)), rep
    )
    rdtype = model.dtype if model.dtype in (jnp.float32, jnp.float64) \
        else jnp.float32

    mapped = jax.shard_map(
        partial(_local_apply, spec=spec, axis_name=axis_name, rdtype=rdtype),
        mesh=mesh,
        in_specs=(P(axis_name), P()),
        out_specs=P(axis_name),
    )

    @jax.jit
    def _mv(psi, tabs):
        psi = jax.lax.with_sharding_constraint(psi, sh)
        return mapped(psi, tabs)

    def matvec(psi):
        return _mv(psi, tables)

    return matvec, layout, spec
