"""Pallas TPU kernel: fused sector_kron group apply (hi-local terms).

The XLA blocks-mode kron apply (ops/sector_kron.py) is multi-pass: the
diagonal, each W contraction and each cross term is its own HBM round trip
over the group tensor (~8 logical passes; measured 106 ms at L=32 against a
~60 ms fused bound). This kernel fuses every HI-LOCAL term of one group —

    diagonal (3 precombined 2-D broadcast factors)
  + W_lo lane-axis matmul
  + W_mid sublane-axis matmul
  + every lo|mid cross term (mid-axis block-shift slice x lo-axis one-hot
    matmul; k_h unchanged, so source rows live at the same hi index)

— into ONE pass: per grid step, one hi-row of the destination group (and of
each source group) streams through VMEM, all matmuls run from VMEM, and the
output row is written once. The hi-axis terms (W_hi einsum + mid|hi
block-shift adds) stay in XLA — they need cross-hi-row access and are already
near their bandwidth bound there; `apply_H_sector_kron_fused` composes both.

Diagonal factorization: diag(h, m, l) = D1[m, l] + D2[h, m] + D3[h, l] —
every onsite/ZZ term of a 3-part split touches at most two parts, so the
group diagonal is exactly representable by three tiny 2-D tables
(sector_kron's per-part vectors + cross-part rank-1 pairs, combined host-side
in _fused_group_prep).

Reference parity: the hot half of apply_H! (/root/reference/src/
Hamiltonian.jl:119-184) executed at one-HBM-pass cost; the reference's
analog is a threaded scalar loop with Dict lookups.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sector_kron import (
    SectorKronLayout,
    apply_H_sector_kron,
)

__all__ = ["apply_H_sector_kron_fused", "fused_group_plans"]


class _GroupPlan:
    """Static per-group fusion plan (host side)."""

    def __init__(self, gi, D1, D2, D3, W_lo, W_mid_T, cross, unsupported,
                 crossh=(), crossh_fusable=False):
        self.gi = gi
        self.D1 = D1        # [cmp, clp] or None
        self.D2 = D2        # [ch, cmp] or None
        self.D3 = D3        # [ch, clp] or None
        self.W_lo = W_lo    # [clp, clp] or None
        self.W_mid_T = W_mid_T  # [cmp, cmp] (transposed) or None
        # cross: [(g_src, r0, c0, ln, val, A_lo[clp_s, clp])]
        self.cross = cross
        # cross_meta entries the kernel cannot fuse (rare: multi-run local
        # factor or both-matmul local term) — applied via the XLA path
        self.unsupported = unsupported
        # crossh (v2 fusion): mid|hi run x run terms as in-kernel shifted-row
        # slice adds — [(g_src, rb0, cb0, lnb, ((ra0, ca0, lna, val), ...))]
        # where the hi factor is the single run (rb0, cb0, lnb) and each mid
        # run becomes one static slice add. crossh_fusable: True when EVERY
        # hi-axis cross entry of this group took this form (else the group's
        # seed keeps computing crossh in XLA).
        self.crossh = crossh
        self.crossh_fusable = crossh_fusable


def fused_group_plans(layout: SectorKronLayout):
    """Build (and cache on the layout) per-group fusion plans."""
    if getattr(layout, "_fused_plans", None) is not None:
        return layout._fused_plans
    plans = []
    for gi, (k_h, k_m, k_l, ch, cm, cl, cmp, clp) in enumerate(layout.groups):
        kp = (k_l, k_m, k_h)
        # ---- combined 2-D diagonal factors --------------------------------
        d_l = layout.diag_vecs[0].get(k_l)
        d_m = layout.diag_vecs[1].get(k_m)
        d_h = layout.diag_vecs[2].get(k_h)
        D1 = np.zeros((cmp, clp))
        D2 = np.zeros((ch, cmp))
        D3 = None
        if d_l is not None:
            D1 = D1 + np.asarray(d_l)[None, :]
        if d_m is not None:
            D1 = D1 + np.asarray(d_m)[:, None]
        if d_h is not None:
            D2 = D2 + np.asarray(d_h)[:, None]
        for (pa, pb, va, vb) in layout.diag_cross:
            a = np.asarray(va[kp[pa]])
            b = np.asarray(vb[kp[pb]])
            if (pa, pb) == (0, 1):
                D1 = D1 + b[:, None] * a[None, :]
            elif (pa, pb) == (1, 2):
                D2 = D2 + b[:, None] * a[None, :]
            elif (pa, pb) == (0, 2):
                D3 = (np.zeros((ch, clp)) if D3 is None else D3)
                D3 = D3 + b[:, None] * a[None, :]
            else:  # pragma: no cover - parts are ordered pa < pb
                raise AssertionError((pa, pb))
        if not np.any(D1):
            D1 = None
        if not np.any(D2):
            D2 = None
        # ---- within-part operators ----------------------------------------
        W_lo = layout.W[0].get(k_l)
        W_mid = layout.W[1].get(k_m)
        W_mid_T = None if W_mid is None else np.ascontiguousarray(W_mid.T)
        # ---- hi-local cross terms ------------------------------------------
        cross = []
        unsupported = []
        for entry in layout.cross_meta[gi]:
            (g_src, pa, pb, a_key, b_key) = entry
            if 2 in (pa, pb):
                continue  # hi-axis term: XLA seed, or v2 crossh fusion below
            # supported pattern: single-run mid factor x lo matmul factor
            runs_a = layout.cross_runs.get(a_key)
            runs_b = layout.cross_runs.get(b_key)
            runs_mid, key_lo = ((runs_a, b_key) if pa == 1
                                else (runs_b, a_key))
            if (runs_mid is None or len(runs_mid) != 1
                    or key_lo in layout.cross_runs):
                unsupported.append(entry)
                continue
            (r0, c0, ln, val) = runs_mid[0]
            A = layout.cross_pool[key_lo]
            cross.append((g_src, r0, c0, ln, float(val), A))
        # ---- hi-axis cross terms (fused-v2): run x run slice adds ----------
        # A mid|hi boundary bond with the rotated part-bit order factorizes
        # into a SINGLE hi-axis run (constant source-row offset per output
        # row — streamable by a shifted BlockSpec index map) times 1-2 mid
        # runs (static in-row slice adds). This moves the crossh slab
        # traffic (~2.6 N reads + RMW at L=32, ≈19 ms of the measured 17 ms
        # roofline gap) from its own XLA pass into the kernel's single pass.
        crossh = []
        crossh_fusable = True
        for entry in layout.cross_meta[gi]:
            (g_src, pa, pb, a_key, b_key) = entry
            if 2 not in (pa, pb):
                continue
            runs_a = layout.cross_runs.get(a_key)
            runs_b = layout.cross_runs.get(b_key)
            runs_mid, runs_hi = (runs_a, runs_b) if (pa, pb) == (1, 2) \
                else (runs_b, runs_a)
            if (pa, pb) != (1, 2) or runs_mid is None or runs_hi is None \
                    or len(runs_hi) != 1:
                crossh_fusable = False
                break
            (rb0, cb0, lnb, vb) = runs_hi[0]
            mids = tuple((ra0, ca0, lna, float(va * vb))
                         for (ra0, ca0, lna, va) in runs_mid)
            crossh.append((g_src, rb0, cb0, lnb, mids))
        if not crossh_fusable:
            crossh = []
        plans.append(_GroupPlan(gi, D1, D2, D3, W_lo, W_mid_T, cross,
                                unsupported, tuple(crossh), crossh_fusable))
    layout._fused_plans = plans
    return plans


def _bf16_exact(M) -> bool:
    """True when every entry of M is exactly bf16-representable (dyadic J's
    like 1.0/0.5 are; then the in-kernel split-2 dot is f32-grade)."""
    import ml_dtypes

    M32 = np.asarray(M, np.float32)
    return bool(np.all(M32.astype(ml_dtypes.bfloat16).astype(np.float32)
                       == M32))


def _dot_split2(state, table, exact, flip=False):
    """f32-grade MXU dot inside a Mosaic kernel.

    Mosaic has no lowering for precision=HIGH (3-pass bf16), so for exact-bf16
    tables we do the 2-pass split by hand — state = s_hi + s_lo (both bf16,
    representation error ~2^-17 rel), table exact — which is both MORE
    accurate and one pass CHEAPER than HIGH. Non-exact tables fall back to
    precision='highest' (full f32, supported by Mosaic). flip=True computes
    table @ state instead of state @ table.

    bf16 STATES (the opt-in half-traffic amplitude mode) skip the state
    split — the state carries only bf16 information: exact tables need one
    MXU pass, non-exact tables a 2-pass table split. Accumulation is always
    f32 (preferred_element_type)."""
    if state.dtype == jnp.bfloat16:
        if exact:
            t_bf = table.astype(jnp.bfloat16)
            a, b = (t_bf, state) if flip else (state, t_bf)
            return jnp.dot(a, b, preferred_element_type=jnp.float32)
        t_hi = table.astype(jnp.bfloat16)
        t_lo = (table - t_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        if flip:
            return (jnp.dot(t_hi, state, preferred_element_type=jnp.float32)
                    + jnp.dot(t_lo, state, preferred_element_type=jnp.float32))
        return (jnp.dot(state, t_hi, preferred_element_type=jnp.float32)
                + jnp.dot(state, t_lo, preferred_element_type=jnp.float32))
    if not exact:
        a, b = (table, state) if flip else (state, table)
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision="highest")
    s_hi = state.astype(jnp.bfloat16)
    s_lo = (state - s_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    t_bf = table.astype(jnp.bfloat16)
    if flip:
        return (jnp.dot(t_bf, s_hi, preferred_element_type=jnp.float32)
                + jnp.dot(t_bf, s_lo, preferred_element_type=jnp.float32))
    return (jnp.dot(s_hi, t_bf, preferred_element_type=jnp.float32)
            + jnp.dot(s_lo, t_bf, preferred_element_type=jnp.float32))


def _build_group_call(shape_key, has, cross_shapes, interpret, exact,
                      crossh_shapes=(), has_seed=True,
                      state_dtype=jnp.float32, crossw_shapes=()):
    """Return a pallas_call for one group structure.

    shape_key = (ch, cmp, clp); has = (D1?, D2?, D3?, W_lo?, W_mid?);
    cross_shapes = tuple of (cmp_s, clp_s, r0, c0, ln, val) per fused cross
    term; exact = (wlo_bf16_exact, wmid_bf16_exact, (per-cross exact...));
    crossh_shapes (v2) = tuple of (ch_s, cmp_s, clp_s, cb0, lnb, mids) per
    fused hi-axis cross term — the source block streams at hi row
    clip(i + rb0 - cb0) and each mid run in `mids` is a static slice add
    masked by the hi-run range; has_seed=False drops the XLA seed input
    (group has no W_hi table and all its crossh terms are fused).
    crossw_shapes = tuple of (cmp_s, clp_s, mids) per WINDOWED hi-axis cross
    term (the sharded path, parallel/sharded_kron_scaling): the caller has
    already materialized the shifted, run-masked source rows ALIGNED to this
    group's hi rows (a [ch, cmp_s, clp_s] window), so the kernel applies the
    mid runs as plain slice adds — no shift, no mask.
    Grid: one hi row per step (blocks [1, cmp, clp] — full native tiles);
    inputs ordered [T_own, seed?, T_src..., T_srch..., T_win..., D1?, D2?,
    D3?, W_lo?, W_mid_T?, A...]."""
    ch, cmp, clp = shape_key
    hD1, hD2, hD3, hWlo, hWmid = has
    e_wlo, e_wmid, e_cross = exact
    n_cross = len(cross_shapes)
    n_crossh = len(crossh_shapes)
    n_crossw = len(crossw_shapes)
    # bf16 states accumulate into an f32 VMEM scratch: arbitrary-offset
    # sublane RMW on a (16,128)-tiled bf16 out ref is Mosaic-hostile, and
    # per-slice bf16 rounding would stack. One final cast writes out.
    bf16_state = jnp.dtype(state_dtype) == jnp.bfloat16

    def kernel(*refs):
        if bf16_state:
            scratch = refs[-1]
            refs = refs[:-1]
        i = 0
        t_own = refs[i]; i += 1
        if has_seed:
            seed = refs[i]; i += 1  # XLA-computed hi-axis terms: seeds acc
        t_srcs = refs[i: i + n_cross]; i += n_cross
        th_srcs = refs[i: i + n_crossh]; i += n_crossh
        tw_srcs = refs[i: i + n_crossw]; i += n_crossw
        d1 = refs[i] if hD1 else None; i += hD1
        d2 = refs[i] if hD2 else None; i += hD2
        d3 = refs[i] if hD3 else None; i += hD3
        wlo = refs[i] if hWlo else None; i += hWlo
        wmidT = refs[i] if hWmid else None; i += hWmid
        a_refs = refs[i: i + n_cross]; i += n_cross
        out = refs[i]
        acc_ref = scratch if bf16_state else out

        T = t_own[0]  # [cmp, clp]
        gidx = pl.program_id(0)
        if has_seed:
            acc = seed[0].astype(jnp.float32)
        else:
            acc = jnp.zeros((cmp, clp), jnp.float32)
        if d1 is not None:
            d = d1[:]
            if d2 is not None:
                d = d + d2[gidx][:, None]
            if d3 is not None:
                d = d + d3[gidx][None, :]
            acc = acc + T * d
        elif d2 is not None:
            d = d2[gidx][:, None]
            if d3 is not None:
                d = d + d3[gidx][None, :]
            acc = acc + T * d
        elif d3 is not None:
            acc = acc + T * d3[gidx][None, :]
        if wlo is not None:
            acc = acc + _dot_split2(T, wlo[:], e_wlo)
        if wmidT is not None:
            acc = acc + _dot_split2(T, wmidT[:], e_wmid, flip=True)
        if bf16_state:
            acc_ref[...] = acc
        else:
            acc_ref[0] = acc
        # cross slabs land on sub-ranges of the mid axis; Mosaic lowers
        # neither scatter-add nor value dynamic_update_slice, so accumulate
        # by read-modify-write on the acc ref with static slices

        def rmw(c0, ln, X):
            if bf16_state:
                acc_ref[c0:c0 + ln, :] = acc_ref[c0:c0 + ln, :] + X
            else:
                acc_ref[0, c0:c0 + ln, :] = acc_ref[0, c0:c0 + ln, :] + X

        for (t_src, a_ref, ecr, (cmp_s, clp_s, r0, c0, ln, val)) in zip(
                t_srcs, a_refs, e_cross, cross_shapes):
            X = _dot_split2(t_src[0, r0:r0 + ln, :], a_ref[:], ecr)
            if val != 1.0:
                X = jnp.float32(val) * X
            rmw(c0, ln, X)
        # hi-axis cross (v2): shifted source row, mask rows outside the hi
        # run (the BlockSpec clamps out-of-range DMAs to a real row whose
        # values the mask zeroes), then 1-2 static mid-slice adds (VPU)
        for (th, (ch_s, cmp_s, clp_s, rb0, cb0, lnb, mids)) in zip(
                th_srcs, crossh_shapes):
            in_run = jnp.logical_and(gidx >= cb0, gidx < cb0 + lnb)
            msk = in_run.astype(jnp.float32)
            src = th[0]
            for (ra0, ca0, lna, val) in mids:
                rmw(ca0, lna,
                    (jnp.float32(val) * msk)
                    * src[ra0:ra0 + lna, :].astype(jnp.float32))
        # windowed hi-axis cross (sharded path): source rows pre-shifted and
        # pre-masked by the caller — plain static mid-slice adds
        for (tw, (cmp_s, clp_s, mids)) in zip(tw_srcs, crossw_shapes):
            src = tw[0]
            for (ra0, ca0, lna, val) in mids:
                rmw(ca0, lna,
                    jnp.float32(val)
                    * src[ra0:ra0 + lna, :].astype(jnp.float32))
        if bf16_state:
            out[0] = acc_ref[...].astype(state_dtype)

    in_specs = [pl.BlockSpec((1, cmp, clp), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    if has_seed:
        in_specs.append(pl.BlockSpec((1, cmp, clp), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))  # seed
    for (cmp_s, clp_s, *_r) in cross_shapes:
        in_specs.append(pl.BlockSpec((1, cmp_s, clp_s), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
    for (ch_s, cmp_s, clp_s, rb0, cb0, lnb, mids) in crossh_shapes:
        in_specs.append(pl.BlockSpec(
            (1, cmp_s, clp_s),
            lambda i, d=rb0 - cb0, n=ch_s: (jnp.clip(i + d, 0, n - 1), 0, 0),
            memory_space=pltpu.VMEM))
    for (cmp_s, clp_s, mids) in crossw_shapes:
        in_specs.append(pl.BlockSpec((1, cmp_s, clp_s), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
    if hD1:
        in_specs.append(pl.BlockSpec((cmp, clp), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    if hD2:
        # full-array block: per-row blocks violate the (8,128)-divisible rule;
        # the kernel indexes rows by pl.program_id (D2/D3 are tiny)
        in_specs.append(pl.BlockSpec((ch, cmp), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    if hD3:
        in_specs.append(pl.BlockSpec((ch, clp), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    if hWlo:
        in_specs.append(pl.BlockSpec((clp, clp), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    if hWmid:
        in_specs.append(pl.BlockSpec((cmp, cmp), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    for (cmp_s, clp_s, *_r) in cross_shapes:
        in_specs.append(pl.BlockSpec((clp_s, clp), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    # Scoped-VMEM budget: Mosaic's default 16 MB limit is a conservative
    # compiler default, not the v5e's physical VMEM (128 MB). Large groups
    # with streamed crossh sources (e.g. L=32's [252, 464, 512] group: ~16.4
    # MB with double buffering) exceed it — size the limit from the actual
    # block footprint instead.
    blk_bytes = 0
    for spec in in_specs:
        n = 1
        for d in spec.block_shape:
            n *= int(d)
        blk_bytes += 4 * n
    blk_bytes += 4 * cmp * clp  # out block
    if bf16_state:
        blk_bytes += 4 * cmp * clp  # f32 accumulation scratch
    vmem_limit = min(max(2 * blk_bytes + (1 << 20), 16 * 2**20), 100 * 2**20)

    return pl.pallas_call(
        kernel,
        grid=(ch,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, cmp, clp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ch, cmp, clp), state_dtype),
        scratch_shapes=(
            [pltpu.VMEM((cmp, clp), jnp.float32)] if bf16_state else []),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )


def apply_H_sector_kron_fused(blocks, layout: SectorKronLayout, tables=None,
                              interpret: bool = False, top_k: int | None = None,
                              fuse_crossh: bool | None = None, axpy=None):
    """H|psi> on BlockVec leaves: fused Pallas pass for hi-local terms + XLA
    for the hi-axis terms. f32 real states only (solvers use real planes on
    TPU); falls back to the XLA apply for anything else.

    fuse_crossh (v2, default env SDTPU_FUSED_CROSSH=1): stream the mid|hi
    run x run cross terms through the kernel as shifted-row slice adds,
    shrinking the XLA seed to the W_hi einsum alone (and dropping it
    entirely for groups without a W_hi table). At L=32 the crossh slabs are
    ~2.6 N reads + RMW per apply in XLA — about 19 ms of the 17 ms measured
    roofline gap.

    top_k: fuse only the top_k LARGEST groups (default: the measured-best
    size rule sector_kron.default_fused_topk — every group >= 0.5 MB,
    clamped >= 32; env SDTPU_FUSED_TOPK overrides); the tail runs through
    the XLA blocks path. Every distinct group is a distinct Mosaic module
    (remote compiles ~30-60 s each), bounding first-compile time.

    axpy=(s, blocks0): return H psi + s * psi0 with the axpy folded into each
    group's kernel SEED — per-group, so psi0's leaves die as they are
    consumed. The Lanczos recurrence w = H v_j - beta_j v_{j-1} then peaks at
    ~3 live N-vectors instead of 4, which is the difference between fitting
    and OOMing the L=32 two-pass ground state on one 16 GB chip."""
    state_dtype = blocks[0].dtype
    if jnp.iscomplexobj(blocks[0]) or state_dtype not in (jnp.float32,
                                                          jnp.bfloat16):
        outs = apply_H_sector_kron(blocks, None, layout, tables)
        if axpy is not None:
            s, b0 = axpy
            outs = [o + (s * x).astype(o.dtype) for o, x in zip(outs, b0)]
        return outs
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    import os

    if top_k is None:
        from .sector_kron import default_fused_topk

        top_k = default_fused_topk(layout)
    if fuse_crossh is None:
        fuse_crossh = os.environ.get("SDTPU_FUSED_CROSSH", "1") == "1"
    plans = fused_group_plans(layout)
    dev = tables
    if dev is None:
        from .sector_kron import _device_tables

        dev = _device_tables(layout)

    sizes = [(ch * cmp * clp, gi) for gi, (_, _, _, ch, _, _, cmp, clp)
             in enumerate(layout.groups)]
    fused_set = frozenset(gi for _, gi in
                          sorted(sizes, reverse=True)[:top_k])
    tail = frozenset(range(len(layout.groups))) - fused_set

    # hi-axis terms via the XLA blocks path. For the FUSED groups the seed is
    # computed per group (group_filter singleton) so XLA can free each seed
    # right after its pallas_call consumes it — one full-vector seed BlockVec
    # alongside psi+outs OOMs a 16 GB chip at L=32. With fuse_crossh the seed
    # shrinks to the W_hi einsum ("hi"); crossh streams through the kernel.
    def hi_for(gi, seed_terms):
        # the XLA path accumulates in f32 (einsum promotion); cast back so
        # bf16-mode seeds stay half-width on their HBM round trip
        return apply_H_sector_kron(list(blocks), None, layout, dev,
                                   terms=seed_terms,
                                   group_filter=(gi,))[gi].astype(state_dtype)

    # tail groups (small, ~8% of N at the default top_k): batch both passes
    hi_tail = (apply_H_sector_kron(list(blocks), None, layout, dev,
                                   terms="hi,crossh", group_filter=tail)
               if tail else None)
    tail_out = (apply_H_sector_kron(list(blocks), None, layout, dev,
                                    terms="diag,lo,mid,crossl",
                                    group_filter=tail)
                if tail else None)

    outs = []
    for plan, (k_h, k_m, k_l, ch, cm, cl, cmp, clp) in zip(plans,
                                                           layout.groups):
        gi = plan.gi
        if gi in tail:
            t = tail_out[gi] + hi_tail[gi]
            if axpy is not None:
                t = t + axpy[0] * axpy[1][gi]
            outs.append(t.astype(state_dtype))
            continue
        v2 = fuse_crossh and plan.crossh_fusable
        if v2:
            has_seed = k_h in layout.W[2]
            seed_terms = "hi"
        else:
            has_seed = True
            seed_terms = "hi,crossh"
        args = [blocks[gi]]
        if axpy is not None:
            # fold s * psi0[gi] into the seed (XLA fuses the scale into the
            # hi einsum's epilogue; for seedless groups it IS the seed)
            sg = (axpy[0] * axpy[1][gi]).astype(state_dtype)
            if has_seed:
                args.append((hi_for(gi, seed_terms).astype(jnp.float32)
                             + sg.astype(jnp.float32)).astype(state_dtype))
            else:
                args.append(sg)
            has_seed = True
        elif has_seed:
            args.append(hi_for(gi, seed_terms))
        cross_shapes = []
        for (g_src, r0, c0, ln, val, A) in plan.cross:
            (_, _, _, chs, _, _, cmps, clps) = layout.groups[g_src]
            args.append(blocks[g_src])
            cross_shapes.append((cmps, clps, r0, c0, ln, val))
        crossh_shapes = []
        if v2:
            for (g_src, rb0, cb0, lnb, mids) in plan.crossh:
                (_, _, _, chs, _, _, cmps, clps) = layout.groups[g_src]
                args.append(blocks[g_src])
                crossh_shapes.append((chs, cmps, clps, rb0, cb0, lnb, mids))
        has = (plan.D1 is not None, plan.D2 is not None,
               plan.D3 is not None, plan.W_lo is not None,
               plan.W_mid_T is not None)
        for nm, val_ in (("D1", plan.D1), ("D2", plan.D2), ("D3", plan.D3),
                         ("W_lo", plan.W_lo), ("W_mid_T", plan.W_mid_T)):
            if val_ is not None:
                args.append(jnp.asarray(val_, jnp.float32))
        for (g_src, r0, c0, ln, val, A) in plan.cross:
            args.append(jnp.asarray(A, jnp.float32))
        exact = (plan.W_lo is not None and _bf16_exact(plan.W_lo),
                 plan.W_mid_T is not None and _bf16_exact(plan.W_mid_T),
                 tuple(_bf16_exact(A) for (*_x, A) in plan.cross))
        call = _build_group_call((ch, cmp, clp), has, tuple(cross_shapes),
                                 interpret, exact,
                                 crossh_shapes=tuple(crossh_shapes),
                                 has_seed=has_seed, state_dtype=state_dtype)
        outs.append(call(*args))

    # rare unsupported local terms -> XLA addendum (fused groups only; the
    # tail path already applied its full crossl set)
    if any(plan.unsupported for plan in plans if plan.gi in fused_set):
        extra = _xla_unsupported(blocks, layout, dev,
                                 [p for p in plans if p.gi in fused_set])
        outs = [o + e.astype(o.dtype) if e is not None else o
                for o, e in zip(outs, extra)]
    return outs


def _xla_unsupported(blocks, layout, dev, plans):
    """Apply the cross_meta entries the kernel could not fuse (both-matmul
    local terms etc.) through the generic contraction path."""
    from .sector_kron import _contract

    outs = [None] * len(layout.groups)
    for plan in plans:
        for (g_src, pa, pb, a_key, b_key) in plan.unsupported:
            T = blocks[g_src]
            A = dev["cross"].get(a_key)
            B = dev["cross"].get(b_key)
            runs_a = layout.cross_runs.get(a_key)
            runs_b = layout.cross_runs.get(b_key)
            acc = outs[plan.gi]
            # reuse the generic mixed logic: runs as slice adds
            if runs_a is not None or runs_b is not None:
                runs, pr = (runs_a, pa) if runs_a is not None else (runs_b, pb)
                m_key, pm = (b_key, pb) if runs_a is not None else (a_key, pa)
                M = dev["cross"][m_key]
                if pr != 1:
                    # run factors only ever occur on the mid axis (p==1) for
                    # unsupported entries today; a silent fall-through here
                    # would DROP the cross term (advisor r2).
                    raise NotImplementedError(
                        f"run-form cross factor on axis {pr} in the XLA "
                        "fallback for unsupported fused entries; extend "
                        "_xla_unsupported before changing run classification")
                base = jnp.zeros_like(blocks[plan.gi])
                for (r0, c0, ln, val) in runs:
                    X = _contract(T[:, r0:r0 + ln], M, pm, jnp.float32)
                    if val != 1.0:
                        X = jnp.float32(val) * X
                    base = base.at[:, c0:c0 + ln].add(X)
                acc = base if acc is None else acc + base
            else:
                X = _contract(T, A, pa, jnp.float32)
                X = _contract(X, B, pb, jnp.float32)
                acc = X if acc is None else acc + X
            outs[plan.gi] = acc
    return outs
