"""Pallas TPU kernel: fully-fused Chebyshev evolution term on BlockVec pairs.

The Chebyshev e^{-iH dt} step (solvers/kron_evolve._cheb_kron_scan; ref
recurrence src/TimeEvolution/Chebyshev.jl:111-122) does, per term k >= 2 and
per (re, im) plane,

    x = 2 * (H p_curr - b p_curr) / a - p_prev          (shifted recurrence)
    acc_re += c_r x_re - c_i x_im                        (coefficient update)
    acc_im += c_i x_re + c_r x_im

With the matvec alone fused (ops/pallas_kron) the shift/recurrence/accumulator
combine is a separate XLA elementwise pass chain — and TPU executes HLO ops on
ONE sequential stream, so those passes ADD to the kernel time instead of
hiding under it (measured round 5: the L=28 f32 step runs at 0.52 of its
byte-count speed-of-light; the missing time is exactly the serialized combine
traffic).  This kernel fuses the ENTIRE term for one group — both planes of
the hi-local H apply (diagonal, W_lo, W_mid, lo|mid cross, streamed mid|hi
cross; the W_hi einsum stays an XLA seed, as in pallas_kron) plus the shift,
the three-term recurrence, and the accumulator update — so every combine byte
moves inside the kernel's DMA pipeline, overlapped with the MXU contractions.
Per element per term the kernel now moves the step's true minimum
(read p_curr/p_prev/acc + write p_next/acc) and the step approaches
max(MXU, HBM) instead of their sum.

This file deliberately does NOT touch ops/pallas_kron.py: the Mosaic payload
embeds kernel source locations, so any edit there invalidates the persistent
compile cache of every cached program containing those kernels (CLAUDE.md).
New kernels in a new file leave the matvec/groundstate/KPM caches warm.

Reference parity: the Chebyshev stepping of src/TimeEvolution/Chebyshev.jl
(62-133) executed at one-HBM-pass cost per term; the reference materializes
phi_next and the accumulator as separate full-vector axpys.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kron import _dot_split2, _bf16_exact, fused_group_plans, _xla_unsupported
from .sector_kron import SectorKronLayout, apply_H_sector_kron

__all__ = ["cheb_scan_terms_fused", "cheb_fused_enabled"]


def cheb_fused_enabled() -> bool:
    """Default routing for the fused-term path: on for accelerators, off for
    CPU (where the kernel would run interpreted, many times slower than the
    XLA combine). SDTPU_CHEB_FUSED=1 forces on (tests use it with interpret
    mode), =0 forces off."""
    import os

    v = os.environ.get("SDTPU_CHEB_FUSED")
    if v is not None:
        return v == "1"
    return jax.default_backend() != "cpu"


def _build_term_call(shape_key, has, cross_shapes, interpret, exact,
                     crossh_shapes, has_seed, state_dtype):
    """pallas_call for one group's fused Chebyshev term.

    Same static structure as pallas_kron._build_group_call (one hi row per
    grid step, full native (cmp, clp) tiles), but two planes per launch and
    four outputs: [next_re, next_im, acc_re, acc_im].  Inputs, in order:
    T_re, T_im (own group, both planes), prev_re, prev_im, acc_re, acc_im,
    [seed_re, seed_im], per-cross (src_re, src_im), per-crossh
    (src_re, src_im), D1?, D2?, D3?, W_lo?, W_mid_T?, per-cross A, and an
    SMEM scalar vector [1/a, b, c_r, c_i] (the term coefficient is a TRACED
    scan value, so it rides SMEM, not a baked constant).  The hi-axis H terms
    (W_hi einsum, unfusable crossh) arrive as the precomputed `seed` planes,
    exactly as in the matvec kernel."""
    ch, cmp, clp = shape_key
    hD1, hD2, hD3, hWlo, hWmid = has
    e_wlo, e_wmid, e_cross = exact
    n_cross = len(cross_shapes)
    n_crossh = len(crossh_shapes)
    bf16_state = jnp.dtype(state_dtype) == jnp.bfloat16
    f32 = jnp.float32

    def kernel(*refs):
        h_re_s, h_im_s = refs[-2], refs[-1]   # f32 VMEM scratch accumulators
        refs = refs[:-2]
        i = 0
        t_re = refs[i]; i += 1
        t_im = refs[i]; i += 1
        prev_re = refs[i]; i += 1
        prev_im = refs[i]; i += 1
        acc_re_in = refs[i]; i += 1
        acc_im_in = refs[i]; i += 1
        if has_seed:
            seed_re = refs[i]; i += 1
            seed_im = refs[i]; i += 1
        srcs = refs[i: i + 2 * n_cross]; i += 2 * n_cross
        srch = refs[i: i + 2 * n_crossh]; i += 2 * n_crossh
        d1 = refs[i] if hD1 else None; i += hD1
        d2 = refs[i] if hD2 else None; i += hD2
        d3 = refs[i] if hD3 else None; i += hD3
        wlo = refs[i] if hWlo else None; i += hWlo
        wmidT = refs[i] if hWmid else None; i += hWmid
        a_refs = refs[i: i + n_cross]; i += n_cross
        scal = refs[i]; i += 1
        out_next_re, out_next_im, out_acc_re, out_acc_im = refs[i: i + 4]

        gidx = pl.program_id(0)
        Tr = t_re[0]
        Ti = t_im[0]
        if has_seed:
            hr = seed_re[0].astype(f32)
            hi_ = seed_im[0].astype(f32)
        else:
            hr = jnp.zeros((cmp, clp), f32)
            hi_ = jnp.zeros((cmp, clp), f32)
        # ---- diagonal (3 precombined 2-D factors, shared by both planes) ----
        d = None
        if d1 is not None:
            d = d1[:]
        if d2 is not None:
            t = d2[gidx][:, None]
            d = t if d is None else d + t
        if d3 is not None:
            t = d3[gidx][None, :]
            d = t if d is None else d + t
        if d is not None:
            hr = hr + Tr.astype(f32) * d
            hi_ = hi_ + Ti.astype(f32) * d
        # ---- within-part contractions --------------------------------------
        if wlo is not None:
            hr = hr + _dot_split2(Tr, wlo[:], e_wlo)
            hi_ = hi_ + _dot_split2(Ti, wlo[:], e_wlo)
        if wmidT is not None:
            hr = hr + _dot_split2(Tr, wmidT[:], e_wmid, flip=True)
            hi_ = hi_ + _dot_split2(Ti, wmidT[:], e_wmid, flip=True)
        h_re_s[...] = hr
        h_im_s[...] = hi_

        def rmw(sref, c0, ln, X):
            sref[c0:c0 + ln, :] = sref[c0:c0 + ln, :] + X

        # ---- lo|mid cross terms (mid run x lo one-hot matmul) --------------
        for (k, (a_ref, ecr, (cmp_s, clp_s, r0, c0, ln, val))) in enumerate(
                zip(a_refs, e_cross, cross_shapes)):
            for (pl_i, sref) in ((0, h_re_s), (1, h_im_s)):
                X = _dot_split2(srcs[2 * k + pl_i][0, r0:r0 + ln, :],
                                a_ref[:], ecr)
                if val != 1.0:
                    X = jnp.float32(val) * X
                rmw(sref, c0, ln, X)
        # ---- streamed mid|hi cross terms (shifted row, masked) -------------
        for (k, (ch_s, cmp_s, clp_s, rb0, cb0, lnb, mids)) in enumerate(
                crossh_shapes):
            in_run = jnp.logical_and(gidx >= cb0, gidx < cb0 + lnb)
            msk = in_run.astype(f32)
            for (pl_i, sref) in ((0, h_re_s), (1, h_im_s)):
                src = srch[2 * k + pl_i][0]
                for (ra0, ca0, lna, val) in mids:
                    rmw(sref, ca0, lna,
                        (jnp.float32(val) * msk)
                        * src[ra0:ra0 + lna, :].astype(f32))
        # ---- fused Chebyshev epilogue --------------------------------------
        a_inv = scal[0]
        b = scal[1]
        c_r = scal[2]
        c_i = scal[3]
        two_ai = 2.0 * a_inv
        xr = (h_re_s[...] - b * Tr.astype(f32)) * two_ai \
            - prev_re[0].astype(f32)
        xi = (h_im_s[...] - b * Ti.astype(f32)) * two_ai \
            - prev_im[0].astype(f32)
        out_next_re[0] = xr.astype(state_dtype)
        out_next_im[0] = xi.astype(state_dtype)
        out_acc_re[0] = acc_re_in[0] + c_r * xr - c_i * xi
        out_acc_im[0] = acc_im_in[0] + c_i * xr + c_r * xi

    row = lambda i: (i, 0, 0)  # noqa: E731
    vspec = partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    in_specs = [vspec((1, cmp, clp), row) for _ in range(6)]
    if has_seed:
        in_specs += [vspec((1, cmp, clp), row)] * 2
    for (cmp_s, clp_s, *_r) in cross_shapes:
        in_specs += [vspec((1, cmp_s, clp_s), row)] * 2
    for (ch_s, cmp_s, clp_s, rb0, cb0, lnb, mids) in crossh_shapes:
        sh = pl.BlockSpec(
            (1, cmp_s, clp_s),
            lambda i, d=rb0 - cb0, n=ch_s: (jnp.clip(i + d, 0, n - 1), 0, 0),
            memory_space=pltpu.VMEM)
        in_specs += [sh, sh]
    if hD1:
        in_specs.append(vspec((cmp, clp), lambda i: (0, 0)))
    if hD2:
        in_specs.append(vspec((ch, cmp), lambda i: (0, 0)))
    if hD3:
        in_specs.append(vspec((ch, clp), lambda i: (0, 0)))
    if hWlo:
        in_specs.append(vspec((clp, clp), lambda i: (0, 0)))
    if hWmid:
        in_specs.append(vspec((cmp, cmp), lambda i: (0, 0)))
    for (cmp_s, clp_s, *_r) in cross_shapes:
        in_specs.append(vspec((clp_s, clp), lambda i: (0, 0)))
    in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # scalars [4]

    sbytes = jnp.dtype(state_dtype).itemsize
    blk_bytes = 0
    for spec in in_specs[:-1]:
        n = 1
        for d_ in spec.block_shape:
            n *= int(d_)
        blk_bytes += 4 * n  # acc/tables f32; state blocks over-counted, safe
    blk_bytes += 2 * (sbytes + 4) * cmp * clp   # out blocks
    blk_bytes += 2 * 4 * cmp * clp              # scratch
    vmem_limit = min(max(2 * blk_bytes + (1 << 20), 16 * 2**20), 100 * 2**20)

    return pl.pallas_call(
        kernel,
        grid=(ch,),
        in_specs=in_specs,
        out_specs=[vspec((1, cmp, clp), row) for _ in range(4)],
        out_shape=[
            jax.ShapeDtypeStruct((ch, cmp, clp), state_dtype),
            jax.ShapeDtypeStruct((ch, cmp, clp), state_dtype),
            jax.ShapeDtypeStruct((ch, cmp, clp), jnp.float32),
            jax.ShapeDtypeStruct((ch, cmp, clp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((cmp, clp), jnp.float32)] * 2,
        # acc planes round-trip every term: alias in->out so the scan's
        # watermark stays at one accumulator pair
        input_output_aliases={4: 2, 5: 3},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )


def _term_plan(layout: SectorKronLayout, top_k, fuse_crossh):
    """Static per-call structure: (plans, fused_set, tail) — mirrors
    apply_H_sector_kron_fused's group selection."""
    plans = fused_group_plans(layout)
    sizes = [(ch * cmp * clp, gi) for gi, (_, _, _, ch, _, _, cmp, clp)
             in enumerate(layout.groups)]
    fused_set = frozenset(gi for _, gi in sorted(sizes, reverse=True)[:top_k])
    tail = frozenset(range(len(layout.groups))) - fused_set
    return plans, fused_set, tail


def _cheb_term_fused(layout, dev, plans, fused_set, tail, interpret,
                     state_dtype, pair_prev, pair_curr, acc, scal,
                     fuse_crossh=True):
    """One fully-fused term: returns (pair_next, (acc_re, acc_im)).

    pair_*: (BlockVec, BlockVec) plane pairs in state_dtype; acc: f32
    BlockVec pair; scal: f32 [4] device vector (1/a, b, c_r, c_i)."""
    from ..solvers.blockvec import BlockVec

    blocks_re = list(pair_curr[0].leaves)
    blocks_im = list(pair_curr[1].leaves)

    def hi_for(blocks, gi, seed_terms):
        return apply_H_sector_kron(blocks, None, layout, dev,
                                   terms=seed_terms,
                                   group_filter=(gi,))[gi].astype(state_dtype)

    # rare local terms the kernel cannot fuse -> fold into the seeds
    un_plans = [p for p in plans if p.gi in fused_set and p.unsupported]
    extra_re = (_xla_unsupported(blocks_re, layout, dev, un_plans)
                if un_plans else [None] * len(layout.groups))
    extra_im = (_xla_unsupported(blocks_im, layout, dev, un_plans)
                if un_plans else [None] * len(layout.groups))

    # tail groups: batched XLA H apply, then the XLA combine (tiny leaves)
    if tail:
        ht_re = apply_H_sector_kron(blocks_re, None, layout, dev,
                                    terms="all", group_filter=tail)
        ht_im = apply_H_sector_kron(blocks_im, None, layout, dev,
                                    terms="all", group_filter=tail)

    a_inv, b, c_r, c_i = scal[0], scal[1], scal[2], scal[3]
    f32 = jnp.float32
    next_re, next_im, acc_re, acc_im = [], [], [], []
    for plan, (k_h, k_m, k_l, ch, cm, cl, cmp, clp) in zip(plans,
                                                           layout.groups):
        gi = plan.gi
        if gi in tail:
            xr = (ht_re[gi].astype(f32) - b * blocks_re[gi].astype(f32)) \
                * (2.0 * a_inv) - pair_prev[0].leaves[gi].astype(f32)
            xi = (ht_im[gi].astype(f32) - b * blocks_im[gi].astype(f32)) \
                * (2.0 * a_inv) - pair_prev[1].leaves[gi].astype(f32)
            next_re.append(xr.astype(state_dtype))
            next_im.append(xi.astype(state_dtype))
            acc_re.append(acc[0].leaves[gi] + c_r * xr - c_i * xi)
            acc_im.append(acc[1].leaves[gi] + c_i * xr + c_r * xi)
            continue
        v2 = fuse_crossh and plan.crossh_fusable
        if v2:
            has_seed = k_h in layout.W[2]
            seed_terms = "hi"
        else:
            has_seed = True
            seed_terms = "hi,crossh"
        sr = si = None
        if has_seed:
            sr = hi_for(blocks_re, gi, seed_terms)
            si = hi_for(blocks_im, gi, seed_terms)
        if extra_re[gi] is not None:
            er = extra_re[gi].astype(f32)
            ei = extra_im[gi].astype(f32)
            sr = er.astype(state_dtype) if sr is None else \
                (sr.astype(f32) + er).astype(state_dtype)
            si = ei.astype(state_dtype) if si is None else \
                (si.astype(f32) + ei).astype(state_dtype)
            has_seed = True
        args = [blocks_re[gi], blocks_im[gi],
                pair_prev[0].leaves[gi], pair_prev[1].leaves[gi],
                acc[0].leaves[gi], acc[1].leaves[gi]]
        if has_seed:
            args += [sr, si]
        cross_shapes = []
        for (g_src, r0, c0, ln, val, A) in plan.cross:
            (_, _, _, chs, _, _, cmps, clps) = layout.groups[g_src]
            args += [blocks_re[g_src], blocks_im[g_src]]
            cross_shapes.append((cmps, clps, r0, c0, ln, val))
        crossh_shapes = []
        if v2:
            for (g_src, rb0, cb0, lnb, mids) in plan.crossh:
                (_, _, _, chs, _, _, cmps, clps) = layout.groups[g_src]
                args += [blocks_re[g_src], blocks_im[g_src]]
                crossh_shapes.append((chs, cmps, clps, rb0, cb0, lnb, mids))
        has = (plan.D1 is not None, plan.D2 is not None, plan.D3 is not None,
               plan.W_lo is not None, plan.W_mid_T is not None)
        for val_ in (plan.D1, plan.D2, plan.D3, plan.W_lo, plan.W_mid_T):
            if val_ is not None:
                args.append(jnp.asarray(val_, jnp.float32))
        for (g_src, r0, c0, ln, val, A) in plan.cross:
            args.append(jnp.asarray(A, jnp.float32))
        args.append(scal)
        exact = (plan.W_lo is not None and _bf16_exact(plan.W_lo),
                 plan.W_mid_T is not None and _bf16_exact(plan.W_mid_T),
                 tuple(_bf16_exact(A) for (*_x, A) in plan.cross))
        call = _build_term_call((ch, cmp, clp), has, tuple(cross_shapes),
                                interpret, exact, tuple(crossh_shapes),
                                has_seed, state_dtype)
        nr, ni, ar, ai = call(*args)
        next_re.append(nr)
        next_im.append(ni)
        acc_re.append(ar)
        acc_im.append(ai)
    return ((BlockVec(next_re), BlockVec(next_im)),
            (BlockVec(acc_re), BlockVec(acc_im)))


def cheb_scan_terms_fused(layout: SectorKronLayout, tables, pair_prev,
                          pair_curr, acc, coeffs_tail, ab,
                          interpret: bool = False, top_k: int | None = None):
    """Scan the Chebyshev terms k = 2..n-1 with the fused term kernel.

    pair_prev/pair_curr: (re, im) BlockVec pairs (phi_{k-2}, phi_{k-1});
    acc: (acc_re, acc_im) f32 BlockVec pair already holding the k=0, 1
    contributions; coeffs_tail: f32 [n-2, 2] (c_r, c_i) rows; ab = (1/a, b)
    scalars. Returns the final (acc_re, acc_im) pair — the same contract as
    the scan tail of solvers/kron_evolve._cheb_kron_scan."""
    import os

    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    if top_k is None:
        v = os.environ.get("SDTPU_CHEB_TOPK")
        if v is not None:
            top_k = int(v)
        else:
            from .sector_kron import default_fused_topk

            # lower cutoff than the matvec: a cheb-tail group pays the whole
            # per-term combine chain in XLA, so fusing smaller groups still
            # wins (see default_fused_topk docstring for the measurements)
            top_k = default_fused_topk(layout, min_elems=1 << 15)
    fuse_crossh = os.environ.get("SDTPU_FUSED_CROSSH", "1") == "1"
    plans, fused_set, tail = _term_plan(layout, top_k, fuse_crossh)
    state_dtype = pair_curr[0].dtype
    dev = tables
    a_inv, b = ab

    def step(carry, c):
        p_prev, p_curr, ar, ai = carry
        scal = jnp.stack([jnp.asarray(a_inv, jnp.float32),
                          jnp.asarray(b, jnp.float32),
                          c[0].astype(jnp.float32),
                          c[1].astype(jnp.float32)])
        p_next, (ar2, ai2) = _cheb_term_fused(
            layout, dev, plans, fused_set, tail, interpret, state_dtype,
            p_prev, p_curr, (ar, ai), scal, fuse_crossh)
        return (p_curr, p_next, ar2, ai2), None

    (_, _, acc_r, acc_i), _ = jax.lax.scan(
        step, (pair_prev, pair_curr, acc[0], acc[1]), coeffs_tail)
    return acc_r, acc_i
