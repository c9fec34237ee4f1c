"""Observables evaluated directly on BlockVec kron states (VERDICT r3 #2/#3).

The flat-vector observables (observables.py) need the state as one [N] array —
fine on one chip, wrong for BlockVec solves and the multi-chip story: a
blocks -> flat -> blocks round trip costs 2 full HBM passes (plus the tile
re-pad, CLAUDE.md), and a sharded state would have to be gathered.

These variants consume the per-group rank-3 tensors [C_h, C_m_pad, C_l_pad]
directly and exploit the Kronecker structure: every diagonal observable is a
function of the per-axis MARGINALS of |psi|^2 —

    <Sz_i>           = sum_g  m_axis(g) . sz_part[rank, rel_i]
    <Sz_i Sz_j>      = sum_g  m_axis(g) . (sz_i * sz_j)         (same part)
                     = sum_g  M_2axis(g) : sz_i x sz_j          (cross part)

with m_axis / M_2axis the 1-D / 2-D sums of |psi|^2 over the other axes. One
pass over the state computes ALL L magnetizations and all L^2 correlators
(the flat path costs one pass just for the probabilities, then a chunked
matmul; the reference loops scalars, src/Observables.jl:14-95).

Reference parity: magnetization_per_site (src/Observables.jl:14-36),
connected_correlations (:44-95), structure_factor_Sq (:101-110) on the kron
layout's states.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .ops.sector_kron import SectorKronLayout, _perm_sector_states, kron_part_perms
from .solvers.blockvec import BlockVec

__all__ = [
    "magnetization_per_site_kron",
    "szsz_matrix_kron",
    "connected_correlations_kron",
    "structure_factor_Sq_kron",
    "szsz_matrix_kron_sharded",
    "magnetization_per_site_kron_sharded",
    "bv_probs",
    "bv_site_moments",
    "bv_apply_sz",
    "bv_sz_q",
    "bv_sz_q_weights",
    "bv_sz_q_apply",
]


def _sz_tables(layout: SectorKronLayout):
    """Per part p, per part-magnetization k: [C_pad, L_p] matrix of Sz values
    (+-1/2) per INTERNAL rank (rotated part-bit order accounted for; pad rows
    zero). Cached on the layout."""
    cached = getattr(layout, "_sz_tables", None)
    if cached is not None:
        return cached
    L1, L2, L3 = layout.splits
    plen = (L1, L2, L3)
    perms = kron_part_perms(layout.splits)
    # padded axis lengths by part come from the group tuples
    ks = [set(), set(), set()]
    pad_of = [{}, {}, {}]
    for (k_h, k_m, k_l, ch, cm, cl, cmp, clp) in layout.groups:
        ks[0].add(k_l); ks[1].add(k_m); ks[2].add(k_h)
        pad_of[0][k_l] = clp; pad_of[1][k_m] = cmp; pad_of[2][k_h] = ch
    out = [{}, {}, {}]
    for p in range(3):
        for k in sorted(ks[p]):
            phys = _perm_sector_states(plen[p], k, perms[p]).astype(np.uint64)
            bits = ((phys[:, None] >> np.arange(plen[p], dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.float64) - 0.5
            M = np.zeros((pad_of[p][k], plen[p]))
            M[: bits.shape[0]] = bits
            out[p][k] = M
    layout._sz_tables = out
    return out


def bv_probs(x):
    """|psi|^2 leaves from a BlockVec, a (re, im) BlockVec pair, or complex
    leaves. bf16 states upcast to f32 (fused into the read pass): an
    N-term probability reduction accumulated at 8 mantissa bits is garbage."""
    def _f(l):
        return l.astype(jnp.float32) if l.dtype == jnp.bfloat16 else l

    if isinstance(x, tuple):
        re, im = x
        return [_f(r) * _f(r) + _f(i) * _f(i)
                for r, i in zip(re.leaves, im.leaves)]
    if jnp.iscomplexobj(x.leaves[0]):
        return [l.real**2 + l.imag**2 for l in x.leaves]
    return [_f(l) * _f(l) for l in x.leaves]


def _site_map(layout):
    """site -> (part, rel bit)."""
    L1, L2, L3 = layout.splits
    out = []
    for i in range(layout.L):
        if i < L1:
            out.append((0, i))
        elif i < L1 + L2:
            out.append((1, i - L1))
        else:
            out.append((2, i - L1 - L2))
    return out


def bv_site_moments(w_leaves, layout: SectorKronLayout) -> jax.Array:
    """[L] vector m_i = sum_states w(state) * sz_i(state) from per-group
    weight leaves `w` — ONE pass over the state computes the moment against
    ALL L sites via per-axis marginals (the observables_kron trick applied
    to a general weight: w = |psi|^2 gives magnetization; w = psi * v gives
    the KPM cross moments <psi| Sz_i |v> for every A-site at once,
    runners.kpm_correlation_matrix_kron).

    Works on SHARDED-form leaves ([D*b, cmp, clp]): the hi tables are
    zero-padded to the leaf's hi length and the [hi] @ [hi, L3] contraction
    partitions along the sharded axis (GSPMD inserts the psum)."""
    sz = _sz_tables(layout)
    L1, L2, L3 = layout.splits
    dtype = w_leaves[0].dtype
    parts = [jnp.zeros((L1,), dtype), jnp.zeros((L2,), dtype),
             jnp.zeros((L3,), dtype)]
    for w_leaf, (k_h, k_m, k_l, *_r) in zip(w_leaves, layout.groups):
        kp = (k_l, k_m, k_h)
        margs = (jnp.sum(w_leaf, axis=(0, 1)), jnp.sum(w_leaf, axis=(0, 2)),
                 jnp.sum(w_leaf, axis=(1, 2)))
        for p in range(3):
            S = sz[p][kp[p]]
            if p == 2 and S.shape[0] != w_leaf.shape[0]:
                S = np.pad(S, ((0, w_leaf.shape[0] - S.shape[0]), (0, 0)))
            parts[p] = parts[p] + margs[p] @ jnp.asarray(S, dtype)
    return jnp.concatenate(parts)


def magnetization_per_site_kron(x, layout: SectorKronLayout) -> jax.Array:
    """<Sz_i> per site from BlockVec (or (re, im) pair) state — one pass.

    Ref: src/Observables.jl:14-36 (threaded scalar loop)."""
    return bv_site_moments(bv_probs(x), layout)


def szsz_matrix_kron(x, layout: SectorKronLayout):
    """(SzSz[i, j], S_i): all pair correlators + magnetizations in one pass.

    Same-part pairs contract the 1-D axis marginal against sz_i*sz_j; cross-
    part pairs contract the 2-D marginal against sz_i x sz_j (tiny einsums —
    the only O(N) work is the marginal reductions). MXU/VPU replacement for
    the O(N L^2) loop at src/Observables.jl:66-72."""
    sz = _sz_tables(layout)
    L1, L2, L3 = layout.splits
    L = layout.L
    off = (0, L1, L1 + L2)
    probs = bv_probs(x)
    dtype = probs[0].dtype
    szsz = jnp.zeros((L, L), dtype)
    si_parts = [jnp.zeros((L1,), dtype), jnp.zeros((L2,), dtype),
                jnp.zeros((L3,), dtype)]
    for p_leaf, (k_h, k_m, k_l, *_r) in zip(probs, layout.groups):
        kp = (k_l, k_m, k_h)
        S = [jnp.asarray(sz[p][kp[p]], dtype) for p in range(3)]
        m1 = (jnp.sum(p_leaf, axis=(0, 1)), jnp.sum(p_leaf, axis=(0, 2)),
              jnp.sum(p_leaf, axis=(1, 2)))
        # same-part blocks (diagonal included: sz_i^2 = 1/4)
        lens = (L1, L2, L3)
        for p in range(3):
            si_parts[p] = si_parts[p] + m1[p] @ S[p]
            blk = jnp.einsum("r,ri,rj->ij", m1[p], S[p], S[p])
            szsz = szsz.at[off[p]: off[p] + lens[p],
                           off[p]: off[p] + lens[p]].add(blk)
        # cross-part blocks via 2-D marginals
        M_lm = jnp.sum(p_leaf, axis=0)   # [cmp, clp] = (m, l)
        M_hm = jnp.sum(p_leaf, axis=2)   # [ch, cmp] = (h, m)
        M_hl = jnp.sum(p_leaf, axis=1)   # [ch, clp] = (h, l)
        for (pa, pb, M2, eq) in ((0, 1, M_lm, "ml,li,mj->ij"),
                                 (1, 2, M_hm, "hm,mi,hj->ij"),
                                 (0, 2, M_hl, "hl,li,hj->ij")):
            blk = jnp.einsum(eq, M2, S[pa], S[pb])  # [L_pa, L_pb]
            szsz = szsz.at[off[pa]: off[pa] + lens[pa],
                           off[pb]: off[pb] + lens[pb]].add(blk)
            szsz = szsz.at[off[pb]: off[pb] + lens[pb],
                           off[pa]: off[pa] + lens[pa]].add(blk.T)
    return szsz, jnp.concatenate(si_parts)


def connected_correlations_kron(x, layout: SectorKronLayout) -> jax.Array:
    """C_r = (1/L) sum_i [<Sz_i Sz_{i+r}> - <Sz_i><Sz_{i+r}>], periodic wrap
    (ref: src/Observables.jl:44-95) on BlockVec states."""
    szsz, si = szsz_matrix_kron(x, layout)
    from .observables import _connected_from_szsz

    return _connected_from_szsz(szsz, si, layout.L)


def structure_factor_Sq_kron(x, layout: SectorKronLayout):
    """S(q) = FFT_r C_r at q = 2 pi n / L (ref: src/Observables.jl:101-110).

    The length-L FFT runs on HOST numpy: the relay backend cannot execute
    eager complex ops (creation included — CLAUDE.md), and C_r is L scalars.
    Returns host numpy arrays."""
    C_r = np.asarray(connected_correlations_kron(x, layout))
    S_q = np.real(np.fft.fft(C_r))
    q = 2.0 * np.pi * np.arange(layout.L) / layout.L
    return q, S_q


def bv_sz_q_weights(layout: SectorKronLayout, q: float, hi_lens=None,
                    dtype=np.float32):
    """Host-side per-group weight vectors of S^z_q (see bv_sz_q): a pytree
    [(cos_l, cos_m, cos_h, sin_l, sin_m, sin_h), ...] — pass as a jit
    ARGUMENT so one trace serves every q-point. hi_lens pads the hi vectors
    (sharded-form leaves: D*b rows). dtype=float64 for x64 validation."""
    sz = _sz_tables(layout)
    L1, L2, L3 = layout.splits
    s = 1.0 / np.sqrt(layout.L)
    sites = (np.arange(L1), L1 + np.arange(L2), L1 + L2 + np.arange(L3))
    out = []
    for gi, (k_h, k_m, k_l, ch, *_r) in enumerate(layout.groups):
        kp = (k_l, k_m, k_h)
        hi_len = ch if hi_lens is None else hi_lens[gi]

        def wvec(p, trig):
            v = sz[p][kp[p]] @ (s * trig(q * sites[p]))
            if p == 2 and v.shape[0] != hi_len:
                v = np.pad(v, (0, hi_len - v.shape[0]))
            return np.asarray(v, dtype)

        out.append(tuple(wvec(p, np.cos) for p in range(3))
                   + tuple(wvec(p, np.sin) for p in range(3)))
    return out


def bv_sz_q_apply(x, weights):
    """Apply bv_sz_q_weights to a BlockVec (or (re, im) pair): pure jnp,
    traceable with `weights` as an argument."""
    if isinstance(x, tuple):
        re_in, im_in = x
    else:
        re_in, im_in = x, None
    shapes = ([1, 1, -1], [1, -1, 1], [-1, 1, 1])
    out_r, out_i = [], []
    for gi, wv in enumerate(weights):
        r_leaf = re_in.leaves[gi]
        dtype = r_leaf.dtype
        wr = sum(jnp.asarray(wv[p]).astype(dtype).reshape(shapes[p])
                 for p in range(3))
        wi = sum(jnp.asarray(wv[3 + p]).astype(dtype).reshape(shapes[p])
                 for p in range(3))
        if im_in is None:
            out_r.append(r_leaf * wr)
            out_i.append(r_leaf * wi)
        else:
            i_leaf = im_in.leaves[gi]
            out_r.append(r_leaf * wr - i_leaf * wi)
            out_i.append(i_leaf * wr + r_leaf * wi)
    return BlockVec(out_r), BlockVec(out_i)


def bv_sz_q(x, layout: SectorKronLayout, q: float):
    """phi = S^z_q |psi> on BlockVec states, returned as an (re, im) pair.

    S^z_q = L^{-1/2} sum_r e^{iqr} Sz_r is DIAGONAL with a per-axis additive
    weight: w(h, m, l) = w_hi[h] + w_mid[m] + w_lo[l] with
    w_p[rank] = sum_rel cos/sin(q * site) * sz(rank, rel) — tiny per-part
    vectors from the Sz tables (same factorization as the kron diagonal).
    One fused elementwise pass per leaf; NO flat-vector round trip (the r3
    kpm_sqw_kron paid 2 relayout passes per q-point) and NO gather — on
    sharded-form leaves the hi weight broadcasts through GSPMD, sliced per
    device automatically (hi vectors are padded to the leaf hi length).

    x: real BlockVec or an (re, im) BlockVec pair. Ref: Sz_q_vector,
    src/Hamiltonian.jl:218-234 (whose threaded version ships a data race).
    For many q-points jit bv_sz_q_apply once and feed bv_sz_q_weights."""
    re0 = x[0] if isinstance(x, tuple) else x
    hi_lens = [l.shape[0] for l in re0.leaves]
    return bv_sz_q_apply(x, bv_sz_q_weights(layout, q, hi_lens))


def bv_apply_sz(x: BlockVec, layout: SectorKronLayout, site: int) -> BlockVec:
    """Sz_site |psi> on a BlockVec: a per-axis diagonal multiply (the kron
    analog of create_spin_operator(site, :z), src/Hamiltonian.jl:49-115).

    Works unchanged on SHARDED-form leaves ([D*b, cmp, clp], P(rows)): a
    hi-site weight vector is zero-padded to the leaf's hi length (pad rows
    are a null subspace) and the broadcast multiply is GSPMD-local."""
    sz = _sz_tables(layout)
    (p, rel) = _site_map(layout)[site]
    leaves = []
    for leaf, (k_h, k_m, k_l, *_r) in zip(x.leaves, layout.groups):
        kp = (k_l, k_m, k_h)
        vnp = sz[p][kp[p]][:, rel]
        if p == 2 and vnp.shape[0] != leaf.shape[0]:
            vnp = np.pad(vnp, (0, leaf.shape[0] - vnp.shape[0]))
        v = jnp.asarray(vnp, leaf.real.dtype
                        if jnp.iscomplexobj(leaf) else leaf.dtype)
        shape = ([1, 1, -1], [1, -1, 1], [-1, 1, 1])[p]
        leaves.append(leaf * v.reshape(shape).astype(leaf.dtype))
    return BlockVec(leaves)


def szsz_matrix_kron_sharded(x, spec, mesh, axis_name: str = "rows"):
    """(SzSz[i, j], S_i) from a BLOCK-DISTRIBUTED sharded kron state
    (parallel/sharded_kron_scaling layout) WITHOUT gathering it.

    `x` is a flat sharded vector [D*local_len], a BlockVec in sharded form
    (leaves [D*b_g, cmp, clp], P(rows)), or an (re, im) pair of such
    BlockVecs (the sharded evolution driver's state).

    Every marginal is linear in |psi|^2, so each device computes its
    contributions from its local hi-rows (hi-axis Sz tables sliced per
    device, like the sharded apply's diagonal) and ONE psum of the tiny
    (szsz, si) accumulators finishes the job — communication is O(L^2)
    scalars per measurement, independent of N (VERDICT r3 missing-3: the
    flat observables needed the full unsharded vector)."""
    import numpy as np
    from functools import partial

    import jax
    from jax.sharding import PartitionSpec as P

    from .solvers.blockvec import BlockVec

    lay = spec.layout
    sz = _sz_tables(lay)
    L1, L2, L3 = lay.splits
    L = lay.L
    off = (0, L1, L1 + L2)
    lens = (L1, L2, L3)

    if isinstance(x, tuple):
        kind = "pair"
        args = (tuple(x[0].leaves), tuple(x[1].leaves))
        in_specs = ((P(axis_name),) * len(lay.groups),) * 2
    elif isinstance(x, BlockVec):
        kind = "leaves"
        args = (tuple(x.leaves),)
        in_specs = ((P(axis_name),) * len(lay.groups),)
    else:
        kind = "flat"
        args = (x,)
        in_specs = (P(axis_name),)

    def local(*blk):
        d = jax.lax.axis_index(axis_name).astype(jnp.int32)
        szsz = jnp.zeros((L, L), jnp.float32)
        si_parts = [jnp.zeros((L1,), jnp.float32),
                    jnp.zeros((L2,), jnp.float32),
                    jnp.zeros((L3,), jnp.float32)]
        for gi, (k_h, k_m, k_l, ch, cm, cl, cmp, clp) in enumerate(lay.groups):
            lo = spec.local_offsets[gi]
            b = spec.b[gi]
            if kind == "flat":
                T = blk[0][lo: lo + b * cmp * clp].reshape(b, cmp, clp)
                p_leaf = (T * T).astype(jnp.float32)
            elif kind == "leaves":
                T = blk[0][gi].astype(jnp.float32)
                p_leaf = T * T
            else:
                r = blk[0][gi].astype(jnp.float32)
                i = blk[1][gi].astype(jnp.float32)
                p_leaf = r * r + i * i
            kp = (k_l, k_m, k_h)
            S = [jnp.asarray(sz[p][kp[p]], jnp.float32) for p in range(3)]
            # device-local rows of the hi table (pad like the sharded diag)
            Sh = jnp.pad(S[2], ((0, spec.ch_pad[gi] - S[2].shape[0]), (0, 0)))
            Sh = jax.lax.dynamic_slice(
                Sh, ((d * b).astype(jnp.int32), jnp.int32(0)), (b, L3))
            S = [S[0], S[1], Sh]
            m1 = (jnp.sum(p_leaf, axis=(0, 1)), jnp.sum(p_leaf, axis=(0, 2)),
                  jnp.sum(p_leaf, axis=(1, 2)))
            for p in range(3):
                si_parts[p] = si_parts[p] + m1[p] @ S[p]
                blk2 = jnp.einsum("r,ri,rj->ij", m1[p], S[p], S[p])
                szsz = szsz.at[off[p]: off[p] + lens[p],
                               off[p]: off[p] + lens[p]].add(blk2)
            M_lm = jnp.sum(p_leaf, axis=0)
            M_hm = jnp.sum(p_leaf, axis=2)
            M_hl = jnp.sum(p_leaf, axis=1)
            for (pa, pb, M2, eq) in ((0, 1, M_lm, "ml,li,mj->ij"),
                                     (1, 2, M_hm, "hm,mi,hj->ij"),
                                     (0, 2, M_hl, "hl,li,hj->ij")):
                blk2 = jnp.einsum(eq, M2, S[pa], S[pb])
                szsz = szsz.at[off[pa]: off[pa] + lens[pa],
                               off[pb]: off[pb] + lens[pb]].add(blk2)
                szsz = szsz.at[off[pb]: off[pb] + lens[pb],
                               off[pa]: off[pa] + lens[pa]].add(blk2.T)
        si = jnp.concatenate(si_parts)
        return (jax.lax.psum(szsz, axis_name),
                jax.lax.psum(si, axis_name))

    cache = getattr(spec, "_szsz_jit_cache", None)
    if cache is None:
        cache = spec._szsz_jit_cache = {}
    key = (mesh, axis_name, kind)
    if key not in cache:
        # cache the jitted shard_map per (spec, mesh, axis, input kind): a
        # fresh closure per call would retrace (and remote-recompile) every
        # measurement
        cache[key] = jax.jit(jax.shard_map(
            local, mesh=mesh, in_specs=in_specs, out_specs=(P(), P())))
    return cache[key](*args)


def magnetization_per_site_kron_sharded(x, spec, mesh,
                                        axis_name: str = "rows"):
    """<Sz_i> from a block-distributed sharded kron state (no gather)."""
    _, si = szsz_matrix_kron_sharded(x, spec, mesh, axis_name)
    return si


# every observable here is diagonal in the Sz basis (|psi|^2 only)
for _f in (magnetization_per_site_kron, szsz_matrix_kron,
           connected_correlations_kron, structure_factor_Sq_kron):
    _f.diagonal_in_z = True
del _f
