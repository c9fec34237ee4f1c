"""3-way Kronecker-factorized compact-sector matvec: every bond is an MXU matmul.

The 2-way `sector_blocked` layout (ops/sector_blocked.py) folds lo-part bonds
into one dense matmul but leaves hi-part bonds as per-bond row gathers — at
L >= 28 those gathers dominate (each is a full pass over the state). This
layout splits the chain's bits into THREE parts, lo [0, L1), mid [L1, L1+L2),
hi [L1+L2, L), and orders the U(1)-sector basis by (k_hi, k_mid) groups: each
group is a rank-3 tensor

    G[k_hi, k_mid]  of shape  [C(L3, k_hi), C(L2, k_mid), C(L1, k_lo)],

with k_lo = nup - k_hi - k_mid.  Under this decomposition (the MPO view of H
over a 3-way sublattice coding):

  - a bond with both bits in ONE part folds — together with every other such
    bond — into that part's dense sector operator  W_part[k]  [C, C]; applying
    it is a single contraction of the corresponding tensor axis (an MXU matmul
    for lo/hi; a batched matmul for mid).
  - a bond CROSSING two parts factorizes into two direction terms (S+S- and
    S-S+), each a product of two rectangular ONE-HOT matrices acting on the two
    touched axes (a single-bit flip within a part is a masked rank permutation
    that changes the part's magnetization by +-1, i.e. maps group -> group).
    Bonds sharing the same second-part bit merge: sum_i J_ij U_i is dense on
    the first axis, one matrix pair per (part-pair, bit j, direction).

So the ENTIRE off-diagonal apply is matmuls — zero gathers, exact (one-hot
rows select a single product), and sharding-friendly (the hi axis of each
group is a clean row-partition axis; the hi contraction is a plain sharded
matmul). Memory is C(L, nup) amplitudes (plus tile padding, below) and
O(C_part^2) tables.

TILE PADDING: group tensors live inside ONE flat state vector; a flat->3D
reshape is free only when the minor dims match the TPU (8, 128) tile, and
measured relayout penalties otherwise reach 3-4x of the whole apply. So each
group's (C_m, C_l) is zero-padded to (mult of 8, mult of 128): reshapes become
bitcasts, group offsets are 1024-aligned, and every operator (W, one-hot
factors, diag) is zero on pad slots, which keeps pad amplitudes EXACTLY zero —
the same invariant-null-subspace trick the embedded layout uses
(model.valid_mask masks random starts; pad slots carry state sentinel
0xFFFFFFFF whose popcount can never equal nup). Measured overhead: 12-28%
memory/bandwidth, against the eliminated relayouts.

Reference parity: this implements apply_H! (src/Hamiltonian.jl:119-184)
restricted to a magnetization sector, replacing the Dict-lookup scatter loop.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .. import basis as basis_mod
from ..model import SpinModel
from .sector_blocked import _lo_offdiag_dense, _sector_states

__all__ = [
    "SectorKronLayout",
    "make_sector_kron_layout",
    "apply_H_sector_kron",
    "sector_kron_tables",
    "kron_order_states",
    "kron_rank",
    "default_kron_splits",
    "kron_split_argmin",
]


# v5e-calibrated roofline constants (scripts/mxu_calibrate.py; bench.py uses
# the same defaults). Used only to RANK candidate splits — the crossover
# between the MXU and HBM terms is what matters, not absolute accuracy.
_SPLIT_COST_TFLOPS = 35.5e12
_SPLIT_COST_HBM_BW = 819e9


def _kron_split_cost(L: int, nup: int, splits, itemsize: int = 4
                     ) -> tuple[float, int]:
    """(roofline-seconds proxy, padded elements) of one apply under `splits`.

    Cost = max(matmul flops / MXU rate, 2 state passes / HBM bw) — the kron
    apply is MXU-bound at L >= 26 and HBM/padding-bound below. Flop model:
    the W contraction of each part costs 2*size*C_part per group (the part's
    sector operator is dense [C, C] on that axis, padded to the tile); the two
    chain-boundary cross bonds cost ~2*size*(clp + cmp) (dense on the first
    axis of each touched pair). Validated against the exact
    `kron_apply_flops` on built layouts at L=16-32: same argmin at every L,
    rank swaps only between near-tied mid-list candidates.

    `itemsize` is the amplitude width in bytes for the HBM term (4 = f32
    default; pass 2 when ranking splits for the bf16 amplitude mode — the
    MXU/HBM crossover, and hence the ranking, can differ at half traffic)."""
    L1, L2, L3 = splits
    flops = 0
    padded = 0
    for kh in range(max(0, nup - L1 - L2), min(L3, nup) + 1):
        for km in range(max(0, nup - kh - L1), min(L2, nup - kh) + 1):
            kl = nup - kh - km
            if kl < 0 or kl > L1:
                continue
            ch = math.comb(L3, kh)
            cm = math.comb(L2, km)
            cl = math.comb(L1, kl)
            cmp_ = -(-cm // 8) * 8
            clp = -(-cl // 128) * 128
            size = ch * cmp_ * clp
            padded += size
            w = 0
            if 0 < kl < L1:
                w += clp
            if 0 < km < L2:
                w += cmp_
            if 0 < kh < L3:
                w += ch
            w += clp + cmp_  # lo|mid and mid|hi boundary bonds
            flops += 2 * size * w
    return (max(flops / _SPLIT_COST_TFLOPS,
                2 * padded * itemsize / _SPLIT_COST_HBM_BW), padded)


def kron_split_argmin(L: int, nup: int | None = None,
                      itemsize: int = 4) -> tuple[int, int, int]:
    """Flop-argmin split under `_kron_split_cost` — an ANALYSIS TOOL, not the
    default. The search space is restricted to L1 with C(L1, L1//2) <= 512
    (the same lane cap as `default_kron_splits` — wider lo parts exceed the
    lane-axis matmul sweet spot AND the kernel's VMEM table budget), so this
    is the argmin over the deployable splits, not over all 3-partitions.
    Requires L >= 4 (a valid 3-way split with L1 >= 2 must exist).

    Measured on the v5e (round 3, fused kernel, warm cache):

        L=32 (11,11,10) -> (10,11,11): predicted 1.14x, MEASURED 0.88x
             (160.4 -> 141.8 Gnnz/s)
        L=28 (11, 9, 8) -> (10, 8,10): predicted 1.43x, MEASURED 0.97x
             (170.0 -> 165.1 Gnnz/s)
        bf16 L=32: 328.6 -> 307.6 Gnnz/s

    i.e. rebalancing the parts to cut matmul flops LOSES on the real kernel
    at every measured point: the fused kernel's throughput at lane-512 /
    short-hi group shapes exceeds what a flop model predicts by more than the
    flop savings (the 3-pass f32-grade dots at [*, 512] sustain much higher
    MXU utilization than at [*, 256], and fewer, fatter hi rows amortize the
    per-grid-step overhead). So `default_kron_splits` keeps the
    largest-lo-with-C<=512 heuristic; this argmin stays available for
    profiling other-hardware or future-kernel hypotheses
    (scripts/bench_kron.py SPLITS=... measures any explicit split)."""
    if nup is None:
        nup = L // 2
    if L < 4:
        raise ValueError(
            f"kron_split_argmin needs L >= 4 (no valid 3-way split with "
            f"L1 >= 2 exists at L={L}); use default_kron_splits or a "
            "non-kron layout for tiny chains")
    best = None
    for L1 in range(2, L - 1):
        if math.comb(L1, L1 // 2) > 512:
            break
        for L2 in range(1, L - L1):
            L3 = L - L1 - L2
            cost = _kron_split_cost(L, nup, (L1, L2, L3), itemsize)
            key = (cost, (L1, L2, L3))
            if best is None or key < best:
                best = key
    return best[1]


@lru_cache(maxsize=None)
def default_kron_splits(L: int, nup: int | None = None) -> tuple[int, int, int]:
    """(L1, L2, L3): largest lo part with C(L1, L1//2) <= 512 (the MXU sweet
    spot for the lane-axis matmul), remainder split mid >= hi.

    `nup` is accepted for API symmetry with `kron_split_argmin` (and so
    callers/monkeypatches can swap the two) but is NOT used: the heuristic is
    sector-independent. Its C(L1, L1//2) sweet spot assumes nup ~ L/2; for
    strongly polarized sectors measure alternatives via
    scripts/bench_kron.py SPLITS=... before trusting any model.

    Measured-best on the v5e fused kernel at every bench point — see
    `kron_split_argmin` for the round-3 split study showing flop-balanced
    alternatives lose on chip despite up to 1.5x fewer matmul flops."""
    L1 = 2
    while L1 + 1 <= L - 2 and math.comb(L1 + 1, (L1 + 1) // 2) <= 512:
        L1 += 1
    rest = L - L1
    L3 = rest // 2
    L2 = rest - L3
    return (L1, L2, L3)


PAD_SENTINEL = np.uint32(0xFFFFFFFF)  # popcount 32 > any L-site nup
DEFAULT_PADS = (8, 128)  # (sublane, lane) tile of f32


def _pad_up(n, m):
    return -(-n // m) * m


def kron_part_perms(splits) -> tuple:
    """Per-part internal bit permutations: perm[p][rel] = internal position.

    Parts 1 (mid) and 2 (hi) enumerate their sector states over ROTATED bit
    order (physical bit 0 -> internal top, physical bit r -> internal r-1).
    Flipping the internal TOP bit of a combinadic enumeration is a single
    contiguous block shift (ascending order puts top-bit-0 states first), and
    flipping the 2nd-top bit is two block shifts — so for a nearest-neighbour
    chain every part-crossing bond's flip factor on the mid/hi axes becomes a
    SLICE COPY on a major tensor dimension (pure bandwidth) instead of a
    [C, C] one-hot matmul (see _as_runs / apply). The lo part keeps natural
    order: its axis lives in lane space where sub-128 slices relayout, so its
    factors stay matmuls regardless.

    The choice is bond-independent (a function of splits alone), keeping the
    kron state ORDER a property of (L, nup, splits, pads) — bonds touching
    interior bits simply fail run detection and fall back to matmuls."""
    L1, L2, L3 = splits

    def rot(Lp):
        if Lp < 2:
            return tuple(range(Lp))
        return tuple((r - 1) % Lp for r in range(Lp))

    return (tuple(range(L1)), rot(L2), rot(L3))


def _perm_sector_states(Lp, k, perm):
    """Physical sub-state values in INTERNAL (permuted-bit combinadic) order."""
    ss = _sector_states(Lp, k).astype(np.uint64)
    if tuple(perm) == tuple(range(Lp)):
        return ss
    phys = np.zeros_like(ss)
    for rel in range(Lp):
        phys |= ((ss >> np.uint64(perm[rel])) & np.uint64(1)) << np.uint64(rel)
    return phys


def _as_runs(U, max_runs: int = 8):
    """Decompose a sparse factor into contiguous block shifts.

    Returns [(row0, col0, length, value), ...] covering all nonzeros of U with
    runs of constant column-row offset and constant value, or None if more
    than max_runs are needed (dense/irregular factor -> keep the matmul).
    A run means out[..., col0:col0+length, ...] += value * in[..., row0:...]
    on a major tensor axis — pure bandwidth, and under a sharded hi axis a
    static send/recv row set (the ragged halo of SURVEY.md §2.3)."""
    rows, cols = np.nonzero(U)
    if rows.size == 0:
        return []
    vals = U[rows, cols]
    runs = []
    order = np.lexsort((rows, cols - rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    start = 0
    for i in range(1, rows.size + 1):
        boundary = (
            i == rows.size
            or cols[i] - rows[i] != cols[start] - rows[start]
            or vals[i] != vals[start]
            or rows[i] != rows[i - 1] + 1
        )
        if boundary:
            runs.append((int(rows[start]), int(cols[start]),
                         int(i - start), float(vals[start])))
            if len(runs) > max_runs:
                return None
            start = i
    return runs


def _group_list(L, nup, splits, pads=DEFAULT_PADS):
    """Ordered [(k_h, k_m, k_l, C_h, C_m, C_l, C_m_pad, C_l_pad)] over valid
    (k_h, k_m)."""
    L1, L2, L3 = splits
    pm, pl = pads
    out = []
    for k_h in range(0, min(L3, nup) + 1):
        for k_m in range(0, min(L2, nup - k_h) + 1):
            k_l = nup - k_h - k_m
            if not 0 <= k_l <= L1:
                continue
            cm = math.comb(L2, k_m)
            cl = math.comb(L1, k_l)
            out.append((k_h, k_m, k_l, math.comb(L3, k_h), cm, cl,
                        _pad_up(cm, pm), _pad_up(cl, pl)))
    return out


def kron_order_states(L: int, nup: int, splits, pads=DEFAULT_PADS) -> np.ndarray:
    """uint32 states in ((k_h, k_m) group, rank_h, rank_m, rank_l) order,
    PAD_SENTINEL in tile-padding slots. Part ranks follow kron_part_perms
    (mid/hi in rotated-bit internal order — see that docstring)."""
    L1, L2, L3 = splits
    perms = kron_part_perms(splits)
    parts = []
    for (k_h, k_m, k_l, ch, cm, cl, cmp, clp) in _group_list(L, nup, splits,
                                                             pads):
        his = _perm_sector_states(L3, k_h, perms[2]).astype(np.uint64)
        mids = _perm_sector_states(L2, k_m, perms[1]).astype(np.uint64)
        los = _perm_sector_states(L1, k_l, perms[0]).astype(np.uint64)
        blk = ((his[:, None, None] << np.uint64(L1 + L2))
               | (mids[None, :, None] << np.uint64(L1))
               | los[None, None, :]).astype(np.uint32)
        if (cmp, clp) != (cm, cl):
            blk = np.pad(blk, ((0, 0), (0, cmp - cm), (0, clp - cl)),
                         constant_values=PAD_SENTINEL)
        parts.append(blk.reshape(-1))
    return np.concatenate(parts)


def kron_states_device(L: int, nup: int, splits, pads=DEFAULT_PADS) -> jax.Array:
    """On-device uint32 states in kron order (PAD_SENTINEL in padding slots).

    Used by lean models (states not materialized) for observables/masks; the
    per-part enumerations are tiny, only the N-sized assembly runs on device."""
    L1, L2, L3 = splits
    pads = DEFAULT_PADS if pads is None else pads
    perms = kron_part_perms(splits)
    groups = _group_list(L, nup, splits, pads)
    triples = tuple(
        (jnp.asarray(_perm_sector_states(L3, k_h, perms[2]).astype(np.uint32)),
         jnp.asarray(_perm_sector_states(L2, k_m, perms[1]).astype(np.uint32)),
         jnp.asarray(_perm_sector_states(L1, k_l, perms[0]).astype(np.uint32)))
        for (k_h, k_m, k_l, *_r) in groups
    )

    @jax.jit
    def build():
        parts = []
        for (his, mids, los), g in zip(triples, groups):
            (_, _, _, ch, cm, cl, cmp, clp) = g
            blk = ((his[:, None, None].astype(jnp.uint32)
                    << np.uint32(L1 + L2))
                   | (mids[None, :, None].astype(jnp.uint32) << np.uint32(L1))
                   | los[None, None, :].astype(jnp.uint32))
            blk = jnp.pad(blk, ((0, 0), (0, cmp - cm), (0, clp - cl)),
                          constant_values=PAD_SENTINEL)
            parts.append(blk.reshape(-1))
        return jnp.concatenate(parts)

    return build()


def kron_rank(state: int, L: int, nup: int, splits, pads=DEFAULT_PADS) -> int:
    """Host rank of a state in the kron order (replaces the Dict idxmap)."""
    L1, L2, L3 = splits
    perms = kron_part_perms(splits)

    def internal(sub, Lp, perm):
        v = 0
        for rel in range(Lp):
            v |= ((sub >> rel) & 1) << perm[rel]
        return v

    lo = internal(state & ((1 << L1) - 1), L1, perms[0])
    mid = internal((state >> L1) & ((1 << L2) - 1), L2, perms[1])
    hi = internal(state >> (L1 + L2), L3, perms[2])
    k_h = bin(hi).count("1")
    k_m = bin(mid).count("1")
    off = 0
    for (gkh, gkm, gkl, ch, cm, cl, cmp, clp) in _group_list(L, nup, splits,
                                                             pads):
        if (gkh, gkm) == (k_h, k_m):
            return (off
                    + (basis_mod.rank_state(hi, L3, k_h) * cmp
                       + basis_mod.rank_state(mid, L2, k_m)) * clp
                    + basis_mod.rank_state(lo, L1, gkl))
        off += ch * cmp * clp
    raise ValueError(f"state {state:#x} not in sector nup={nup}")


def _flip_matrix(Lp: int, k_src: int, p: int, v: int):
    """One-hot [C(Lp,k_src), C(Lp,k_dst)] for flipping bit p when it equals v.

    v=1: S-_p (k -> k-1); v=0: S+_p (k -> k+1). None if k_dst out of range or
    no source state has bit p == v."""
    k_dst = k_src - 1 if v == 1 else k_src + 1
    if not 0 <= k_dst <= Lp:
        return None
    S = _sector_states(Lp, k_src).astype(np.int64)
    D = _sector_states(Lp, k_dst).astype(np.int64)
    valid = ((S >> p) & 1) == v
    if not valid.any():
        return None
    U = np.zeros((S.shape[0], D.shape[0]), np.float64)
    dst = np.searchsorted(D, S[valid] ^ (1 << p))
    U[np.nonzero(valid)[0], dst] = 1.0
    return U


class SectorKronLayout:
    """Static structure of the 3-way layout for one (L, nup, bonds) model."""

    def __init__(self, L, nup, splits, pads, groups, offsets, W, cross_meta,
                 cross_pool, diag_vecs=None, diag_cross=None,
                 cross_runs=None, cross_shapes=None):
        self.L, self.nup, self.splits, self.pads = L, nup, splits, pads
        # groups: [(k_h, k_m, k_l, C_h, C_m, C_l, C_m_pad, C_l_pad)]
        self.groups = groups
        self.offsets = offsets          # [int] per group (padded strides)
        self.W = W                      # [W_lo, W_mid, W_hi]: dict k -> np [Cp, Cp]
        # cross_meta: [g_dst] -> [(g_src, part_a, part_b, a_key, b_key)];
        # cross_pool: {key: np matrix} — one-hot factors deduped across groups
        # (a factor depends only on (spec, k_src), not on the group pair; the
        # per-pair copies would be ~400 MB at L=32 and the remote compiler
        # serializes captured constants into its request)
        self.cross_meta = cross_meta
        self.cross_pool = cross_pool
        # cross_runs: {key: [(row0, col0, len, val)]} for factors on the
        # mid/hi axes that are contiguous block shifts (see _as_runs); such
        # keys are ABSENT from cross_pool — they apply as slice adds, not
        # matmuls. cross_shapes keeps (rows, cols) for every key.
        self.cross_runs = cross_runs or {}
        self.cross_shapes = cross_shapes or {}
        # factored diagonal (see sector_kron_tables): per-part [C_pad] vectors
        # whose broadcast outer sum is the group diagonal, plus cross-part ZZ
        # rank-1 terms. Replaces reading an N-sized diag vector every apply.
        self.diag_vecs = diag_vecs or [{}, {}, {}]
        self.diag_cross = diag_cross or []  # [(pa, pb, {k: J*sz_a}, {k: sz_b})]
        self._dev = None

    @property
    def n_states(self):
        """Flat state-vector length INCLUDING tile padding."""
        return sum(ch * cmp * clp
                   for (_, _, _, ch, _, _, cmp, clp) in self.groups)

    @property
    def n_basis(self):
        """Exact sector dimension C(L, nup)."""
        return sum(ch * cm * cl
                   for (_, _, _, ch, cm, cl, _, _) in self.groups)


def _pad_mat(M, rows, cols):
    if M.shape == (rows, cols):
        return M
    out = np.zeros((rows, cols), M.dtype)
    out[: M.shape[0], : M.shape[1]] = M
    return out


@lru_cache(maxsize=None)
def _cached_kron_layout(L, nup, splits, hop_sites, hop_J_key, pads,
                        field_key=(), zz_sites=(), zz_J_key=()):
    L1, L2, L3 = splits
    if L1 + L2 + L3 != L or min(L1, L2, L3) < 1:
        raise ValueError(f"bad splits {splits} for L={L}")
    hop_J = np.asarray(hop_J_key, np.float64)
    start = [0, L1, L1 + L2]
    plen = [L1, L2, L3]
    perms = kron_part_perms(splits)  # physical rel bit -> internal position

    def part_of(bit):
        return 0 if bit < L1 else (1 if bit < L1 + L2 else 2)

    within = {0: [], 1: [], 2: []}
    # (pa, pb, rel_j, dir) -> [(rel_i, J)];  dir=+1: bit i 1->0, bit j 0->1
    # (rel bits stored INTERNAL: translated through the part permutation)
    cross_specs = {}
    for b, (si, sj) in enumerate(hop_sites):
        i, j = min(si, sj), max(si, sj)
        J = float(hop_J[b])
        pa, pb = part_of(i), part_of(j)
        if pa == pb:
            within[pa].append((perms[pa][i - start[pa]],
                               perms[pa][j - start[pa]], J))
        else:
            for d in (+1, -1):
                cross_specs.setdefault(
                    (pa, pb, perms[pb][j - start[pb]], d), []
                ).append((perms[pa][i - start[pa]], J))

    pm, pl = pads

    def pdim(p, k):
        """Padded axis length of part p at part-magnetization k."""
        c = math.comb(plen[p], k)
        return c if p == 2 else _pad_up(c, pm if p == 1 else pl)

    groups = _group_list(L, nup, splits, pads)
    offsets, off = [], 0
    key_index = {}
    for gi, (k_h, k_m, k_l, ch, cm, cl, cmp, clp) in enumerate(groups):
        offsets.append(off)
        key_index[(k_h, k_m)] = gi
        off += ch * cmp * clp

    # within-part dense sector operators, per occurring part-magnetization,
    # zero-padded to the tile-padded axis lengths (pad slots stay exactly zero)
    W = [{}, {}, {}]
    for p in range(3):
        if not within[p]:
            continue
        # part-p magnetization per group tuple: p=0 -> k_l (g[2]),
        # p=1 -> k_m (g[1]), p=2 -> k_h (g[0])
        ks = sorted({g[[2, 1, 0][p]] for g in groups})
        for k in ks:
            # f64 tables: J values stay exact under x64 validation; device
            # conversion downcasts to f32 where x64 is off (TPU)
            Wk = _lo_offdiag_dense(plen[p], k, within[p], dtype=np.float64)
            if np.any(Wk):
                W[p][k] = _pad_mat(Wk, pdim(p, k), pdim(p, k))

    # cross contributions, grouped by DESTINATION group; factor matrices are
    # pooled by (spec, part, k_src) — identical across the many group pairs
    # that share a part-magnetization
    cross_meta = [[] for _ in groups]
    cross_pool = {}
    key_part = {}
    for si, ((pa, pb, rel_j, d), terms) in enumerate(sorted(cross_specs.items())):
        va = 1 if d == +1 else 0
        vb = 1 - va
        for g_src, (k_h, k_m, k_l, ch, cm, cl, cmp, clp) in enumerate(groups):
            kp = [k_l, k_m, k_h]  # per-part magnetization, indexed by part
            a_key = (si, 0, kp[pa])
            b_key = (si, 1, kp[pb])
            if a_key not in cross_pool:
                A = None
                for (rel_i, J) in terms:
                    U = _flip_matrix(plen[pa], kp[pa], rel_i, va)
                    if U is not None:
                        A = J * U if A is None else A + J * U
                cross_pool[a_key] = (
                    None if A is None or not np.any(A)
                    else _pad_mat(A, pdim(pa, kp[pa]), pdim(pa, kp[pa] - d))
                )
            if cross_pool[a_key] is None:
                continue
            if b_key not in cross_pool:
                B = _flip_matrix(plen[pb], kp[pb], rel_j, vb)
                cross_pool[b_key] = (
                    None if B is None
                    else _pad_mat(B, pdim(pb, kp[pb]), pdim(pb, kp[pb] + d))
                )
            if cross_pool[b_key] is None:
                continue
            kp_dst = list(kp)
            kp_dst[pa] -= d
            kp_dst[pb] += d
            g_dst = key_index.get((kp_dst[2], kp_dst[1]))
            if g_dst is None:
                continue
            cross_meta[g_dst].append((g_src, pa, pb, a_key, b_key))
            key_part[a_key] = pa
            key_part[b_key] = pb
    cross_pool = {k: v for k, v in cross_pool.items() if v is not None}
    used = {k for metas in cross_meta for (_, _, _, ak, bk) in metas
            for k in (ak, bk)}
    cross_pool = {k: v for k, v in cross_pool.items() if k in used}

    # classify factors: mid/hi-axis factors that are contiguous block shifts
    # (guaranteed for chain-boundary bits under kron_part_perms) apply as
    # slice adds on a MAJOR tensor dim — pure bandwidth, zero matmul flops,
    # and a static send/recv row set under a sharded hi axis. Lane-axis (lo)
    # factors stay matmuls: sub-128 lane slices relayout on TPU.
    cross_runs = {}
    cross_shapes = {k: v.shape for k, v in cross_pool.items()}
    for k in list(cross_pool):
        if key_part[k] == 0:
            continue
        runs = _as_runs(cross_pool[k])
        if runs is not None:
            cross_runs[k] = runs
            del cross_pool[k]

    # ---- factored diagonal -------------------------------------------------
    # diag[h, m, l] = d_hi[rank_h] + d_mid[rank_m] + d_lo[rank_l]
    #                 + sum_{cross zz bonds} J * sz_i[rank_a] * sz_j[rank_b]
    # (per group; replaces an N-sized diag read with O(C_part) vectors).
    field = np.zeros(L) if not field_key else np.asarray(field_key, np.float64)
    zz_J = np.asarray(zz_J_key, np.float64)
    part_ks = [sorted({g[[2, 1, 0][p]] for g in groups}) for p in range(3)]

    def _sz(p, k, rel):
        S = _sector_states(plen[p], k).astype(np.int64)
        return ((S >> rel) & 1).astype(np.float64) - 0.5

    def _padvec(v, p, k):
        out = np.zeros(pdim(p, k))
        out[: v.shape[0]] = v
        return out

    within_zz = {0: [], 1: [], 2: []}
    cross_zz = []
    for b, (si, sj) in enumerate(zz_sites):
        i, j = min(si, sj), max(si, sj)
        J = float(zz_J[b])
        pa, pb = part_of(i), part_of(j)
        if pa == pb:
            within_zz[pa].append((perms[pa][i - start[pa]],
                                  perms[pa][j - start[pa]], J))
        else:
            cross_zz.append((pa, pb, perms[pa][i - start[pa]],
                             perms[pb][j - start[pb]], J))

    diag_vecs = [{}, {}, {}]
    for p in range(3):
        for k in part_ks[p]:
            d = np.zeros(math.comb(plen[p], k))
            for rel in range(plen[p]):
                h = field[start[p] + rel]
                if h != 0.0:
                    d = d + h * _sz(p, k, perms[p][rel])
            for (ri, rj, J) in within_zz[p]:
                d = d + J * _sz(p, k, ri) * _sz(p, k, rj)
            if np.any(d):
                diag_vecs[p][k] = _padvec(d, p, k)

    diag_cross = []
    for (pa, pb, ri, rj, J) in cross_zz:
        va = {k: _padvec(J * _sz(pa, k, ri), pa, k) for k in part_ks[pa]}
        vb = {k: _padvec(_sz(pb, k, rj), pb, k) for k in part_ks[pb]}
        diag_cross.append((pa, pb, va, vb))

    return SectorKronLayout(L, nup, splits, pads, groups, offsets, W,
                            cross_meta, cross_pool, diag_vecs, diag_cross,
                            cross_runs, cross_shapes)


def make_sector_kron_layout(model_or_args, splits=None, pads=DEFAULT_PADS,
                            field=None, zz_sites=(), zz_J=()) -> SectorKronLayout:
    """Layout for a SpinModel (field/zz taken from it) or an args tuple
    (L, nup, hop_sites, hop_J) with field/zz passed separately."""
    if isinstance(model_or_args, SpinModel):
        m = model_or_args
        if m.nup is None:
            raise ValueError("sector_kron requires a sector (nup set)")
        L, nup = m.L, m.nup
        hop_sites = m.hop_sites
        hop_J = tuple(np.asarray(m.hop_J, np.float64).tolist())
        field = tuple(np.asarray(m.field, np.float64).tolist())
        zz_sites = m.zz_sites
        zz_J = tuple(np.asarray(m.zz_J, np.float64).tolist())
        if splits is None:
            splits = m.kron_splits
    else:
        L, nup, hop_sites, hop_J = model_or_args
        hop_J = tuple(hop_J)
    if splits is None:
        splits = default_kron_splits(L, nup)
    field_key = () if field is None else tuple(np.asarray(field, np.float64).tolist())
    if field_key and not any(field_key):
        field_key = ()
    return _cached_kron_layout(L, nup, tuple(splits), tuple(hop_sites), hop_J,
                               tuple(pads), field_key, tuple(zz_sites),
                               tuple(np.asarray(zz_J, np.float64).tolist()))


def flat_to_blocks(psi: jax.Array, layout: SectorKronLayout) -> list:
    """Flat kron-order vector -> per-group rank-3 tensors (one relayout each;
    do this once at a solve boundary, not per apply)."""
    out = []
    for gi, (_, _, _, ch, _, _, cmp, clp) in enumerate(layout.groups):
        o = layout.offsets[gi]
        out.append(psi[o: o + ch * cmp * clp].reshape(ch, cmp, clp))
    return out


def blocks_to_flat(blocks, layout: SectorKronLayout) -> jax.Array:
    """Inverse of flat_to_blocks."""
    return jnp.concatenate([b.reshape(-1) for b in blocks])


def kron_apply_flops(layout: SectorKronLayout) -> int:
    """Exact matmul flop count of one apply_H_sector_kron (2*m*n*k per
    contraction), mirroring the apply's A/B ordering decision. This is the
    honest MXU-roofline denominator for bench.py — the r1 bench overcounted
    the second cross contraction by using the SOURCE size instead of the
    intermediate's (VERDICT r1)."""
    fl = 0
    for gi, (k_h, k_m, k_l, ch, cm, cl, cmp, clp) in enumerate(layout.groups):
        size = ch * cmp * clp
        for p, k in ((0, k_l), (1, k_m), (2, k_h)):
            W = layout.W[p].get(k)
            if W is not None:
                fl += 2 * size * W.shape[1]
        for (g_src, pa, pb, a_key, b_key) in layout.cross_meta[gi]:
            (_, _, _, chs, _, _, cmps, clps) = layout.groups[g_src]
            ssz = chs * cmps * clps
            runs_a = layout.cross_runs.get(a_key)
            runs_b = layout.cross_runs.get(b_key)
            if runs_a is not None and runs_b is not None:
                continue  # pure slice adds, no matmul flops
            if runs_a is not None or runs_b is not None:
                runs, pr = (runs_a, pa) if runs_a is not None else (runs_b, pb)
                m_key = b_key if runs_a is not None else a_key
                M = layout.cross_pool[m_key]
                ax = chs if pr == 2 else cmps
                for (_r0, _c0, ln, _v) in runs:
                    fl += 2 * (ssz // ax) * ln * M.shape[1]
                continue
            A = layout.cross_pool[a_key]
            B = layout.cross_pool[b_key]
            fa = ssz * A.shape[1] * (1.0 + B.shape[1] / A.shape[0])
            fb = ssz * B.shape[1] * (1.0 + A.shape[1] / B.shape[0])
            fl += int(2 * min(fa, fb))
    return fl


def default_fused_topk(layout: SectorKronLayout,
                       min_elems: int = 1 << 17) -> int:
    """Measured-best number of Pallas-fused groups for this layout.

    The fused kernel (ops/pallas_kron) pays a fixed per-launch cost, so tiny
    groups run faster through the batched XLA tail; large groups gain the
    one-HBM-pass fusion. Round-5 chip study (slope-timed, warm cache):
    L=32 roofline fraction 0.93 @ 32 fused groups -> 0.96-0.99 @ 48-80;
    L=28 swings 0.71-0.86 @ 32 and 0.74-0.77 @ 64, but holds a stable
    plateau @ 44-48 (0.889, 0.891, 0.909, 0.912, 0.925 across five
    captures). The plateau edges sit near a 0.5 MB smallest-fused-group
    size at both L, so the default fuses every group with >= 2^17 elements
    (0.5 MB f32) — 44 groups at L=28, 80 at L=32 (measured 0.889/0.891 and
    0.978/0.981) — clamped to >= 32 so small-L layouts (every group tiny,
    kernel measured fine) keep their round-4 behavior and the
    interpret-mode kernel tests keep exercising the kernel path.
    Env SDTPU_FUSED_TOPK overrides.

    min_elems: the size cutoff. The matvec kernel uses the default 2^17.
    The fused Chebyshev-term kernel (ops/pallas_cheb) passes 2^15: its XLA
    tail is pricier (each tail group pays the full per-term combine pass
    chain, not just the apply), and the measured L=28 evolve step improves
    monotonically 0.601 -> 0.616 -> 0.625 (f32) and 0.682 -> 0.715 -> 0.769
    (bf16) of step-light across 32 -> 48 -> 64 fused groups; 2^15 lands at
    62 of 78 groups there."""
    import os

    v = os.environ.get("SDTPU_FUSED_TOPK")
    if v is not None:
        return int(v)
    big = sum(1 for (_, _, _, ch, _, _, cmp, clp) in layout.groups
              if ch * cmp * clp >= min_elems)
    return max(32, big)


def sector_kron_tables(layout: SectorKronLayout):
    """Arrays-only pytree of the layout's matrices (host numpy).

    Thread `jax.tree_util.tree_map(jnp.asarray, tables)` as an EXPLICIT jit
    argument at very large L: the remote compiler serializes captured constants
    into its request (see ops/sector_blocked.sector_blocked_tables)."""
    return {
        "W": [dict(layout.W[p]) for p in range(3)],
        "cross": dict(layout.cross_pool),
        "dvec": [dict(layout.diag_vecs[p]) for p in range(3)],
        "dcross": [(va, vb) for (_, _, va, vb) in layout.diag_cross],
    }


def _device_tables(layout: SectorKronLayout):
    if layout._dev is not None:
        return layout._dev
    with jax.ensure_compile_time_eval():
        layout._dev = jax.tree_util.tree_map(
            jnp.asarray, sector_kron_tables(layout)
        )
    return layout._dev


import os as _os

# Matmul precision for the table contractions. TPU MXU "default" TRUNCATES
# f32 operands to bf16 (measured rel err 2.4e-3/term on v5e — enough to sink
# ground-state residuals at L=32 below the 1e-3 bar); "high" = 3-pass bf16
# (1.4e-5), "highest" = full f32 (1.2e-7). Since every table entry here is a
# small exact dyadic (J, J/2, 0/1 one-hot), the operand-split passes act only
# on psi and "high" is f32-grade for this operator family. Overridable for
# experiments via SDTPU_KRON_PRECISION.
KRON_PRECISION = _os.environ.get("SDTPU_KRON_PRECISION", "high")


def _contract(T, M, part, rdtype):
    """Contract the `part` tensor axis of group tensor T with M[src, dst].

    T is rank-3 (h, m, l) or rank-4 (h, m, q, 128) — the lane-tiled form where
    the lo axis is split as l = q*128 (measured: big-minor-dim rank-3 reshapes
    relayout on TPU; the (q, 128) form keeps every reshape a free bitcast).
    M is real [C_src_pad, C_dst_pad]."""
    M = M.astype(rdtype)
    if T.ndim == 4:
        if part == 0:
            qs = T.shape[2]
            qd = M.shape[1] // 128
            M = M.reshape(qs, 128, qd, 128)
            eq = "hmqr,qrps->hmps"
        elif part == 1:
            eq = "hmqr,mn->hnqr"
        else:
            eq = "hmqr,hn->nmqr"
    else:
        eq = {0: "hml,ln->hmn", 1: "hml,mn->hnl", 2: "hml,hn->nml"}[part]
    prec = KRON_PRECISION
    if jnp.iscomplexobj(T):
        re = jnp.einsum(eq, T.real, M, preferred_element_type=rdtype,
                        precision=prec)
        im = jnp.einsum(eq, T.imag, M, preferred_element_type=rdtype,
                        precision=prec)
        return jax.lax.complex(re, im).astype(T.dtype)
    return jnp.einsum(eq, T, M, preferred_element_type=T.dtype,
                      precision=prec)


def apply_H_sector_kron(psi, diag, layout: SectorKronLayout, tables=None,
                        terms: str = "all", group_filter=None):
    """H|psi> in the kron group order.

    psi is either the FLAT kron-order vector (length layout.n_states; returns
    the same) or a LIST of per-group rank-3 tensors [C_h, C_m_pad, C_l_pad]
    (the "blocks" representation; returns a list). Blocks are the fast TPU
    form: each group's minor-2 dims are (mult-8, mult-128) — full native
    tiles — whereas flat-vector group views are [.., q, 128] with q = clp/128
    (often < 8), which the TPU pads to 8 sublanes: HALF-EMPTY tiles that
    double every HBM pass (measured: the flat view+concat floor alone is
    22 ms at L=32 vs a 7.3 ms two-pass roofline). Use solvers/blockvec to run
    whole solves in blocks form.

    diag=None uses the layout's FACTORED diagonal (per-part broadcast vectors —
    no N-sized diag read; the fast path). An explicit `diag` array (same kron
    order, flat) overrides it. `terms` restricts the applied term classes:
    "all" | comma-set of diag,lo,mid,hi,cross — plus the split cross classes
    "crossl" (hi-axis-untouched cross terms, i.e. lo|mid bonds: shard-local,
    fused by ops/pallas_kron) and "crossh" (terms touching the hi axis).
    group_filter (blocks mode): iterable of group indices to compute — other
    groups return zero leaves (the fused hybrid computes the top-K groups in
    Pallas and the tail here; unused zero leaves are pruned by XLA)."""
    want = (frozenset(("diag", "lo", "mid", "hi", "cross"))
            if terms == "all" else frozenset(terms.split(",")))
    want_crossl = "cross" in want or "crossl" in want
    want_crossh = "cross" in want or "crossh" in want
    copy_only = terms == "copy"  # profiling: group views + concat, no physics
    blocks_in = isinstance(psi, (list, tuple))
    if blocks_in and diag is not None:
        raise ValueError(
            "explicit `diag` override is flat-vector-only: in blocks mode the "
            "flat offsets in the override do not map onto block leaves; pass "
            "diag=None (the factored per-part tables are used instead)")
    x0 = psi[0] if blocks_in else psi
    rdtype = x0.real.dtype if jnp.iscomplexobj(x0) else x0.dtype
    dev = tables if tables is not None else _device_tables(layout)
    # lane-tiled rank-4 group views when the lo pad is lane-aligned (the fast
    # flat-path form); plain rank-3 otherwise (blocks mode, small-pad layouts)
    use4d = (not blocks_in) and layout.pads[1] % 128 == 0

    if use4d:
        # one top-level [R, 128] view; group slices are row ranges and the
        # rank-4 reshapes only split leading dims — free bitcasts on TPU
        psi_v = psi.reshape(-1, 128)
        diag_v = None if diag is None else diag.reshape(-1, 128)
    else:
        psi_v, diag_v = psi, diag

    def gview(x, gi):
        (_, _, _, ch, _, _, cmp, clp) = layout.groups[gi]
        o = layout.offsets[gi]
        if use4d:
            q = clp // 128
            return x[o // 128 : (o + ch * cmp * clp) // 128].reshape(
                ch, cmp, q, 128
            )
        return x[o : o + ch * cmp * clp].reshape(ch, cmp, clp)

    def bcast(vec, part, clp):
        """Broadcast a padded per-part [C_pad] vector over the group tensor."""
        if part == 2:
            return vec[:, None, None, None] if use4d else vec[:, None, None]
        if part == 1:
            return vec[None, :, None, None] if use4d else vec[None, :, None]
        if use4d:
            return vec.reshape(clp // 128, 128)[None, None, :, :]
        return vec[None, None, :]

    if blocks_in:
        G = list(psi)
    else:
        G = [gview(psi_v, gi) for gi in range(len(layout.groups))]

    gset = None if group_filter is None else frozenset(group_filter)
    outs = []
    for gi, (k_h, k_m, k_l, ch, cm, cl, cmp, clp) in enumerate(layout.groups):
        if gset is not None and gi not in gset:
            outs.append(jnp.zeros_like(G[gi]))
            continue
        if copy_only:
            if blocks_in:
                outs.append(G[gi] * 1.000001)
            else:
                outs.append((G[gi] * 1.000001).reshape(-1, 128) if use4d
                            else (G[gi] * 1.000001).reshape(-1))
            continue
        if "diag" not in want:
            acc = jnp.zeros_like(G[gi])
        elif diag is not None:
            acc = gview(diag_v, gi).astype(psi.dtype) * G[gi]
        else:
            kp = (k_l, k_m, k_h)
            d = None
            for p in range(3):
                v = dev["dvec"][p].get(kp[p])
                if v is not None:
                    t = bcast(jnp.asarray(v).astype(rdtype), p, clp)
                    d = t if d is None else d + t
            acc = jnp.zeros_like(G[gi]) if d is None else G[gi] * d
            for (pa, pb, _, _), (va, vb) in zip(layout.diag_cross,
                                                dev["dcross"]):
                sa = bcast(jnp.asarray(va[kp[pa]]).astype(rdtype), pa, clp)
                sb = bcast(jnp.asarray(vb[kp[pb]]).astype(rdtype), pb, clp)
                acc = acc + G[gi] * (sa * sb)
        part_names = ("lo", "mid", "hi")
        for p, k in ((0, k_l), (1, k_m), (2, k_h)):
            if part_names[p] in want and k in dev["W"][p]:
                acc = acc + _contract(G[gi], dev["W"][p][k], p, rdtype)
        def _sl(T, part, r0, ln):
            # part 2 (hi) = dim 0, part 1 (mid) = dim 1 in both rank-3/rank-4
            # views; static MAJOR-dim slices are bandwidth-cheap on TPU
            return T[r0:r0 + ln] if part == 2 else T[:, r0:r0 + ln]

        def _addat(acc, part, c0, ln, X):
            if part == 2:
                return acc.at[c0:c0 + ln].add(X)
            return acc.at[:, c0:c0 + ln].add(X)

        for (g_src, pa, pb, a_key, b_key) in (layout.cross_meta[gi]
                                              if (want_crossl or want_crossh)
                                              else ()):
            touches_hi = 2 in (pa, pb)
            if touches_hi and not want_crossh:
                continue
            if not touches_hi and not want_crossl:
                continue
            runs_a = layout.cross_runs.get(a_key)
            runs_b = layout.cross_runs.get(b_key)
            T = G[g_src]
            if runs_a is not None and runs_b is not None:
                # both factors are block shifts: pure slice adds, zero
                # matmuls. Parts are necessarily {1 (mid), 2 (hi)} = dims
                # {1, 0} (lo-axis factors are never runs).
                for (ra0, ca0, lna, va) in runs_a:
                    for (rb0, cb0, lnb, vb) in runs_b:
                        X = _sl(_sl(T, pa, ra0, lna), pb, rb0, lnb)
                        v = va * vb
                        if v != 1.0:
                            X = jnp.asarray(v, rdtype).astype(X.dtype) * X
                        hi_c, hi_l = (ca0, lna) if pa == 2 else (cb0, lnb)
                        md_c, md_l = (cb0, lnb) if pa == 2 else (ca0, lna)
                        acc = acc.at[hi_c:hi_c + hi_l,
                                     md_c:md_c + md_l].add(X)
                continue
            if runs_a is not None or runs_b is not None:
                # one shift + one matmul: slice FIRST so the matmul runs on
                # the shrunken rows (halves the lane-axis cross flops)
                runs, pr = (runs_a, pa) if runs_a is not None else (runs_b, pb)
                m_key, pm = (b_key, pb) if runs_a is not None else (a_key, pa)
                M = dev["cross"][m_key]
                for (r0, c0, ln, val) in runs:
                    X = _contract(_sl(T, pr, r0, ln), M, pm, rdtype)
                    if val != 1.0:
                        X = jnp.asarray(val, rdtype).astype(X.dtype) * X
                    acc = _addat(acc, pr, c0, ln, X)
                continue
            A = dev["cross"][a_key]
            B = dev["cross"][b_key]
            # contract in the order that minimizes ACTUAL matmul flops:
            # A-first costs 2*s*Ad + 2*(s*Ad/As)*Bd, B-first the mirror —
            # the old smallest-intermediate rule wasted up to 30% MXU time
            ssz = T.size
            fa = ssz * A.shape[1] * (1.0 + B.shape[1] / A.shape[0])
            fb = ssz * B.shape[1] * (1.0 + A.shape[1] / B.shape[0])
            if fa <= fb:
                T = _contract(T, A, pa, rdtype)
                T = _contract(T, B, pb, rdtype)
            else:
                T = _contract(T, B, pb, rdtype)
                T = _contract(T, A, pa, rdtype)
            acc = acc + T
        if blocks_in:
            outs.append(acc)
        else:
            outs.append(acc.reshape(-1, 128) if use4d else acc.reshape(-1))
    if blocks_in:
        return outs
    out = jnp.concatenate(outs)
    return out.reshape(-1) if use4d else out
