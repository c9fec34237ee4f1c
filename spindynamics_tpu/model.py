"""Spin model specification as a JAX pytree (capability parity with src/SpinModel.jl).

The reference's `Model` (src/SpinModel.jl:6-15) holds coupling tuple-lists, a state
list and a `Dict` index map. Here the model is a frozen pytree of device arrays:

  - coupling lists become struct-of-arrays (`hop_i/hop_j/hop_J`, `zz_i/zz_j/zz_J`)
  - the Dict idxmap is replaced by combinadic rank (basis.py) and, for the default
    sector matvec, a precomputed ELL neighbor table `nbr[N, n_bonds]` (the static
    sparsity structure of the off-diagonal part of H)
  - the diagonal of H (field + ZZ; ref src/Hamiltonian.jl:147-154) is precomputed
    once into `diag[N]` — it never changes between matvecs, so recomputing it per
    apply (as the reference does) wastes bandwidth.

Site indices are 0-based (Python convention; the reference is 1-based Julia).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import basis as basis_mod

__all__ = ["SpinModel", "build_model", "nn_hopping", "long_range_hopping"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
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
    ],
    meta_fields=["L", "nup", "mode", "n_valid", "hop_sites", "zz_sites",
                 "n_states_static", "lo_bits", "kron_splits", "kron_pads"],
)
@dataclasses.dataclass(frozen=True)
class SpinModel:
    """XXZ-type spin-1/2 model on a bit-encoded basis.

    H = sum_b Jxy_b (S+_i S-_j + S-_i S+_j) + sum_i h_i Sz_i + sum_z Jz (Sz_i Sz_j)

    Note the hopping convention follows the reference kernel
    (src/Hamiltonian.jl:159-175): the off-diagonal matrix element between states
    that differ on bits (i, j) is Jxy_b itself (i.e. Jxy multiplies
    S+S- + S-S+ without an extra 1/2).
    """

    # --- static metadata ---
    L: int
    nup: int | None
    mode: str  # 'full' | 'sector' | 'embedded'
    # --- array leaves ---
    states: jax.Array  # uint32 [N]
    diag: jax.Array  # real  [N]   precomputed diagonal of H
    field: jax.Array  # real  [L]
    hop_i: jax.Array  # int32 [nb]
    hop_j: jax.Array  # int32 [nb]
    hop_J: jax.Array  # real  [nb]
    zz_i: jax.Array  # int32 [nz]
    zz_j: jax.Array  # int32 [nz]
    zz_J: jax.Array  # real  [nz]
    nbr: jax.Array | None  # int32 [N, nb] ELL neighbor table (sector mode; -1 = no bond)
    binom: jax.Array  # int32 [L+1, nup+1] binomial LUT (sector mode)
    # Logical Hilbert dimension when the arrays are padded for sharding
    # (pad rows have diag=0, nbr=-1 and are an exact invariant null subspace).
    # None means "no padding": dim == n_states.
    n_valid: int | None = None
    # Static copies of the coupling site pairs: the flip backend derives its
    # reshape structure from these at trace time (the traced hop_i/hop_j arrays
    # cannot drive Python-level graph construction).
    hop_sites: tuple = ()
    zz_sites: tuple = ()
    # For full/embedded layouts states == arange(2^L); storing that array wastes
    # HBM (1 GB at L=28), so `states` may be None with the length kept here.
    n_states_static: int | None = None
    # Set for layout='sector_blocked': the basis is ordered (k_hi, rank_hi,
    # rank_lo) with lo_bits low bits (see ops/sector_blocked.py); index lookups
    # use blocked_rank instead of the plain combinadic rank.
    lo_bits: int | None = None
    # Set for layout='sector_kron': basis ordered by (k_hi, k_mid) groups over
    # the (L1, L2, L3) bit split (see ops/sector_kron.py); lookups use kron_rank.
    kron_splits: tuple | None = None
    kron_pads: tuple | None = None  # (sublane, lane) tile padding of the groups

    @property
    def n_states(self) -> int:
        """Array length (>= dim when padded for sharding)."""
        if self.states is not None:
            return self.states.shape[0]
        return self.n_states_static

    def basis_states(self) -> jax.Array:
        """The uint32 basis states; synthesized on demand for layouts that
        don't materialize them (iota for full/embedded; group assembly for
        lean sector_kron builds)."""
        if self.states is not None:
            return self.states
        if self.kron_splits is not None:
            from .ops.sector_kron import kron_states_device

            return kron_states_device(self.L, self.nup, self.kron_splits,
                                      self.kron_pads)
        return jnp.arange(self.n_states_static, dtype=jnp.uint32)

    @property
    def dim(self) -> int:
        """Logical Hilbert-space dimension."""
        return self.n_valid if self.n_valid is not None else self.n_states

    def valid_mask(self):
        """Boolean [n_states] mask of logical rows.

        None if every row is logical. For sharding-padded models: index < n_valid.
        For 'embedded' mode (sector physics run in the full 2^L space on the
        gather-free flip backend): popcount(state) == nup — the U(1) sector is an
        exact invariant subspace of H, so zeroing the complement once at state
        preparation keeps the entire computation in-sector."""
        if self.mode == "embedded":
            m = (
                jax.lax.population_count(self.basis_states().astype(jnp.uint32))
                == self.nup
            )
            if self.n_valid is not None:
                m = jnp.logical_and(m, jnp.arange(self.n_states) < self.n_valid)
            return m
        if self.mode == "sector" and self.kron_splits is not None:
            # tile-padding slots carry PAD_SENTINEL (popcount 32 != nup);
            # they form an exact zero-energy invariant null subspace
            if self.n_valid is None:
                return None  # unpadded kron layout: every slot is physical
            return (
                jax.lax.population_count(self.basis_states().astype(jnp.uint32))
                == self.nup
            )
        if self.n_valid is None:
            return None
        return jnp.arange(self.n_states) < self.n_valid

    @property
    def n_bonds(self) -> int:
        return self.hop_i.shape[0]

    @property
    def dtype(self):
        # lean sector_kron builds skip the N-sized diag (the apply uses the
        # layout's factored diagonal); `field` always exists and is tiny
        return self.field.dtype if self.diag is None else self.diag.dtype

    def hop_masks(self) -> np.ndarray:
        """uint32 XOR masks, one per hopping bond."""
        hi = np.asarray(self.hop_i)
        hj = np.asarray(self.hop_j)
        return ((1 << hi.astype(np.uint64)) | (1 << hj.astype(np.uint64))).astype(
            np.uint32
        )


def nn_hopping(L: int, J: float) -> list[tuple[int, int, float]]:
    """Nearest-neighbour open chain (ref: src/SpinModel.jl:40-42); 0-based sites."""
    return [(i, i + 1, float(J)) for i in range(L - 1)]


def long_range_hopping(L: int, J: Callable[[int, int], float]) -> list[tuple[int, int, float]]:
    """All-pairs coupling with user J(i, j) (ref: src/SpinModel.jl:44-46); 0-based."""
    return [(i, j, float(J(i, j))) for i in range(L) for j in range(i + 1, L)]


def _couplings_to_arrays(couplings, L, dtype):
    if couplings is None or len(couplings) == 0:
        return (
            np.zeros(0, np.int32),
            np.zeros(0, np.int32),
            np.zeros(0, dtype),
        )
    arr = np.asarray([(int(i), int(j), float(J)) for (i, j, J) in couplings])
    i = arr[:, 0].astype(np.int32)
    j = arr[:, 1].astype(np.int32)
    if np.any(i < 0) or np.any(i >= L) or np.any(j < 0) or np.any(j >= L):
        raise ValueError("coupling site index out of range [0, L)")
    if np.any(i == j):
        raise ValueError("coupling with i == j")
    return i, j, arr[:, 2].astype(dtype)


def _compute_diag(states, field, zz_i, zz_j, zz_J, dtype, chunk=1 << 22):
    """diag[idx] = sum_i h_i sz(bit_i) + sum_z Jz sz_i sz_j.

    Host numpy, chunked over states (ref semantics: src/Hamiltonian.jl:145-154)."""
    N = states.shape[0]
    out = np.zeros(N, dtype=dtype)
    L = field.shape[0]
    nz_field = np.nonzero(field)[0]
    for s0 in range(0, N, chunk):
        s = states[s0 : s0 + chunk]
        acc = np.zeros(s.shape[0], dtype=np.float64)
        for i in nz_field:
            acc += field[i] * (((s >> np.uint32(i)) & 1).astype(np.float64) - 0.5)
        for i, j, Jz in zip(zz_i, zz_j, zz_J):
            bi = ((s >> np.uint32(i)) & 1).astype(np.float64) - 0.5
            bj = ((s >> np.uint32(j)) & 1).astype(np.float64) - 0.5
            acc += float(Jz) * bi * bj
        out[s0 : s0 + chunk] = acc.astype(dtype)
    return out


def _build_ell_table(states, hop_i, hop_j, chunk=1 << 22):
    """ELL neighbor table for the sector basis: nbr[n, b] = rank(state_n XOR mask_b)
    if bits (i_b, j_b) differ in state_n, else -1.

    This is the static sparsity structure the reference recomputes per matvec via
    Dict lookups (src/Hamiltonian.jl:159-175). `states` must be ascending, so
    rank == searchsorted."""
    N = states.shape[0]
    nb = hop_i.shape[0]
    nbr = np.full((N, nb), -1, dtype=np.int32)
    masks = ((1 << hop_i.astype(np.uint64)) | (1 << hop_j.astype(np.uint64))).astype(
        np.uint32
    )
    for s0 in range(0, N, chunk):
        s = states[s0 : s0 + chunk]
        for b in range(nb):
            differ = (((s >> np.uint32(hop_i[b])) ^ (s >> np.uint32(hop_j[b]))) & 1).astype(
                bool
            )
            flipped = s ^ masks[b]
            r = np.searchsorted(states, flipped).astype(np.int32)
            nbr[s0 : s0 + chunk, b] = np.where(differ, r, np.int32(-1))
    return nbr


def _device_sector_setup(L, nup, binom, field, zz_i, zz_j, zz_J, hop_i, hop_j,
                         dtype, want_table):
    """On-device basis/diag/ELL construction for large sectors.

    With only a couple of host cores, enumerating and ranking 4e7..6e8 states
    (L = 28..32) on host dominates wall-clock; on the accelerator it is L fused
    vector passes (unrank) + one combinadic rank pass per bond."""
    N = basis_mod.sector_dimension(L, nup)
    binom_d = jnp.asarray(binom.astype(np.int32))
    f32 = jnp.dtype(dtype)

    @jax.jit
    def build_states():
        idx = jnp.arange(N, dtype=jnp.int32)
        return basis_mod.unrank_states(idx, L, nup, binom_d)

    states = build_states()

    field_nz = [(int(i), float(field[i])) for i in np.nonzero(field)[0]]
    zz_terms = [
        (int(i), int(j), float(J)) for i, j, J in zip(zz_i, zz_j, zz_J)
    ]

    @jax.jit
    def build_diag(states):
        acc = jnp.zeros(states.shape, f32)
        for i, h in field_nz:
            acc = acc + h * (((states >> np.uint32(i)) & 1).astype(f32) - 0.5)
        for i, j, J in zz_terms:
            bi = ((states >> np.uint32(i)) & 1).astype(f32) - 0.5
            bj = ((states >> np.uint32(j)) & 1).astype(f32) - 0.5
            acc = acc + J * bi * bj
        return acc

    diag = build_diag(states)

    nbr = None
    if want_table and hop_i.shape[0] > 0:
        bonds = [(int(i), int(j)) for i, j in zip(hop_i, hop_j)]

        @partial(jax.jit, static_argnums=(1, 2))
        def build_col(states, bi, bj):
            mask = np.uint32((1 << bi) | (1 << bj))
            differ = (((states >> np.uint32(bi)) ^ (states >> np.uint32(bj))) & 1) == 1
            flipped = states ^ mask
            r = basis_mod.rank_states(flipped, L, binom_d)
            return jnp.where(differ, r, jnp.int32(-1))

        cols = [build_col(states, bi, bj) for bi, bj in bonds]
        nbr = jnp.stack(cols, axis=1)
        del cols
    return states, diag, nbr


def build_model(
    L: int,
    nup: int | None = None,
    hopping: Sequence[tuple[int, int, float]] | None = None,
    onsite_field: Sequence[float] | None = None,
    zz: Sequence[tuple[int, int, float]] | None = None,
    dtype=jnp.float32,
    build_neighbor_table: bool | None = None,
    device_build: bool | None = None,
    layout: str = "compact",
    lean: bool | None = None,
    kron_splits: tuple | None = None,
) -> SpinModel:
    """Create a SpinModel (ref: src/SpinModel.jl:23-38 `build_model`).

    nup=None selects the full 2^L basis, otherwise the U(1) Sz sector.
    `build_neighbor_table` controls the ELL table (default: on for sector mode,
    off for full mode, where the XOR index needs no table).
    `device_build` moves basis enumeration + table construction onto the
    accelerator (default: automatically for large sectors on non-CPU backends).
    `layout='embedded'` (with nup set) runs the sector embedded in the full 2^L
    space on the gather-free flip backend — the fast path on TPU, trading
    ~sqrt(L) memory overhead for a matvec with zero gathers; the sector is an
    exact invariant subspace, see SpinModel.valid_mask."""
    if layout not in ("compact", "embedded", "sector_blocked", "sector_kron"):
        raise ValueError(f"unknown layout {layout!r}")
    if kron_splits is not None and layout != "sector_kron":
        raise ValueError("kron_splits only applies to layout='sector_kron'")
    if layout == "sector_kron":
        if nup is None:
            raise ValueError("layout='sector_kron' requires nup")
        from .ops.sector_kron import (
            kron_order_states, make_sector_kron_layout)

        np_dtype = np.dtype(jnp.dtype(dtype).name)
        hop_i, hop_j, hop_J = _couplings_to_arrays(hopping, L, np_dtype)
        zz_i, zz_j, zz_J = _couplings_to_arrays(zz, L, np_dtype)
        field = (
            np.zeros(L, np_dtype)
            if onsite_field is None
            else np.asarray(onsite_field, dtype=np_dtype)
        )
        hop_sites = tuple(zip(hop_i.tolist(), hop_j.tolist()))
        lay = make_sector_kron_layout(
            (L, nup, hop_sites, hop_J.astype(np.float64).tolist()),
            splits=kron_splits,  # None -> default_kron_splits heuristic
        )
        if device_build is None:
            device_build = (
                basis_mod.sector_dimension(L, nup) >= (1 << 22)
                and jax.default_backend() != "cpu"
            )
        # Lean build for very large sectors: skip materializing states/diag —
        # the kron apply uses the layout's FACTORED diagonal and never reads
        # either; observables synthesize states on demand (basis_states).
        # At L=32 Sz=0 the two arrays would cost ~6 GB of the 16 GB HBM.
        if lean is None:
            lean = lay.n_states >= (1 << 28)
        if lean:
            return SpinModel(
                L=L, nup=nup, mode="sector",
                states=None, diag=None, field=jnp.asarray(field),
                hop_i=jnp.asarray(hop_i), hop_j=jnp.asarray(hop_j),
                hop_J=jnp.asarray(hop_J),
                zz_i=jnp.asarray(zz_i), zz_j=jnp.asarray(zz_j),
                zz_J=jnp.asarray(zz_J),
                nbr=None,
                binom=jnp.asarray(
                    basis_mod.binomial_table(L, nup).astype(np.int32)),
                hop_sites=hop_sites,
                zz_sites=tuple(zip(zz_i.tolist(), zz_j.tolist())),
                kron_splits=lay.splits, kron_pads=lay.pads,
                n_states_static=lay.n_states,
                n_valid=(lay.n_basis if lay.n_states != lay.n_basis else None),
            )
        if device_build:
            # per-group (hi, mid, lo) outer products + diagonal on device —
            # the part enumerations are tiny, only the N-sized assembly is heavy
            f32 = jnp.dtype(dtype)
            L1, L2, L3 = lay.splits
            field_nz = [(int(i), float(field[i])) for i in np.nonzero(field)[0]]
            zz_terms = [
                (int(i), int(j), float(J)) for i, j, J in zip(zz_i, zz_j, zz_J)
            ]

            from .ops.sector_kron import PAD_SENTINEL

            @jax.jit
            def build(triples):
                parts, dparts = [], []
                for (his, mids, los), (cmp, clp) in zip(triples, pad_dims):
                    blk = (
                        (his[:, None, None].astype(jnp.uint32)
                         << np.uint32(L1 + L2))
                        | (mids[None, :, None].astype(jnp.uint32)
                           << np.uint32(L1))
                        | los[None, None, :].astype(jnp.uint32)
                    )
                    blk = jnp.pad(
                        blk,
                        ((0, 0), (0, cmp - blk.shape[1]),
                         (0, clp - blk.shape[2])),
                        constant_values=PAD_SENTINEL,
                    ).reshape(-1)
                    acc = jnp.zeros(blk.shape, f32)
                    for i, h in field_nz:
                        acc = acc + h * (
                            ((blk >> np.uint32(i)) & 1).astype(f32) - 0.5
                        )
                    for i, j, J in zz_terms:
                        bi = ((blk >> np.uint32(i)) & 1).astype(f32) - 0.5
                        bj = ((blk >> np.uint32(j)) & 1).astype(f32) - 0.5
                        acc = acc + J * bi * bj
                    # pad slots: diag forced to 0 so they are an exact
                    # zero-energy invariant null subspace
                    acc = jnp.where(
                        jax.lax.population_count(blk) == nup, acc, 0.0
                    )
                    parts.append(blk)
                    dparts.append(acc)
                return jnp.concatenate(parts), jnp.concatenate(dparts)

            triples = tuple(
                (jnp.asarray(basis_mod.build_sector_basis(L3, k_h)),
                 jnp.asarray(basis_mod.build_sector_basis(L2, k_m)),
                 jnp.asarray(basis_mod.build_sector_basis(L1, k_l)))
                for (k_h, k_m, k_l, *_rest) in lay.groups
            )
            pad_dims = tuple((g[6], g[7]) for g in lay.groups)
            states, diag = build(triples)
        else:
            from .ops.sector_kron import PAD_SENTINEL

            states = kron_order_states(L, nup, lay.splits, lay.pads)
            diag = _compute_diag(states, field, zz_i, zz_j, zz_J, np_dtype)
            diag[states == PAD_SENTINEL] = 0.0
        binom = basis_mod.binomial_table(L, nup)
        dev = lambda x: jnp.asarray(x)
        return SpinModel(
            L=L, nup=nup, mode="sector",
            states=dev(states), diag=dev(diag), field=dev(field),
            hop_i=dev(hop_i), hop_j=dev(hop_j), hop_J=dev(hop_J),
            zz_i=dev(zz_i), zz_j=dev(zz_j), zz_J=dev(zz_J),
            nbr=None, binom=dev(binom.astype(np.int32)),
            hop_sites=hop_sites,
            zz_sites=tuple(zip(zz_i.tolist(), zz_j.tolist())),
            kron_splits=lay.splits, kron_pads=lay.pads,
            n_valid=(lay.n_basis if lay.n_states != lay.n_basis else None),
        )
    if layout == "sector_blocked":
        if nup is None:
            raise ValueError("layout='sector_blocked' requires nup")
        from .ops.sector_blocked import (
            blocked_order_states, make_sector_blocked_layout)

        np_dtype = np.dtype(jnp.dtype(dtype).name)
        hop_i, hop_j, hop_J = _couplings_to_arrays(hopping, L, np_dtype)
        zz_i, zz_j, zz_J = _couplings_to_arrays(zz, L, np_dtype)
        field = (
            np.zeros(L, np_dtype)
            if onsite_field is None
            else np.asarray(onsite_field, dtype=np_dtype)
        )
        hop_sites = tuple(zip(hop_i.tolist(), hop_j.tolist()))
        lay = make_sector_blocked_layout(
            (L, nup, hop_sites, hop_J.astype(np.float64).tolist())
        )
        if device_build is None:
            device_build = (
                basis_mod.sector_dimension(L, nup) >= (1 << 22)
                and jax.default_backend() != "cpu"
            )
        if device_build:
            # per-group outer products + diagonal on the accelerator: the hi/lo
            # enumerations are tiny, only the N-sized assembly is heavy
            f32 = jnp.dtype(dtype)
            Ll = lay.Ll
            field_nz = [(int(i), float(field[i])) for i in np.nonzero(field)[0]]
            zz_terms = [
                (int(i), int(j), float(J)) for i, j, J in zip(zz_i, zz_j, zz_J)
            ]

            @jax.jit
            def build(his_los):
                parts, dparts = [], []
                for his, los in his_los:
                    blk = (
                        (his[:, None].astype(jnp.uint32) << np.uint32(Ll))
                        | los[None, :].astype(jnp.uint32)
                    ).reshape(-1)
                    acc = jnp.zeros(blk.shape, f32)
                    for i, h in field_nz:
                        acc = acc + h * (
                            ((blk >> np.uint32(i)) & 1).astype(f32) - 0.5
                        )
                    for i, j, J in zz_terms:
                        bi = ((blk >> np.uint32(i)) & 1).astype(f32) - 0.5
                        bj = ((blk >> np.uint32(j)) & 1).astype(f32) - 0.5
                        acc = acc + J * bi * bj
                    parts.append(blk)
                    dparts.append(acc)
                return jnp.concatenate(parts), jnp.concatenate(dparts)

            his_los = tuple(
                (jnp.asarray(basis_mod.build_sector_basis(L - Ll, k)),
                 jnp.asarray(basis_mod.build_sector_basis(Ll, nup - k)))
                for (k, _, _) in lay.groups
            )
            states, diag = build(his_los)
        else:
            states = blocked_order_states(L, nup, lay.Ll)
            diag = _compute_diag(states, field, zz_i, zz_j, zz_J, np_dtype)
        binom = basis_mod.binomial_table(L, nup)
        dev = lambda x: jnp.asarray(x)
        return SpinModel(
            L=L, nup=nup, mode="sector",
            states=dev(states), diag=dev(diag), field=dev(field),
            hop_i=dev(hop_i), hop_j=dev(hop_j), hop_J=dev(hop_J),
            zz_i=dev(zz_i), zz_j=dev(zz_j), zz_J=dev(zz_J),
            nbr=None, binom=dev(binom.astype(np.int32)),
            hop_sites=hop_sites,
            zz_sites=tuple(zip(zz_i.tolist(), zz_j.tolist())),
            lo_bits=lay.Ll,
        )
    if layout == "embedded":
        if nup is None:
            raise ValueError("layout='embedded' requires nup")
        if L >= 30:
            raise ValueError(
                f"embedded layout at L={L} needs 2^{L} amplitudes; use the "
                "compact sector layout (or shard over more chips)"
            )
        binom = basis_mod.binomial_table(L, nup)
        np_dtype = np.dtype(jnp.dtype(dtype).name)
        hop_i, hop_j, hop_J = _couplings_to_arrays(hopping, L, np_dtype)
        zz_i, zz_j, zz_J = _couplings_to_arrays(zz, L, np_dtype)
        field = (
            np.zeros(L, np_dtype)
            if onsite_field is None
            else np.asarray(onsite_field, dtype=np_dtype)
        )
        if device_build is None:
            device_build = (1 << L) >= (1 << 22) and jax.default_backend() != "cpu"
        if device_build:
            # states and diagonal built on the accelerator (2 host cores can't
            # keep up past L ~ 24; see _device_sector_setup rationale)
            f32 = jnp.dtype(dtype)
            field_nz = [(int(i), float(field[i])) for i in np.nonzero(field)[0]]
            zz_terms = [
                (int(i), int(j), float(J)) for i, j, J in zip(zz_i, zz_j, zz_J)
            ]

            @jax.jit
            def build():
                states = jnp.arange(1 << L, dtype=jnp.uint32)
                acc = jnp.zeros(states.shape, f32)
                for i, h in field_nz:
                    acc = acc + h * (
                        ((states >> np.uint32(i)) & 1).astype(f32) - 0.5
                    )
                for i, j, J in zz_terms:
                    bi = ((states >> np.uint32(i)) & 1).astype(f32) - 0.5
                    bj = ((states >> np.uint32(j)) & 1).astype(f32) - 0.5
                    acc = acc + J * bi * bj
                return acc

            states_d = None  # == arange(2^L); never materialized
            diag_d = build()
        else:
            states = basis_mod.build_full_basis(L)
            diag = _compute_diag(states, field, zz_i, zz_j, zz_J, np_dtype)
            states_d = jnp.asarray(states)
            diag_d = jnp.asarray(diag)
        dev = lambda x: jnp.asarray(x)
        return SpinModel(
            L=L, nup=nup, mode="embedded",
            states=states_d, diag=diag_d, field=dev(field),
            hop_i=dev(hop_i), hop_j=dev(hop_j), hop_J=dev(hop_J),
            zz_i=dev(zz_i), zz_j=dev(zz_j), zz_J=dev(zz_J),
            nbr=None, binom=dev(binom.astype(np.int32)),
            hop_sites=tuple(zip(hop_i.tolist(), hop_j.tolist())),
            zz_sites=tuple(zip(zz_i.tolist(), zz_j.tolist())),
            n_states_static=1 << L,
        )
    np_dtype = np.dtype(jnp.dtype(dtype).name)
    hop_i, hop_j, hop_J = _couplings_to_arrays(hopping, L, np_dtype)
    zz_i, zz_j, zz_J = _couplings_to_arrays(zz, L, np_dtype)
    field = (
        np.zeros(L, np_dtype)
        if onsite_field is None
        else np.asarray(onsite_field, dtype=np_dtype)
    )
    if field.shape != (L,):
        raise ValueError(f"onsite_field must have shape ({L},)")

    if build_neighbor_table is None:
        build_neighbor_table = nup is not None

    if device_build is None:
        device_build = (
            nup is not None
            and basis_mod.sector_dimension(L, nup) >= (1 << 20)
            and jax.default_backend() != "cpu"
        )

    states_d = diag_d = nbr_d = None
    if nup is None:
        mode = "full"
        states = basis_mod.build_full_basis(L)
        binom = basis_mod.binomial_table(L, L)
    else:
        mode = "sector"
        binom = basis_mod.binomial_table(L, nup)
        if device_build:
            states_d, diag_d, nbr_d = _device_sector_setup(
                L, nup, binom, field, zz_i, zz_j, zz_J, hop_i, hop_j,
                np_dtype, build_neighbor_table,
            )
        else:
            states = basis_mod.build_sector_basis(L, nup)

    if states_d is None:
        diag = _compute_diag(states, field, zz_i, zz_j, zz_J, np_dtype)
        nbr = None
        if build_neighbor_table and hop_i.shape[0] > 0:
            if mode == "sector":
                # native builder uses the combinadic rank — sector bases only
                try:
                    from .utils.native import native_ell_table

                    nbr = native_ell_table(states, hop_i, hop_j)
                except Exception:
                    nbr = None
            if nbr is None:
                nbr = _build_ell_table(states, hop_i, hop_j)
        states_d = jnp.asarray(states)
        diag_d = jnp.asarray(diag)
        nbr_d = None if nbr is None else jnp.asarray(nbr)

    dev = lambda x: jnp.asarray(x)
    return SpinModel(
        L=L,
        nup=nup,
        mode=mode,
        states=states_d,
        diag=diag_d,
        field=dev(field),
        hop_i=dev(hop_i),
        hop_j=dev(hop_j),
        hop_J=dev(hop_J),
        zz_i=dev(zz_i),
        zz_j=dev(zz_j),
        zz_J=dev(zz_J),
        nbr=nbr_d,
        binom=dev(binom.astype(np.int32)),
        hop_sites=tuple(zip(hop_i.tolist(), hop_j.tolist())),
        zz_sites=tuple(zip(zz_i.tolist(), zz_j.tolist())),
    )
