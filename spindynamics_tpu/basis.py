"""Bit-encoded spin-1/2 Hilbert-space bases (TPU-native design).

Capability parity with the reference `src/Basis.jl`:
  - full basis: all 2^L states          (ref: src/Basis.jl:11-21, `build_full_basis`)
  - U(1) sector basis: fixed nup        (ref: src/Basis.jl:24-39, `build_sector_basis`)

TPU-first deviations from the reference design (see SURVEY.md §7):
  - States are `uint32` arrays sorted ASCENDING (the reference stores `UInt64` in
    lexicographic-combination order, which is NOT ascending). Ascending order is a
    colexicographic combinadic order, which gives an O(L) closed-form rank.
  - The reference's `Dict{UInt64,Int}` index map (src/SpinModel.jl:11) is replaced
    by combinadic rank/unrank with a binomial lookup table: `rank(s) = sum_t C(p_t, t)`
    over the ascending set-bit positions p_1 < p_2 < ... of `s`. This is jit-compatible
    and runs on-device; a hash map does not exist on a TPU.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "binomial_table",
    "build_full_basis",
    "build_sector_basis",
    "sector_dimension",
    "rank_states",
    "rank_state",
    "unrank",
    "bit_at",
    "sz_value",
    "flip_bits",
]

MAX_L = 32  # uint32 states; C(32,16) = 601,080,390 fits int32 indices.


def binomial_table(L: int, kmax: int | None = None) -> np.ndarray:
    """Pascal-triangle LUT C[n, k] for 0 <= n <= L, 0 <= k <= kmax (int64).

    Used by the combinadic rank in place of the reference's Dict lookup
    (ref: src/Hamiltonian.jl:169-172)."""
    if kmax is None:
        kmax = L
    C = np.zeros((L + 1, kmax + 1), dtype=np.int64)
    C[:, 0] = 1
    for n in range(1, L + 1):
        hi = min(n, kmax)
        C[n, 1 : hi + 1] = C[n - 1, 1 : hi + 1] + C[n - 1, 0:hi]
    return C


def sector_dimension(L: int, nup: int) -> int:
    return math.comb(L, nup)


def build_full_basis(L: int) -> np.ndarray:
    """All 2^L states; state value == basis index (ref: src/Basis.jl:11-21)."""
    if not 1 <= L <= MAX_L:
        raise ValueError(f"L must be in [1, {MAX_L}], got {L}")
    if L >= 28:
        raise ValueError(
            f"full basis at L={L} has 2^{L} states; use a sector basis"
        )
    return np.arange(1 << L, dtype=np.uint32)


@lru_cache(maxsize=None)
def _sector_states_cached(L: int, nup: int) -> np.ndarray:
    """Ascending enumeration of L-bit states with popcount nup.

    Recursive construction: S(L,k) = S(L-1,k) ++ (S(L-1,k-1) | 2^(L-1)); both
    halves ascending and disjoint, so the result is ascending. Pure-numpy
    vector ops (no Python per-state loop, unlike ref src/Basis.jl:27-33)."""
    if nup == 0:
        return np.zeros(1, dtype=np.uint32)
    if nup == L:
        return np.array([(1 << L) - 1], dtype=np.uint32)
    lo = _sector_states_cached(L - 1, nup)
    hi = _sector_states_cached(L - 1, nup - 1) | np.uint32(1 << (L - 1))
    out = np.concatenate([lo, hi])
    out.flags.writeable = False
    return out


def build_sector_basis(L: int, nup: int) -> np.ndarray:
    """All states with exactly nup set bits, ascending (ref: src/Basis.jl:24-39)."""
    if not 1 <= L <= MAX_L:
        raise ValueError(f"L must be in [1, {MAX_L}], got {L}")
    if not 0 <= nup <= L:
        raise ValueError(f"nup must be in [0, {L}], got {nup}")
    # Try the native C++ enumerator for large sectors; fall back to numpy.
    if sector_dimension(L, nup) >= (1 << 22):
        try:
            from .utils.native import native_sector_basis

            out = native_sector_basis(L, nup)
            if out is not None:
                return out
        except Exception:
            pass
    return _sector_states_cached(L, nup).copy()


# -----------------------------------------------------------------------------
# Combinadic rank / unrank (replaces Dict idxmap; jit-compatible)
# -----------------------------------------------------------------------------


def rank_states(states, L: int, binom: jax.Array | np.ndarray) -> jax.Array:
    """Vectorized combinadic rank: index of each state in the ascending sector basis.

    rank(s) = sum over set bits (ascending positions p, 1-based running count t)
    of C(p, t). jit-compatible; `binom` is `binomial_table(L, nup)` (device or host).

    Replaces the reference's Dict lookup at src/Hamiltonian.jl:169-172."""
    states = jnp.asarray(states)
    binom = jnp.asarray(binom, dtype=jnp.int32)
    rank = jnp.zeros(states.shape, dtype=jnp.int32)
    cnt = jnp.zeros(states.shape, dtype=jnp.int32)
    for p in range(L):
        bit = ((states >> np.uint32(p)) & np.uint32(1)).astype(jnp.int32)
        cnt = cnt + bit
        # C(p, cnt) — only added when bit set; clamp k index for safety.
        k = jnp.minimum(cnt, binom.shape[1] - 1)
        rank = rank + bit * binom[p, k]
    return rank


def rank_state(state: int, L: int, nup: int) -> int:
    """Host scalar rank of one state in the ascending sector basis."""
    rank, cnt = 0, 0
    for p in range(L):
        if (state >> p) & 1:
            cnt += 1
            rank += math.comb(p, cnt)
    return rank


def unrank_states(idx, L: int, nup: int, binom) -> jax.Array:
    """Vectorized combinadic unrank: basis index -> uint32 state, jit-compatible.

    Enables ON-DEVICE basis enumeration (states = unrank_states(arange(N), ...)):
    at L >= 28 the sector has 4e7..6e8 states and host enumeration is the
    bottleneck; this is L fused vector ops on the accelerator instead."""
    idx = jnp.asarray(idx, jnp.int32)
    binom = jnp.asarray(binom, dtype=jnp.int32)
    state = jnp.zeros(idx.shape, jnp.uint32)
    k = jnp.full(idx.shape, nup, jnp.int32)
    for p in range(L - 1, -1, -1):
        c = binom[p, jnp.clip(k, 0, binom.shape[1] - 1)]
        take = jnp.logical_and(k > 0, idx >= c)
        state = jnp.where(take, state | np.uint32(1 << p), state)
        idx = jnp.where(take, idx - c, idx)
        k = jnp.where(take, k - 1, k)
    return state


def unrank(idx: int, L: int, nup: int) -> int:
    """Host inverse of rank_state: idx -> state bitstring (colex combinadic)."""
    state = 0
    k = nup
    for p in range(L - 1, -1, -1):
        if k == 0:
            break
        c = math.comb(p, k)
        if idx >= c:
            state |= 1 << p
            idx -= c
            k -= 1
    return state


# -----------------------------------------------------------------------------
# Bit helpers (vectorized analogs of ref src/Hamiltonian.jl:19-29)
# -----------------------------------------------------------------------------


def bit_at(states, i: int):
    """Value (0/1) of bit i of each state (ref: src/Hamiltonian.jl:19-21)."""
    states = jnp.asarray(states)
    return ((states >> np.uint32(i)) & np.uint32(1)).astype(jnp.int32)


def sz_value(bits, dtype=jnp.float32):
    """S^z eigenvalue +-0.5 from a 0/1 bit (ref: src/Hamiltonian.jl:23-25)."""
    return jnp.asarray(bits).astype(dtype) - dtype(0.5)


def flip_bits(states, i: int, j: int):
    """XOR-flip bits i and j (ref: src/Hamiltonian.jl:27-29)."""
    states = jnp.asarray(states)
    mask = np.uint32((1 << i) | (1 << j))
    return states ^ mask
