"""Basis invariants (oracles: ref test/test_SpinModel.jl and test/runtests.jl:12-46)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from spindynamics_tpu import (
    binomial_table,
    bit_at,
    build_full_basis,
    build_sector_basis,
    flip_bits,
    rank_state,
    rank_states,
    sector_dimension,
    sz_value,
    unrank,
)


def popcount(arr):
    arr = np.asarray(arr, dtype=np.uint32)
    return np.array([bin(int(s)).count("1") for s in arr])


def test_full_basis_dimension():
    # ref test/test_SpinModel.jl:20 — full dim 2^L
    for L in (1, 4, 8):
        states = build_full_basis(L)
        assert states.shape == (1 << L,)
        assert np.array_equal(states, np.arange(1 << L))


@pytest.mark.parametrize("L,nup", [(4, 2), (6, 3), (8, 3), (10, 5), (12, 4)])
def test_sector_basis_invariants(L, nup):
    states = build_sector_basis(L, nup)
    # dimension C(L, nup) (ref src/Basis.jl:26)
    assert states.shape == (math.comb(L, nup),)
    # bit-count invariant (ref test/test_SpinModel.jl:26)
    assert np.all(popcount(states) == nup)
    # ascending and unique (our ordering contract)
    assert np.all(np.diff(states.astype(np.int64)) > 0)


@pytest.mark.parametrize("L,nup", [(4, 2), (8, 3), (10, 5), (12, 6)])
def test_rank_unrank_roundtrip(L, nup):
    states = build_sector_basis(L, nup)
    N = states.shape[0]
    # host scalar rank
    for idx in [0, 1, N // 2, N - 1]:
        s = int(states[idx])
        assert rank_state(s, L, nup) == idx
        assert unrank(idx, L, nup) == s
    # vectorized jnp rank over the whole basis
    binom = binomial_table(L, nup)
    ranks = np.asarray(rank_states(jnp.asarray(states), L, binom))
    assert np.array_equal(ranks, np.arange(N))


def test_binomial_table():
    C = binomial_table(12)
    for n in range(13):
        for k in range(n + 1):
            assert C[n, k] == math.comb(n, k)


def test_bit_helpers():
    # ref test/test_Hamiltonian.jl:16-20
    s = jnp.asarray([0b1010], dtype=jnp.uint32)
    assert int(bit_at(s, 0)[0]) == 0
    assert int(bit_at(s, 1)[0]) == 1
    assert float(sz_value(bit_at(s, 1))[0]) == 0.5
    assert float(sz_value(bit_at(s, 0))[0]) == -0.5
    assert int(flip_bits(s, 0, 1)[0]) == 0b1001


def test_sector_dimension():
    assert sector_dimension(20, 10) == 184756
