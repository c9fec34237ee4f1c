"""Initial-state constructors (oracles: ref test/test_InitialStates.jl)."""

import jax.numpy as jnp
import numpy as np
import pytest

from spindynamics_tpu import (
    basis_state_vector,
    build_model,
    domain_wall_state,
    neel_state,
    polarized_state,
    polarized_state_with_flips,
    state_index,
    xxz_chain,
)
from spindynamics_tpu.models.initial_states import (
    domain_wall_bitstring,
    neel_bitstring,
    polarized_bitstring,
)


def one_hot_checks(vec, model, expected_bits):
    v = np.asarray(vec)
    assert np.sum(v != 0) == 1  # one-hot (ref test/test_InitialStates.jl:17-21)
    idx = int(np.argmax(np.abs(v)))
    assert v[idx] == 1.0
    assert int(np.asarray(model.states)[idx]) == expected_bits


def test_domain_wall_sector():
    m = xxz_chain(4, nup=2, dtype=jnp.float64)
    # first nup bits set (ref src/InitialStates.jl:11-18)
    one_hot_checks(domain_wall_state(m), m, 0b0011)


def test_domain_wall_full():
    # full mode bit pattern (ref test/test_InitialStates.jl:23-28): nup=ceil(L/2)
    m = build_model(5, dtype=jnp.float64)
    assert domain_wall_bitstring(m) == 0b00111
    one_hot_checks(domain_wall_state(m), m, 0b00111)


def test_neel():
    m = xxz_chain(6, nup=3, dtype=jnp.float64)
    # up at sites 0,2,4 (ref: odd 1-based sites; src/InitialStates.jl:37-41)
    assert neel_bitstring(m) == 0b010101
    one_hot_checks(neel_state(m), m, 0b010101)


def test_polarized_full():
    m = build_model(4, dtype=jnp.float64)
    one_hot_checks(polarized_state(m, up=True), m, 0b1111)
    one_hot_checks(polarized_state(m, up=False), m, 0b0000)
    assert polarized_bitstring(m, True) == 0b1111


def test_polarized_sector_errors_when_absent():
    # ref src/InitialStates.jl:74-77
    m = xxz_chain(4, nup=2, dtype=jnp.float64)
    with pytest.raises(ValueError):
        polarized_state(m, up=True)


def test_polarized_in_matching_sector():
    m = xxz_chain(4, nup=4, dtype=jnp.float64)
    one_hot_checks(polarized_state(m, up=True), m, 0b1111)


def test_polarized_with_flips():
    m = xxz_chain(5, nup=3, dtype=jnp.float64)
    # all-up with sites 1 and 3 flipped (ref src/InitialStates.jl:93-110)
    vec = polarized_state_with_flips(m, [1, 3])
    one_hot_checks(vec, m, 0b10101)


def test_state_index_consistency():
    m = xxz_chain(6, nup=3, dtype=jnp.float64)
    states = np.asarray(m.states)
    for idx in (0, 5, len(states) - 1):
        assert state_index(m, int(states[idx])) == idx
    with pytest.raises(ValueError):
        state_index(m, 0b111111)  # wrong magnetization


def test_uniform_vector_api():
    """Unlike the reference (UInt64 in full mode, vector in sector mode —
    SURVEY.md §2.4-8), both modes return a state vector."""
    for m in (xxz_chain(4, nup=2), build_model(4)):
        v = domain_wall_state(m)
        assert v.shape == (m.n_states,)
