"""Single-site operator actions (oracles: ref test/test_Hamiltonian.jl:27-44)."""

import jax.numpy as jnp
import numpy as np
import pytest

from spindynamics_tpu import (
    apply_spin_operator,
    basis_state_vector,
    build_model,
    nn_hopping,
    sz_q_vector,
    sz_q_weights,
    xxz_chain,
)


@pytest.fixture
def full_model():
    return build_model(4, hopping=nn_hopping(4, 1.0), dtype=jnp.float64)


def ket(model, bits):
    return basis_state_vector(model, bits, dtype=jnp.float64)


def test_sz_action(full_model):
    # ref test/test_Hamiltonian.jl:27-31 — Sz eigenvalue -0.5 on a down spin
    psi = ket(full_model, 0b0000)
    out = apply_spin_operator(psi, full_model, 0, "z")
    assert np.allclose(np.asarray(out), -0.5 * np.asarray(psi), atol=1e-15)
    psi1 = ket(full_model, 0b0001)
    out1 = apply_spin_operator(psi1, full_model, 0, "z")
    assert np.allclose(np.asarray(out1), 0.5 * np.asarray(psi1), atol=1e-15)


def test_splus_action(full_model):
    # S+ on a down spin gives amplitude 1 on the flipped state
    psi = ket(full_model, 0b0000)
    out = np.asarray(apply_spin_operator(psi, full_model, 2, "plus"))
    want = np.asarray(ket(full_model, 0b0100))
    assert np.allclose(out, want, atol=1e-15)
    # S+ on an up spin annihilates
    psi_up = ket(full_model, 0b0100)
    out2 = np.asarray(apply_spin_operator(psi_up, full_model, 2, "plus"))
    assert np.allclose(out2, 0.0, atol=1e-15)


def test_sminus_action(full_model):
    psi = ket(full_model, 0b0100)
    out = np.asarray(apply_spin_operator(psi, full_model, 2, "minus"))
    assert np.allclose(out, np.asarray(ket(full_model, 0b0000)), atol=1e-15)
    out0 = np.asarray(apply_spin_operator(ket(full_model, 0), full_model, 2, "minus"))
    assert np.allclose(out0, 0.0, atol=1e-15)


def test_sx_sy_actions(full_model):
    # ref test/test_Hamiltonian.jl:38-44: Sx amplitude 0.5, Sy amplitude -0.5i on down
    psi = ket(full_model, 0b0000)
    outx = np.asarray(apply_spin_operator(psi, full_model, 1, "x"))
    assert np.allclose(outx, 0.5 * np.asarray(ket(full_model, 0b0010)), atol=1e-15)
    outy = np.asarray(apply_spin_operator(psi, full_model, 1, "y"))
    assert np.allclose(outy, -0.5j * np.asarray(ket(full_model, 0b0010)), atol=1e-15)
    # on an up spin: Sy amplitude +0.5i
    psi_up = ket(full_model, 0b0010)
    outy2 = np.asarray(apply_spin_operator(psi_up, full_model, 1, "y"))
    assert np.allclose(outy2, 0.5j * np.asarray(ket(full_model, 0b0000)), atol=1e-15)


def test_operator_algebra(full_model, rng):
    """Sz = (S+S- - S-S+)/2 and Sx, Sy consistency on random vectors."""
    m = full_model
    psi = jnp.asarray(rng.normal(size=m.n_states))
    for site in range(m.L):
        sp = lambda v: apply_spin_operator(v, m, site, "plus")
        sm = lambda v: apply_spin_operator(v, m, site, "minus")
        sz = np.asarray(apply_spin_operator(psi, m, site, "z"))
        comm = 0.5 * (np.asarray(sm(sp(psi))) * -1 + np.asarray(sp(sm(psi))))
        assert np.allclose(comm, sz, atol=1e-12)


def test_sector_flip_operators_vanish():
    m = xxz_chain(4, nup=2, dtype=jnp.float64)
    psi = jnp.ones(m.n_states, dtype=jnp.float64)
    for kind in ("plus", "minus", "x", "y"):
        out = np.asarray(apply_spin_operator(psi, m, 1, kind))
        assert np.allclose(out, 0.0)


def test_sz_q_vector_matches_direct(rng):
    """phi = L^{-1/2} sum_r e^{iqr} Sz_r psi, against explicit site loop
    (race-free replacement for ref src/Hamiltonian.jl:218-234)."""
    m = xxz_chain(5, nup=2, dtype=jnp.float64)
    psi = jnp.asarray(rng.normal(size=m.n_states) + 1j * rng.normal(size=m.n_states))
    q = 2 * np.pi * 2 / m.L
    want = np.zeros(m.n_states, dtype=complex)
    for r in range(m.L):
        szr = np.asarray(apply_spin_operator(psi, m, r, "z"))
        want += np.exp(1j * q * r) * szr
    want /= np.sqrt(m.L)
    got = np.asarray(sz_q_vector(m, psi, q, dtype=jnp.complex128))
    assert np.allclose(got, want, atol=1e-12)
