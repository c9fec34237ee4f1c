"""Quantum typicality vs exact thermal correlators (clean reimplementation of the
reference's dead src/TimeEvolution/QuantumTypicality.jl, SURVEY.md §2.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from spindynamics_tpu import (
    build_dense_H,
    make_spin_operator,
    matvec_fn,
    thermal_state,
    typicality_correlation_function,
    xxz_chain,
)


@pytest.fixture(scope="module")
def setup():
    m = xxz_chain(6, Jxy=1.0, Jz=0.5, nup=3, dtype=jnp.float64)
    H = build_dense_H(m)
    return m, H


def exact_thermal_correlation(H, m, beta, site_a, site_b, t_points):
    """<A(t) B(0)>_beta = Tr[e^{-beta H} e^{iHt} A e^{-iHt} B] / Z, A=Sz_a, B=Sz_b."""
    states = np.asarray(m.states)
    sza = np.diag(((states >> site_a) & 1) - 0.5)
    szb = np.diag(((states >> site_b) & 1) - 0.5)
    rho = scipy.linalg.expm(-beta * H)
    Z = np.trace(rho)
    out = []
    for t in t_points:
        U = scipy.linalg.expm(-1j * t * H)
        A_t = U.conj().T @ sza @ U
        out.append(np.trace(rho @ A_t @ szb) / Z)
    return np.array(out)


def test_thermal_state_energy(setup):
    """<psi_beta|H|psi_beta> converges to the thermal energy (typicality average)."""
    m, H = setup
    beta = 1.0
    rho = scipy.linalg.expm(-beta * H)
    E_exact = np.trace(rho @ H) / np.trace(rho)
    es = []
    for seed in range(12):
        psi_b, _ = thermal_state(m, beta, key=jax.random.PRNGKey(seed), kry_m=40,
                                 dtype=jnp.complex128)
        psi = np.asarray(psi_b)
        es.append(np.real(np.vdot(psi, H @ psi)))
    # typicality variance shrinks with Hilbert dim; N=20 here, so average samples
    assert np.mean(es) == pytest.approx(E_exact, abs=0.25)


@pytest.mark.parametrize("method", ["krylov", "chebyshev", "rk4"])
def test_typicality_correlation_methods_agree(setup, method):
    """All three evolution engines produce the same sample correlator."""
    m, H = setup
    beta = 0.5
    t_points = [0.0, 0.2, 0.4]
    opA = make_spin_operator(2, "z")
    opB = make_spin_operator(2, "z")
    kwargs = dict(key=jax.random.PRNGKey(3), kry_m=40, cheb_n=40, rk4_substeps=40)
    C = typicality_correlation_function(
        m, beta, opA, opB, t_points, method=method, **kwargs
    )
    C_ref = typicality_correlation_function(
        m, beta, opA, opB, t_points, method="krylov", **kwargs
    )
    assert np.allclose(C, C_ref, atol=1e-5)


def test_typicality_matches_exact_average(setup):
    """Averaged over samples, the typicality correlator approaches the exact
    thermal <Sz_a(t) Sz_b(0)>_beta."""
    m, H = setup
    beta = 1.0
    t_points = [0.0, 0.3]
    a_site, b_site = 2, 3
    want = exact_thermal_correlation(H, m, beta, a_site, b_site, t_points)
    samples = []
    for seed in range(16):
        C = typicality_correlation_function(
            m, beta,
            make_spin_operator(a_site, "z"),
            make_spin_operator(b_site, "z"),
            t_points,
            method="krylov",
            key=jax.random.PRNGKey(seed),
            kry_m=40,
        )
        samples.append(C)
    got = np.mean(samples, axis=0)
    assert np.allclose(got, want, atol=0.05)
