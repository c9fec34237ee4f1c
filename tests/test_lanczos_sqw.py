"""Lanczos S(q, omega) vs exact broadened pole sum (ref src/LanczosSqw.jl)."""

import jax.numpy as jnp
import numpy as np
import pytest

from spindynamics_tpu import (
    build_dense_H,
    lanczos_groundstate,
    lanczos_sqw,
    matvec_fn,
    spectral_from_tridiagonal,
    sz_q_vector,
    xxz_chain,
)


@pytest.fixture(scope="module")
def setup():
    m = xxz_chain(8, Jxy=1.0, Jz=1.0, nup=4, dtype=jnp.float64)
    H = build_dense_H(m)
    evals, evecs = np.linalg.eigh(H)
    mv = matvec_fn(m)
    E0, psi0, _ = lanczos_groundstate(mv, m.n_states, lanc_m=70, dtype=jnp.float64)
    return m, H, evals, evecs, float(E0), np.asarray(psi0)


def exact_sqw(m, evals, evecs, psi0, q, omega, eta):
    """S(q, w) = sum_n |<n|Sz_q|0>|^2 Lorentz(w - (E_n - E0))."""
    phi = np.asarray(sz_q_vector(m, jnp.asarray(psi0 + 0j), q, dtype=jnp.complex128))
    amps = np.abs(evecs.T.conj() @ phi) ** 2
    E0 = float(np.dot(psi0, np.asarray(build_dense_H(m)) @ psi0))
    out = np.zeros_like(omega)
    for En, w2 in zip(evals, amps):
        out += w2 * (1 / np.pi) * eta / ((omega - (En - E0)) ** 2 + eta**2)
    return out


def test_lanczos_sqw_matches_exact(setup):
    m, H, evals, evecs, E0, psi0 = setup
    eta = 0.08
    omega = np.linspace(0.0, 4.0, 120)
    q_list = [2 * np.pi * k / m.L for k in [1, 2, 4]]
    S = lanczos_sqw(jnp.asarray(psi0), m, q_list, omega, lanc_m=60, eta=eta)
    assert S.shape == (3, 120)
    for iq, q in enumerate(q_list):
        want = exact_sqw(m, evals, evecs, psi0, q, omega, eta)
        assert np.allclose(S[iq], want, atol=1e-5 + 0.02 * want.max())


def test_lanczos_sqw_gaussian_broadening(setup):
    m, H, evals, evecs, E0, psi0 = setup
    omega = np.linspace(0.0, 4.0, 60)
    S = lanczos_sqw(jnp.asarray(psi0), m, [np.pi], omega, lanc_m=50,
                    eta=0.1, broaden="gauss")
    assert np.all(np.isfinite(S))
    assert S.max() > 0


def test_zero_phi_row_is_zero(setup):
    """q = 0 at half filling: Sz_q |0> proportional to total Sz = 0 -> zero row
    (guard behavior fixed vs ref src/KPM_Sqw.jl:199-204, SURVEY.md §2.4-6)."""
    m, H, evals, evecs, E0, psi0 = setup
    omega = np.linspace(0.0, 2.0, 20)
    S = lanczos_sqw(jnp.asarray(psi0), m, [0.0], omega, lanc_m=30)
    assert np.allclose(S[0], 0.0, atol=1e-20)


def test_spectral_from_tridiagonal_single_pole():
    """alpha=[e], beta=[] -> one Lorentzian at omega = e - E0 with weight ||phi||^2."""
    omega = np.linspace(-2, 2, 200)
    eta = 0.05
    S = spectral_from_tridiagonal(np.array([1.0]), np.array([]), 2.0, 0.5, omega, eta=eta)
    want = 4.0 * (1 / np.pi) * eta / ((omega - 0.5) ** 2 + eta**2)
    assert np.allclose(S, want, atol=1e-12)
