"""Observables against brute-force dense evaluation (ref src/Observables.jl)."""

import jax.numpy as jnp
import numpy as np
import pytest

from spindynamics_tpu import (
    connected_correlations,
    magnetization_per_site,
    neel_state,
    structure_factor_Sq,
    structure_factor_Sq_dict,
    xxz_chain,
)


def brute_force_obs(psi, model):
    L = model.L
    states = np.asarray(model.states)
    p = np.abs(np.asarray(psi)) ** 2
    sz = np.stack(
        [((states >> i) & 1).astype(float) - 0.5 for i in range(L)], axis=1
    )  # [N, L]
    mags = p @ sz
    szsz = (sz * p[:, None]).T @ sz
    C_r = np.zeros(L)
    for r in range(L):
        tmp = 0.0
        for i in range(L):
            j = (i + r) % L
            tmp += szsz[i, j] - mags[i] * mags[j]
        C_r[r] = tmp / L
    return mags, C_r


@pytest.mark.parametrize("mode_nup", [None, 3])
def test_magnetization_and_correlations(mode_nup, rng):
    L = 6
    m = xxz_chain(L, nup=mode_nup, dtype=jnp.float64)
    psi = rng.normal(size=m.n_states) + 1j * rng.normal(size=m.n_states)
    psi /= np.linalg.norm(psi)
    psi = jnp.asarray(psi)

    want_mags, want_Cr = brute_force_obs(psi, m)
    mags = np.asarray(magnetization_per_site(psi, m))
    assert np.allclose(mags, want_mags, atol=1e-12)

    C_r = np.asarray(connected_correlations(psi, m))
    assert np.allclose(C_r, want_Cr, atol=1e-12)


def test_structure_factor_fft(rng):
    L = 6
    m = xxz_chain(L, nup=3, dtype=jnp.float64)
    psi = rng.normal(size=m.n_states)
    psi /= np.linalg.norm(psi)
    psi = jnp.asarray(psi)
    _, want_Cr = brute_force_obs(psi, m)
    q, Sq = structure_factor_Sq(psi, m)
    # S(q) = FFT of C_r (ref src/Observables.jl:101-110)
    want = np.real(np.fft.fft(want_Cr))
    assert np.allclose(np.asarray(Sq), want, atol=1e-12)
    assert np.allclose(np.asarray(q), 2 * np.pi * np.arange(L) / L)
    d = structure_factor_Sq_dict(psi, m)
    assert len(d) == L


def test_neel_magnetization():
    L = 6
    m = xxz_chain(L, nup=3, dtype=jnp.float64)
    psi = neel_state(m)
    mags = np.asarray(magnetization_per_site(psi, m))
    want = np.array([0.5 if i % 2 == 0 else -0.5 for i in range(L)])
    assert np.allclose(mags, want, atol=1e-14)


def test_magnetization_sums_to_sz(rng):
    L, nup = 6, 2
    m = xxz_chain(L, nup=nup, dtype=jnp.float64)
    psi = rng.normal(size=m.n_states)
    psi /= np.linalg.norm(psi)
    mags = np.asarray(magnetization_per_site(jnp.asarray(psi), m))
    assert np.isclose(mags.sum(), nup - L / 2, atol=1e-12)
