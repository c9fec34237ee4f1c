"""Embedded-sector layout: sector physics in the full 2^L space on the
gather-free flip backend must agree exactly with the compact sector layout."""

import jax.numpy as jnp
import numpy as np
import pytest

from spindynamics_tpu import (
    apply_H,
    build_model,
    chebyshev_time_evolve,
    domain_wall_state,
    lanczos_groundstate,
    magnetization_per_site,
    matvec_fn,
    neel_state,
    nn_hopping,
    structure_factor_Sq,
    thermal_state,
    xxz_chain,
)


@pytest.fixture(scope="module")
def models():
    L, nup = 8, 4
    kw = dict(Jxy=1.0, Jz=0.5, h=np.linspace(-0.2, 0.2, L))
    m_sec = xxz_chain(L, nup=nup, dtype=jnp.float64, **kw)
    m_emb = build_model(
        L, nup=nup, hopping=nn_hopping(L, 1.0),
        onsite_field=np.linspace(-0.2, 0.2, L),
        zz=[(i, i + 1, 0.5) for i in range(L - 1)],
        dtype=jnp.float64, layout="embedded",
    )
    return m_sec, m_emb


def embed(psi_sec, m_sec, m_emb):
    out = np.zeros(m_emb.n_states, dtype=np.asarray(psi_sec).dtype)
    out[np.asarray(m_sec.states)] = np.asarray(psi_sec)
    return jnp.asarray(out)


def test_embedded_mode_basics(models):
    m_sec, m_emb = models
    assert m_emb.mode == "embedded"
    assert m_emb.n_states == 2**8
    mask = np.asarray(m_emb.valid_mask())
    assert mask.sum() == m_sec.n_states


def test_embedded_matvec_agrees(models, rng):
    m_sec, m_emb = models
    psi = jnp.asarray(rng.normal(size=m_sec.n_states))
    out_sec = np.asarray(apply_H(psi, m_sec))
    psi_emb = embed(psi, m_sec, m_emb)
    out_emb = np.asarray(apply_H(psi_emb, m_emb))
    # in-sector values agree; out-of-sector stays zero
    assert np.allclose(out_emb[np.asarray(m_sec.states)], out_sec, atol=1e-12)
    mask = np.asarray(m_emb.valid_mask())
    assert np.allclose(out_emb[~mask], 0.0, atol=1e-15)


def test_embedded_groundstate(models):
    m_sec, m_emb = models
    E_sec, _, _ = lanczos_groundstate(
        matvec_fn(m_sec), m_sec.n_states, lanc_m=60, dtype=jnp.float64
    )
    E_emb, psi_emb, info = lanczos_groundstate(
        matvec_fn(m_emb), m_emb.n_states, lanc_m=60, dtype=jnp.float64,
        mask=m_emb.valid_mask(),
    )
    assert E_emb == pytest.approx(E_sec, abs=1e-9)
    assert info["residual"] < 1e-6


def test_embedded_initial_states_and_observables(models):
    m_sec, m_emb = models
    for ctor in (domain_wall_state, neel_state):
        v_sec = ctor(m_sec)
        v_emb = ctor(m_emb)
        mags_sec = np.asarray(magnetization_per_site(v_sec, m_sec))
        mags_emb = np.asarray(magnetization_per_site(v_emb, m_emb))
        assert np.allclose(mags_sec, mags_emb, atol=1e-12)
    _, Sq_sec = structure_factor_Sq(domain_wall_state(m_sec), m_sec)
    _, Sq_emb = structure_factor_Sq(domain_wall_state(m_emb), m_emb)
    assert np.allclose(np.asarray(Sq_sec), np.asarray(Sq_emb), atol=1e-12)


def test_embedded_time_evolution(models):
    m_sec, m_emb = models
    psi_sec = domain_wall_state(m_sec, dtype=jnp.complex128)
    psi_emb = domain_wall_state(m_emb, dtype=jnp.complex128)
    bounds = (-8.0, 8.0)
    out_sec = np.asarray(
        chebyshev_time_evolve(psi_sec, matvec_fn(m_sec), 0.3, bounds, cheb_n=40)
    )
    out_emb = np.asarray(
        chebyshev_time_evolve(psi_emb, matvec_fn(m_emb), 0.3, bounds, cheb_n=40)
    )
    assert np.allclose(out_emb[np.asarray(m_sec.states)], out_sec, atol=1e-11)


def test_embedded_thermal_state_stays_in_sector(models):
    m_sec, m_emb = models
    psi_b, _ = thermal_state(m_emb, beta=1.0, kry_m=20, dtype=jnp.complex128)
    mask = np.asarray(m_emb.valid_mask())
    assert np.allclose(np.asarray(psi_b)[~mask], 0.0, atol=1e-13)


def test_embedded_sqw_agrees(models):
    """lanczos_sqw and kpm_sqw run identically on compact vs embedded layouts."""
    import numpy as np
    from spindynamics_tpu import kpm_sqw, lanczos_groundstate, lanczos_sqw

    m_sec, m_emb = models
    E_s, psi_s, _ = lanczos_groundstate(
        matvec_fn(m_sec), m_sec.n_states, lanc_m=50, dtype=jnp.float64
    )
    E_e, psi_e, _ = lanczos_groundstate(
        matvec_fn(m_emb), m_emb.n_states, lanc_m=50, dtype=jnp.float64,
        mask=m_emb.valid_mask(),
    )
    q = [2 * np.pi / 8, np.pi]
    omega = np.linspace(0, 3, 40)
    S_s = lanczos_sqw(psi_s, m_sec, q, omega, lanc_m=40, eta=0.1)
    S_e = lanczos_sqw(psi_e, m_emb, q, omega, lanc_m=40, eta=0.1)
    assert np.allclose(S_s, S_e, atol=1e-6 + 1e-4 * S_s.max())

    K_s = np.asarray(kpm_sqw(psi_s, m_sec, q, omega, a=5.0, b=0.0, kpm_m=64))
    K_e = np.asarray(kpm_sqw(psi_e, m_emb, q, omega, a=5.0, b=0.0, kpm_m=64))
    assert np.allclose(K_s, K_e, atol=1e-6 + 1e-4 * max(K_s.max(), 1e-9))
