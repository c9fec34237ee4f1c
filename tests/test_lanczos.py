"""Lanczos eigensolvers vs dense eigendecomposition (ref src/Lanczos.jl)."""

import jax.numpy as jnp
import numpy as np
import pytest

from spindynamics_tpu import (
    apply_H,
    build_dense_H,
    estimate_energy_bounds,
    lanczos_extremal,
    lanczos_groundstate,
    lanczos_groundstate_twopass,
    lanczos_iteration,
    lanczos_tridiag,
    matvec_fn,
    xxz_chain,
)


@pytest.fixture(scope="module")
def setup():
    m = xxz_chain(8, Jxy=1.0, Jz=0.5, nup=4, dtype=jnp.float64)
    H = build_dense_H(m)
    evals = np.linalg.eigvalsh(H)
    return m, H, evals


def test_lanczos_extremal(setup):
    m, H, evals = setup
    mv = matvec_fn(m)
    lo, hi = lanczos_extremal(mv, m.n_states, lanc_m=60, dtype=jnp.complex128)
    # Ritz values converge to the extremes from inside (ref src/Lanczos.jl:26-75)
    assert lo == pytest.approx(evals[0], abs=1e-8)
    assert hi == pytest.approx(evals[-1], abs=1e-8)


def test_estimate_energy_bounds_contain_spectrum(setup):
    m, H, evals = setup
    mv = matvec_fn(m)
    lo, hi = estimate_energy_bounds(mv, m.n_states, lanc_m=60, dtype=jnp.complex128)
    # expanded outward (deviation from ref shrink, see docstring)
    assert lo <= evals[0] and hi >= evals[-1]


def test_lanczos_groundstate(setup):
    m, H, evals = setup
    mv = matvec_fn(m)
    E0, psi, info = lanczos_groundstate(mv, m.n_states, lanc_m=80, dtype=jnp.float64)
    assert E0 == pytest.approx(evals[0], abs=1e-9)
    assert info["residual"] < 1e-6
    # eigenvector check: H psi = E0 psi
    hpsi = np.asarray(apply_H(psi, m))
    assert np.allclose(hpsi, E0 * np.asarray(psi), atol=1e-6)


def test_lanczos_groundstate_twopass(setup):
    m, H, evals = setup
    mv = matvec_fn(m)
    E0, psi, info = lanczos_groundstate_twopass(
        mv, m.n_states, lanc_m=60, dtype=jnp.float64
    )
    assert E0 == pytest.approx(evals[0], abs=1e-8)
    assert info["residual"] < 1e-5
    assert np.isclose(np.linalg.norm(np.asarray(psi)), 1.0, atol=1e-10)


def test_lanczos_tridiag_moments(setup):
    """The tridiagonal from a start vector reproduces moments <v|H^k|v>."""
    m, H, _ = setup
    mv = matvec_fn(m)
    rng = np.random.default_rng(7)
    v = rng.normal(size=m.n_states) + 1j * rng.normal(size=m.n_states)
    alphas, betas, norm_v = lanczos_tridiag(mv, jnp.asarray(v), lanc_m=40)
    alphas = np.asarray(alphas)
    betas = np.asarray(betas)
    assert np.isclose(float(norm_v), np.linalg.norm(v))
    T = np.diag(alphas) + np.diag(betas, 1) + np.diag(betas, -1)
    vn = v / np.linalg.norm(v)
    # moments of H in the Krylov space match exactly for k < m
    for k in range(1, 6):
        want = np.real(np.vdot(vn, np.linalg.matrix_power(H, k) @ vn))
        got = np.linalg.matrix_power(T, k)[0, 0]
        assert got == pytest.approx(want, rel=1e-9, abs=1e-9)


def test_breakdown_handling():
    """Start vector = exact eigenvector: breakdown at step 1 must not corrupt results."""
    m = xxz_chain(4, Jxy=1.0, Jz=0.5, nup=2, dtype=jnp.float64)
    H = build_dense_H(m)
    evals, evecs = np.linalg.eigh(H)
    v0 = jnp.asarray(evecs[:, 0])
    mv = matvec_fn(m)
    fac = lanczos_iteration(mv, v0, 10)
    assert int(fac.m_eff) == 1
    assert float(fac.alphas[0]) == pytest.approx(evals[0], abs=1e-10)
    assert np.allclose(np.asarray(fac.betas), 0.0, atol=1e-10)


def test_groundstate_full_mode():
    m = xxz_chain(6, Jxy=1.0, Jz=1.0, nup=None, dtype=jnp.float64,
                  build_neighbor_table=False)
    H = build_dense_H(m)
    evals = np.linalg.eigvalsh(H)
    mv = matvec_fn(m, backend="tensor")
    E0, psi, info = lanczos_groundstate(mv, m.n_states, lanc_m=70, dtype=jnp.float64)
    assert E0 == pytest.approx(evals[0], abs=1e-8)


def test_lanczos_groundstate_restarted(setup):
    """Restarted two-pass: high accuracy with O(3N) memory."""
    from spindynamics_tpu import lanczos_groundstate_restarted

    m, H, evals = setup
    mv = matvec_fn(m)
    E0, psi, info = lanczos_groundstate_restarted(
        mv, m.n_states, lanc_m=30, cycles=5, dtype=jnp.float64,
        target_residual=1e-9,
    )
    assert E0 == pytest.approx(evals[0], abs=1e-9)
    assert info["residual"] < 1e-8
