"""f32 numerics: the TPU default dtype must reach the reference's observable
tolerances (rtol 1e-6 / atol 1e-3, ref test/runtests.jl:130) — SURVEY.md §7
calls out f32 drift in long recurrences as a hard part."""

import jax.numpy as jnp
import numpy as np
import pytest

from spindynamics_tpu import (
    build_dense_H,
    chebyshev_time_evolve,
    domain_wall_state,
    krylov_time_evolve,
    lanczos_groundstate,
    magnetization_per_site,
    matvec_fn,
    xxz_chain,
)


@pytest.fixture(scope="module")
def setup():
    m64 = xxz_chain(10, Jxy=1.0, Jz=0.5, nup=5, dtype=jnp.float64)
    m32 = xxz_chain(10, Jxy=1.0, Jz=0.5, nup=5, dtype=jnp.float32)
    H = build_dense_H(m64)
    evals = np.linalg.eigvalsh(H)
    return m32, m64, H, evals


def test_f32_groundstate_energy(setup):
    m32, m64, H, evals = setup
    E0, psi, info = lanczos_groundstate(
        matvec_fn(m32), m32.n_states, lanc_m=80, dtype=jnp.float32
    )
    # full reorth keeps f32 Lanczos at ~1e-5 absolute on the energy
    assert E0 == pytest.approx(evals[0], abs=5e-4)
    assert info["residual"] < 5e-2


def test_f32_chebyshev_observables(setup):
    m32, m64, H, evals = setup
    import scipy.linalg

    psi0 = domain_wall_state(m32, dtype=jnp.complex64)
    bounds = (float(evals[0]) - 0.1, float(evals[-1]) + 0.1)
    mv = matvec_fn(m32)
    psi = psi0
    for _ in range(10):
        psi = chebyshev_time_evolve(psi, mv, 0.1, bounds, cheb_n=25)
    exact = scipy.linalg.expm(-1j * 1.0 * H) @ np.asarray(
        domain_wall_state(m64, dtype=jnp.complex128)
    )
    want = np.asarray(magnetization_per_site(jnp.asarray(exact), m64))
    got = np.asarray(magnetization_per_site(psi, m32))
    # reference observable tolerance
    assert np.allclose(got, want, rtol=1e-4, atol=1e-3)
    # norm preservation < 1e-3 (ref test/runtests.jl:143)
    assert abs(float(jnp.linalg.norm(psi)) - 1.0) < 1e-3


def test_f32_krylov_norm_drift(setup):
    m32, _, _, _ = setup
    psi = domain_wall_state(m32, dtype=jnp.complex64)
    mv = matvec_fn(m32)
    for _ in range(20):
        psi = krylov_time_evolve(psi, mv, 0.1, kry_m=20)
    assert abs(float(jnp.linalg.norm(psi)) - 1.0) < 1e-3
