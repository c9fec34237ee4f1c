"""Time evolution vs dense expm (oracle pattern of examples/example.jl:86-105
and legacy tests test/runtests.jl:121-201)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from spindynamics_tpu import (
    build_dense_H,
    chebyshev_time_evolve,
    domain_wall_state,
    krylov_expm_multiply,
    krylov_imaginary_time_evolve,
    krylov_time_evolve,
    magnetization_per_site,
    matvec_fn,
    rk4_time_step,
    xxz_chain,
)


@pytest.fixture(scope="module")
def setup():
    m = xxz_chain(8, Jxy=1.0, Jz=0.5, nup=4, dtype=jnp.float64)
    H = build_dense_H(m)
    evals = np.linalg.eigvalsh(H)
    psi0 = np.asarray(domain_wall_state(m, dtype=jnp.complex128))
    return m, H, (float(evals[0]), float(evals[-1])), psi0


def exact_evolve(H, psi, t):
    return scipy.linalg.expm(-1j * t * H) @ psi


def test_chebyshev_single_step(setup):
    m, H, bounds, psi0 = setup
    mv = matvec_fn(m)
    dt = 0.1
    want = exact_evolve(H, psi0, dt)
    got = np.asarray(
        chebyshev_time_evolve(jnp.asarray(psi0), mv, dt, bounds, cheb_n=30)
    )
    assert np.allclose(got, want, atol=1e-10)
    # norm preservation (ref test/runtests.jl:143 tolerance 1e-3; we do better)
    assert abs(np.linalg.norm(got) - 1.0) < 1e-10


def test_chebyshev_identity_at_t0(setup):
    # ref legacy oracle: identity at t=0 (test/runtests.jl:121-201)
    m, H, bounds, psi0 = setup
    mv = matvec_fn(m)
    got = np.asarray(chebyshev_time_evolve(jnp.asarray(psi0), mv, 0.0, bounds, cheb_n=20))
    assert np.allclose(got, psi0, atol=1e-12)


def test_chebyshev_many_steps_fidelity(setup):
    """200 steps to t=5 with cheb_n=10, as examples/example.jl:42,96; fidelity ~ 1."""
    m, H, bounds, psi0 = setup
    mv = matvec_fn(m)
    dt, nsteps = 0.025, 40  # t = 1.0, trimmed for test runtime
    psi = jnp.asarray(psi0)
    for _ in range(nsteps):
        psi = chebyshev_time_evolve(psi, mv, dt, bounds, cheb_n=20)
    want = exact_evolve(H, psi0, dt * nsteps)
    fid = abs(np.vdot(want, np.asarray(psi)))
    assert fid == pytest.approx(1.0, abs=1e-8)


def test_krylov_single_step(setup):
    m, H, bounds, psi0 = setup
    mv = matvec_fn(m)
    dt = 0.1
    want = exact_evolve(H, psi0, dt)
    got = np.asarray(krylov_time_evolve(jnp.asarray(psi0), mv, dt, kry_m=30))
    assert np.allclose(got, want, atol=1e-8)


def test_krylov_observables_match_exact(setup):
    # observable agreement rtol 1e-6 / atol 1e-3 (ref test/runtests.jl:130)
    m, H, bounds, psi0 = setup
    mv = matvec_fn(m)
    t = 0.5
    psi = jnp.asarray(psi0)
    for _ in range(5):
        psi = krylov_time_evolve(psi, mv, 0.1, kry_m=30)
    want_m = np.asarray(magnetization_per_site(jnp.asarray(exact_evolve(H, psi0, t)), m))
    got_m = np.asarray(magnetization_per_site(psi, m))
    assert np.allclose(got_m, want_m, rtol=1e-6, atol=1e-3)


def test_krylov_imaginary_time(setup):
    m, H, bounds, psi0 = setup
    mv = matvec_fn(m)
    tau = 0.3
    want = scipy.linalg.expm(-tau * H) @ psi0
    got = np.asarray(krylov_imaginary_time_evolve(jnp.asarray(psi0), mv, tau, kry_m=40))
    assert np.allclose(got, want, atol=1e-8)


def test_krylov_expm_multiply_general(setup):
    m, H, bounds, psi0 = setup
    mv = matvec_fn(m)
    z = -0.2 + 0.15j
    want = scipy.linalg.expm(z * H) @ psi0
    got = np.asarray(krylov_expm_multiply(jnp.asarray(psi0), mv, z, kry_m=40))
    assert np.allclose(got, want, atol=1e-8)


def test_rk4_step(setup):
    m, H, bounds, psi0 = setup
    mv = matvec_fn(m)
    dt = 0.01
    want = exact_evolve(H, psi0, dt)
    got = np.asarray(rk4_time_step(jnp.asarray(psi0), mv, dt))
    assert np.allclose(got, want, atol=1e-9)  # O(dt^5) local error


def test_chebyshev_krylov_agree(setup):
    m, H, bounds, psi0 = setup
    mv = matvec_fn(m)
    dt = 0.2
    a = np.asarray(chebyshev_time_evolve(jnp.asarray(psi0), mv, dt, bounds, cheb_n=40))
    b = np.asarray(krylov_time_evolve(jnp.asarray(psi0), mv, dt, kry_m=40))
    assert np.allclose(a, b, atol=1e-9)
