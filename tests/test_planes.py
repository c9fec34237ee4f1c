"""Real-plane solver variants == complex implementations (CPU oracle)."""

import jax.numpy as jnp
import numpy as np
import pytest

from spindynamics_tpu import (
    build_dense_H,
    chebyshev_moments,
    chebyshev_time_evolve,
    domain_wall_state,
    krylov_time_evolve,
    lanczos_groundstate,
    lanczos_sqw,
    kpm_sqw,
    matvec_fn,
    sz_q_vector,
    xxz_chain,
)
from spindynamics_tpu.ops.apply import apply_rescaled_H
from spindynamics_tpu.solvers.planes import (
    chebyshev_moments_planes,
    chebyshev_time_evolve_planes,
    kpm_sqw_planes,
    krylov_time_evolve_planes,
    lanczos_sqw_planes,
    planes_matvec_fn,
    sz_q_planes,
)
from spindynamics_tpu.utils.complex_io import planes_from_complex
from functools import partial


@pytest.fixture(scope="module")
def setup(): 
    m = xxz_chain(8, Jxy=1.0, Jz=0.7, nup=4, dtype=jnp.float64)
    rng = np.random.default_rng(5)
    psi = rng.normal(size=m.n_states) + 1j * rng.normal(size=m.n_states)
    psi /= np.linalg.norm(psi)
    return m, jnp.asarray(psi)


def as_planes(psi):
    return jnp.asarray(planes_from_complex(psi), jnp.float32)


def to_c(planes):
    p = np.asarray(planes)
    return p[0] + 1j * p[1]


def test_sz_q_planes(setup):
    m, psi = setup
    q = 2 * np.pi / m.L
    want = np.asarray(sz_q_vector(m, psi, q, dtype=jnp.complex128))
    got = to_c(sz_q_planes(m, as_planes(psi), q))
    assert np.allclose(got, want, atol=1e-5)


def test_chebyshev_planes(setup):
    m, psi = setup
    mv = matvec_fn(m)
    bounds = (-8.0, 8.0)
    want = np.asarray(chebyshev_time_evolve(psi, mv, 0.2, bounds, cheb_n=30))
    got = to_c(chebyshev_time_evolve_planes(as_planes(psi), m, 0.2, bounds,
                                            cheb_n=30))
    assert np.allclose(got, want, atol=1e-5)


def test_krylov_planes(setup):
    m, psi = setup
    mv = matvec_fn(m)
    want = np.asarray(krylov_time_evolve(psi, mv, 0.2, kry_m=25))
    got = to_c(krylov_time_evolve_planes(as_planes(psi), m, 0.2, kry_m=25))
    assert np.allclose(got, want, atol=2e-5)


def test_moments_planes(setup):
    m, psi = setup
    a, b = 6.0, -0.5
    mvr = partial(apply_rescaled_H, model=m, a=a, b=b)
    want = np.asarray(chebyshev_moments(mvr, psi, 32))
    got = np.asarray(chebyshev_moments_planes(m, as_planes(psi), 32, a, b))
    assert np.allclose(got, want, atol=2e-5)


def test_sqw_planes_paths(setup):
    m, _ = setup
    mv = matvec_fn(m)
    E0, psi0, _ = lanczos_groundstate(mv, m.n_states, lanc_m=50, dtype=jnp.float64)
    q = [np.pi, np.pi / 2]
    omega = np.linspace(0, 3, 40)
    psi0_planes = jnp.stack([jnp.asarray(psi0, jnp.float32),
                             jnp.zeros(m.n_states, jnp.float32)])
    S_ref = lanczos_sqw(psi0, m, q, omega, lanc_m=40, eta=0.1)
    S_pl = lanczos_sqw_planes(psi0_planes, m, q, omega, E0, lanc_m=40, eta=0.1)
    assert np.allclose(S_pl, S_ref, atol=1e-3 + 0.02 * S_ref.max())

    a, b = 7.0, -0.5
    K_ref = np.asarray(kpm_sqw(psi0, m, q, omega, a=a, b=b, kpm_m=64,
                               doubling_trick=False))
    K_pl = kpm_sqw_planes(psi0_planes, m, q, omega, a, b, kpm_m=64)
    assert np.allclose(K_pl, K_ref, atol=1e-4 + 0.02 * max(K_ref.max(), 1e-9))


def test_krylov_imaginary_planes(setup):
    from spindynamics_tpu import krylov_imaginary_time_evolve
    from spindynamics_tpu.solvers.planes import krylov_imaginary_time_evolve_planes

    m, psi = setup
    mv = matvec_fn(m)
    want = np.asarray(krylov_imaginary_time_evolve(psi, mv, 0.4, kry_m=25))
    got = to_c(krylov_imaginary_time_evolve_planes(as_planes(psi), m, 0.4,
                                                   kry_m=25))
    assert np.allclose(got, want, atol=2e-4 * np.abs(want).max() + 1e-6)


def test_spin_operator_planes(setup):
    from spindynamics_tpu import apply_spin_operator, build_model, nn_hopping
    from spindynamics_tpu.solvers.planes import apply_spin_operator_planes

    m = build_model(6, hopping=nn_hopping(6, 1.0), dtype=jnp.float64)
    rng = np.random.default_rng(2)
    psi = rng.normal(size=m.n_states) + 1j * rng.normal(size=m.n_states)
    psi = jnp.asarray(psi)
    for kind in ("z", "plus", "minus", "x", "y"):
        want = np.asarray(apply_spin_operator(psi, m, 2, kind))
        got = to_c(apply_spin_operator_planes(as_planes(psi), m, 2, kind))
        assert np.allclose(got, want, atol=1e-6), kind


def test_typicality_planes_matches_complex():
    import jax
    from spindynamics_tpu import (
        make_spin_operator, typicality_correlation_function, xxz_chain)
    from spindynamics_tpu.solvers.planes import (
        typicality_correlation_function_planes)

    m = xxz_chain(8, Jxy=1.0, Jz=0.5, nup=4, dtype=jnp.float64)
    ts = [0.0, 0.3]
    C_ref = typicality_correlation_function(
        m, 1.0, make_spin_operator(2, "z"), make_spin_operator(3, "z"), ts,
        method="chebyshev", key=jax.random.PRNGKey(4), kry_m=30, cheb_n=40,
    )
    C_pl = typicality_correlation_function_planes(
        m, 1.0, 2, 3, ts, key=jax.random.PRNGKey(4), kry_m=30, cheb_n=40,
    )
    assert np.allclose(C_pl, C_ref, atol=2e-4)


def test_moments_planes_doubling(setup):
    from spindynamics_tpu.solvers.planes import chebyshev_moments_planes

    m, psi = setup
    a, b = 6.0, -0.5
    plain = np.asarray(chebyshev_moments_planes(m, as_planes(psi), 33, a, b))
    doubled = np.asarray(chebyshev_moments_planes(m, as_planes(psi), 33, a, b,
                                                  doubling_trick=True))
    assert np.allclose(doubled, plain, atol=2e-5)


def test_kpm_dynamical_correlation_planes_matches(setup):
    from spindynamics_tpu import kpm_dynamical_correlation, make_spin_operator
    from spindynamics_tpu.solvers.planes import (
        kpm_dynamical_correlation_planes, spin_operator_planes_fn)

    m, psi = setup
    a, b = 7.0, -0.5
    omega = np.linspace(-2.0, 2.0, 48)
    want = np.asarray(kpm_dynamical_correlation(
        psi, make_spin_operator(2, "z"), make_spin_operator(5, "z"),
        omega, m, n=48, a=a, b=b))
    got = np.asarray(kpm_dynamical_correlation_planes(
        as_planes(psi), spin_operator_planes_fn(2, "z"),
        spin_operator_planes_fn(5, "z"), omega, m, n=48, a=a, b=b))
    assert np.allclose(got, want, atol=1e-4 + 2e-4 * max(want.max(), 1e-9))


def test_kpm_correlation_matrix_planes_matches(setup):
    from spindynamics_tpu import kpm_correlation_matrix
    from spindynamics_tpu.solvers.planes import kpm_correlation_matrix_planes

    m, psi = setup
    a, b = 7.0, -0.5
    omega = np.linspace(-1.0, 1.0, 12)
    want = np.asarray(kpm_correlation_matrix(psi, omega, m, n=24, a=a, b=b))
    got = np.asarray(kpm_correlation_matrix_planes(
        as_planes(psi), omega, m, n=24, a=a, b=b))
    assert got.shape == want.shape == (m.L, m.L, 12)
    assert np.allclose(got, want, atol=1e-4 + 2e-4 * want.max())
