"""KPM machinery: moments vs dense Chebyshev oracle, kernels, spectra
(oracles: ref test/runtests.jl:207-245, 347-366 legacy KPM tests)."""

import jax.numpy as jnp
import numpy as np
import pytest

from spindynamics_tpu import (
    build_dense_H,
    chebyshev_cross_moments,
    chebyshev_moments,
    domain_wall_state,
    estimate_energy_bounds,
    jackson_kernel,
    kpm_dynamical_correlation,
    kpm_correlation_matrix,
    kpm_reconstruct,
    kpm_structure_factor,
    kpm_sw,
    kpm_sqw,
    lanczos_groundstate,
    lorentz_kernel,
    make_spin_operator,
    matvec_fn,
    rescaling_params,
    xxz_chain,
)
from spindynamics_tpu.ops.apply import apply_rescaled_H
from functools import partial


@pytest.fixture(scope="module")
def setup():
    m = xxz_chain(8, Jxy=1.0, Jz=1.0, nup=4, dtype=jnp.float64)
    H = build_dense_H(m)
    evals, evecs = np.linalg.eigh(H)
    lo, hi = float(evals[0]), float(evals[-1])
    pad = 0.01 * (hi - lo) / 2 + 1e-6
    a, b = rescaling_params(lo - pad, hi + pad)
    return m, H, evals, evecs, a, b


def dense_chebyshev_moments(H, chi, phi, M, a, b):
    """Oracle: mu_n = <chi|T_n(H~)|phi> by dense recurrence."""
    Ht = (H - b * np.eye(H.shape[0])) / a
    v_prev = phi.copy()
    v_curr = Ht @ phi
    mus = [np.vdot(chi, v_prev), np.vdot(chi, v_curr)]
    for _ in range(M - 2):
        v_next = 2 * Ht @ v_curr - v_prev
        mus.append(np.vdot(chi, v_next))
        v_prev, v_curr = v_curr, v_next
    return np.array(mus)


def test_moments_match_dense(setup, rng):
    m, H, evals, evecs, a, b = setup
    phi = rng.normal(size=m.n_states) + 1j * rng.normal(size=m.n_states)
    phi /= np.linalg.norm(phi)
    M = 64
    mvr = partial(apply_rescaled_H, model=m, a=a, b=b)
    got = np.asarray(chebyshev_moments(mvr, jnp.asarray(phi), M))
    want = np.real(dense_chebyshev_moments(H, phi, phi, M, a, b))
    assert np.allclose(got, want, atol=1e-10)


def test_cross_moments_match_dense(setup, rng):
    m, H, evals, evecs, a, b = setup
    phi = rng.normal(size=m.n_states) + 0j
    chi = rng.normal(size=m.n_states) + 0j
    M = 48
    mvr = partial(apply_rescaled_H, model=m, a=a, b=b)
    got = np.asarray(chebyshev_cross_moments(mvr, jnp.asarray(chi), jnp.asarray(phi), M))
    norm_phi = np.linalg.norm(phi)
    want = np.real(dense_chebyshev_moments(H, chi, phi / norm_phi, M, a, b)) * norm_phi
    assert np.allclose(got, want, atol=1e-9)


def test_jackson_kernel_properties():
    # ref legacy oracle test/runtests.jl:347-366: g0 ~= 1, decreasing, positive
    for M in (16, 100):
        g = jackson_kernel(M)
        assert g[0] == pytest.approx(1.0, abs=1e-12)
        assert np.all(g > -1e-12)
        assert np.all(np.diff(g) < 1e-12)
    g = lorentz_kernel(50)
    assert g[0] == pytest.approx(1.0, abs=1e-12)


def test_kpm_reconstruct_vs_broadened_exact(setup):
    """KPM DOS of a normalized state == Jackson-broadened stick spectrum.

    The Jackson-damped delta is approximately Gaussian with sigma ~= pi*a/M;
    compare integrals over coarse bins."""
    m, H, evals, evecs, a, b = setup
    psi = np.asarray(domain_wall_state(m, dtype=jnp.float64))
    M = 256
    mvr = partial(apply_rescaled_H, model=m, a=a, b=b)
    mu = np.asarray(chebyshev_moments(mvr, jnp.asarray(psi + 0j), M))
    omega = np.linspace(b - a * 0.99, b + a * 0.99, 1200)
    S = np.asarray(
        kpm_reconstruct(jnp.asarray(mu), omega, a, b, kernel="jackson",
                        doubling=True, density_2_over_a=False)
    )
    # weights |<n|psi>|^2 at eigenvalues; total integral of S/a over x equals 1
    w = np.abs(evecs.T @ psi) ** 2
    total = np.trapezoid(S, omega) / a
    assert total == pytest.approx(w.sum(), rel=0.02)
    assert np.all(S >= 0)
    assert np.all(np.isfinite(S))


def test_kpm_sw_and_sqw(setup):
    m, H, evals, evecs, a, b = setup
    mv = matvec_fn(m)
    E0, psi0, _ = lanczos_groundstate(mv, m.n_states, lanc_m=60, dtype=jnp.float64)
    q_list = [2 * np.pi * k / m.L for k in range(m.L)]
    omega = np.linspace(0.0, 4.0, 80)
    S = np.asarray(
        kpm_sqw(psi0, m, q_list, omega, a=a, b=b, kpm_m=128)
    )
    assert S.shape == (m.L, 80)
    assert np.all(np.isfinite(S))
    assert np.all(S >= 0)
    # nonzero weight at some q (ref legacy oracle test/runtests.jl:207-245)
    assert S.max() > 1e-3


def test_kpm_dynamical_correlation_total_weight(setup):
    """Site autocorrelation integrates to <psi|Sz_i^2|psi> = 1/4."""
    m, H, evals, evecs, a, b = setup
    mv = matvec_fn(m)
    E0, psi0, _ = lanczos_groundstate(mv, m.n_states, lanc_m=60, dtype=jnp.float64)
    psi0 = jnp.asarray(np.asarray(psi0) + 0j)
    opA = make_spin_operator(3, "z")
    opB = make_spin_operator(3, "z")
    omega = np.linspace(b - a, b + a, 2000)
    S = np.asarray(
        kpm_dynamical_correlation(psi0, opA, opB, omega, m, n=256, a=a, b=b)
    )
    assert np.all(S >= 0)
    # convention: density includes 2/a (ref src/TimeEvolution/KPM.jl:205);
    # integral over omega of S/2 equals <Sz^2> = 1/4
    total = np.trapezoid(S, omega) / 2.0
    assert total == pytest.approx(0.25, rel=0.03)


def test_kpm_correlation_matrix_shapes(setup):
    m, H, evals, evecs, a, b = setup
    psi0 = domain_wall_state(m, dtype=jnp.complex128)
    omega = np.linspace(-1.0, 1.0, 16)
    C = np.asarray(
        kpm_correlation_matrix(psi0, omega, m, n=32, a=a, b=b)
    )
    assert C.shape == (m.L, m.L, 16)
    assert np.all(np.isfinite(C))
    assert np.all(C >= 0)
    S = np.asarray(kpm_structure_factor(jnp.asarray(C), 0.5, np.arange(m.L, dtype=float)))
    assert S.shape == (16,)


def test_correlation_matrix_matches_single_pair(setup):
    """Batched L x L correlation matrix row == individually computed pair."""
    m, H, evals, evecs, a, b = setup
    psi0 = domain_wall_state(m, dtype=jnp.complex128)
    omega = np.linspace(-0.5, 0.5, 8)
    C = np.asarray(kpm_correlation_matrix(psi0, omega, m, n=24, a=a, b=b))
    i, j = 1, 2
    S_pair = np.asarray(
        kpm_dynamical_correlation(
            psi0, make_spin_operator(i, "z"), make_spin_operator(j, "z"),
            omega, m, n=24, a=a, b=b,
        )
    )
    assert np.allclose(C[i, j], np.abs(S_pair), atol=1e-9)


def test_kpm_diagnostics(setup):
    from spindynamics_tpu import kpm_diagnostics

    m, H, evals, evecs, a, b = setup
    psi = domain_wall_state(m, dtype=jnp.complex128)
    mvr = partial(apply_rescaled_H, model=m, a=a, b=b)
    omega = np.linspace(evals[0], evals[-1], 50)
    d = kpm_diagnostics(mvr, psi, omega, a, b, M=24)
    assert d["x_in_range"]
    assert d["moments_bounded"]
    assert np.all(d["iterate_norms"] <= 1.0 + 1e-6)  # |T_n| <= 1 on [-1,1]
    # bad rescaling (interval too small) must be flagged
    d_bad = kpm_diagnostics(
        partial(apply_rescaled_H, model=m, a=a / 10, b=b), psi, omega, a / 10, b, M=24
    )
    assert not d_bad["moments_bounded"] or not d_bad["x_in_range"]


@pytest.mark.parametrize("M", [16, 17, 64])
def test_moment_doubling_trick(setup, rng, M):
    """M moments from ~M/2 matvecs via product identities — exact."""
    m, H, evals, evecs, a, b = setup
    phi = rng.normal(size=m.n_states) + 1j * rng.normal(size=m.n_states)
    phi = jnp.asarray(phi / np.linalg.norm(phi))
    mvr = partial(apply_rescaled_H, model=m, a=a, b=b)
    plain = np.asarray(chebyshev_moments(mvr, phi, M))
    doubled = np.asarray(chebyshev_moments(mvr, phi, M, doubling_trick=True))
    assert np.allclose(doubled, plain, atol=1e-10)


def test_kpm_vs_lanczos_sqw_cross_method(setup):
    """Cross-method oracle (SURVEY.md §4): KPM S(q, w) with the E0 shift and
    matched broadening must agree with Lanczos S(q, w) after normalization
    (KPM: phi normalized, integral = a; Lanczos: integral = ||phi||^2)."""
    from spindynamics_tpu import lanczos_sqw, sz_q_vector

    m, H, evals, evecs, a, b = setup
    mv = matvec_fn(m)
    E0, psi0, _ = lanczos_groundstate(mv, m.n_states, lanc_m=70, dtype=jnp.float64)
    q = [np.pi]
    omega = np.linspace(0.0, 4.0, 120)
    M = 256
    eta = np.pi * a / M  # match Jackson core width to the Lorentzian
    S_L = lanczos_sqw(psi0, m, q, omega, lanc_m=60, eta=eta)
    S_K = np.asarray(kpm_sqw(psi0, m, q, omega, a=a, b=b, kpm_m=M, E0=E0))
    phi = np.asarray(sz_q_vector(m, jnp.asarray(np.asarray(psi0) + 0j), np.pi,
                                 dtype=jnp.complex128))
    w2 = float(np.vdot(phi, phi).real)
    S_K_cmp = S_K[0] * w2 / a
    # peak positions within the broadening; integrals within 10%
    assert abs(omega[np.argmax(S_K_cmp)] - omega[np.argmax(S_L[0])]) < 3 * eta
    int_L = np.trapezoid(S_L[0], omega)
    int_K = np.trapezoid(S_K_cmp, omega)
    assert int_K == pytest.approx(int_L, rel=0.15)


class TestKpmCorrelationMatrixKron:
    """kpm_correlation_matrix_kron — T=0 site-pair correlations at the kron
    BlockVec layout (VERDICT r4 #6; flat oracle kpm_correlation_matrix; ref
    src/TimeEvolution/KPM.jl:214-235)."""

    @pytest.fixture(scope="class")
    def kron_setup(self):
        import jax

        from spindynamics_tpu import (lanczos_groundstate,
                                      kpm_correlation_matrix, matvec_fn,
                                      xxz_chain)
        from spindynamics_tpu.ops.sector_kron import (
            PAD_SENTINEL, flat_to_blocks, kron_order_states,
            make_sector_kron_layout)
        from spindynamics_tpu.solvers.blockvec import BlockVec

        L = 10
        m64 = xxz_chain(L, Jxy=1.0, Jz=0.6, nup=L // 2, dtype=jnp.float64)
        mk64 = xxz_chain(L, Jxy=1.0, Jz=0.6, nup=L // 2, dtype=jnp.float64,
                         layout="sector_kron")
        lay = make_sector_kron_layout(mk64, mk64.kron_splits, mk64.kron_pads)
        E0, psi0, _ = lanczos_groundstate(matvec_fn(m64), m64.n_states,
                                          lanc_m=70, dtype=jnp.float64)
        psi0 = np.asarray(psi0)
        states_asc = np.asarray(m64.basis_states())
        states_k = kron_order_states(L, L // 2, mk64.kron_splits,
                                     mk64.kron_pads)
        valid = states_k != PAD_SENTINEL
        flat_k = np.zeros(lay.n_states)
        flat_k[valid] = psi0[np.searchsorted(states_asc, states_k[valid])]
        bv = BlockVec(flat_to_blocks(jnp.asarray(flat_k), lay))
        return m64, mk64, lay, float(E0), psi0, bv

    def test_matches_flat_f64(self, kron_setup):
        from spindynamics_tpu import (kpm_correlation_matrix,
                                      kpm_correlation_matrix_kron)

        m64, mk64, lay, E0, psi0, bv = kron_setup
        omega = np.linspace(-8.0, 2.0, 40)
        a, b = 6.0, -2.5
        C_ref = kpm_correlation_matrix(jnp.asarray(psi0 + 0j), omega, m64,
                                       n=60, a=a, b=b)
        C, info = kpm_correlation_matrix_kron(mk64, omega, n=60, a=a, b=b,
                                              fused=False, psi0=bv, E0=E0,
                                              info={})
        assert C.shape == (m64.L, m64.L, 40)
        scale = float(np.max(np.asarray(C_ref)))
        np.testing.assert_allclose(np.asarray(C), np.asarray(C_ref), rtol=0,
                                   atol=1e-6 * scale)

    def test_mesh_matches_single_device(self, kron_setup):
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from spindynamics_tpu import kpm_correlation_matrix_kron
        from spindynamics_tpu.parallel.sharded_kron_scaling import (
            KronShardSpec, shard_kron_blockvec)
        from spindynamics_tpu.solvers.blockvec import BlockVec

        m64, mk64, lay, E0, psi0, bv = kron_setup
        omega = np.linspace(-8.0, 2.0, 20)
        a, b = 6.0, -2.5
        C1, _ = kpm_correlation_matrix_kron(mk64, omega, n=40, a=a, b=b,
                                            fused=False, psi0=bv, E0=E0,
                                            info={}, sites=[2, 5])
        mesh = Mesh(np.array(jax.devices()[:8]), ("rows",))
        spec = KronShardSpec(lay, 8)
        sh = NamedSharding(mesh, P("rows"))
        bv_sh = BlockVec([jax.device_put(l, sh) for l in
                          shard_kron_blockvec(bv, spec).leaves])
        C8, _ = kpm_correlation_matrix_kron(mk64, omega, n=40, a=a, b=b,
                                            fused=False, psi0=bv_sh, E0=E0,
                                            info={}, mesh=mesh,
                                            sites=[2, 5])
        assert C8.shape == (m64.L, 2, 20)
        scale = float(np.max(C1))
        np.testing.assert_allclose(C8, C1, rtol=0, atol=1e-8 * scale)
