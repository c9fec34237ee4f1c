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


# ---- compensated arithmetic (utils/compensated, VERDICT r1 item 4) ---------


def test_dot2_beats_naive_f32():
    """Compensated dot must beat the naive f32 dot by >= 1 digit at N >= 1e6
    on an ill-conditioned input (cancellation-heavy)."""
    import jax

    from spindynamics_tpu.utils.compensated import dot2

    rng = np.random.default_rng(7)
    N = 1 << 20
    # ill-conditioned: large cancelling halves plus a small residual signal
    base = rng.standard_normal(N // 2)
    x64 = np.concatenate([base * 1e4, -base * 1e4 + rng.standard_normal(N // 2)])
    y64 = rng.standard_normal(N)
    exact = float(np.dot(x64.astype(np.float64), y64.astype(np.float64)))

    x32 = jnp.asarray(x64, jnp.float32)
    y32 = jnp.asarray(y64, jnp.float32)
    # reference truth for the EXACT f32 inputs (so input rounding cancels out)
    exact32 = float(np.dot(np.asarray(x32, np.float64), np.asarray(y32, np.float64)))

    naive = float(jax.jit(lambda a, b: jnp.dot(a, b))(x32, y32))
    comp = float(jax.jit(dot2)(x32, y32))
    err_naive = abs(naive - exact32)
    err_comp = abs(comp - exact32)
    assert err_comp <= err_naive / 10.0 or err_comp < 1e-6 * abs(exact32)
    del exact


def test_two_prod_exact():
    from spindynamics_tpu.utils.compensated import two_prod

    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.standard_normal(1000), jnp.float32)
    b = jnp.asarray(rng.standard_normal(1000), jnp.float32)
    p, e = two_prod(a, b)
    exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    recon = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    np.testing.assert_allclose(recon, exact, rtol=0, atol=1e-12)


def test_norm2_cancellation():
    from spindynamics_tpu.utils.compensated import norm2

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal(1 << 18) * 1e-3, jnp.float32)
    exact = float(np.linalg.norm(np.asarray(x, np.float64)))
    assert abs(float(norm2(x)) - exact) < 1e-6 * exact


def test_kpm_moment_drift_f32_vs_x64():
    """1024-moment KPM drift: compensated f32 moments must stay close to the
    x64 oracle (VERDICT r1 item 4)."""
    from spindynamics_tpu import estimate_energy_bounds
    from spindynamics_tpu.solvers.chebyshev import chebyshev_moments, rescaling_params

    L = 10
    m64 = xxz_chain(L, Jxy=1.0, Jz=0.5, nup=L // 2, dtype=jnp.float64)
    mv64 = matvec_fn(m64)
    lo, hi = estimate_energy_bounds(mv64, m64.n_states, dtype=jnp.float64)
    a, b = rescaling_params(lo, hi)

    rng = np.random.default_rng(5)
    phi64 = rng.standard_normal(m64.n_states)
    phi64 /= np.linalg.norm(phi64)

    def mk_rescaled(mv, aa, bb, dt):
        return lambda v: (mv(v) - jnp.asarray(bb, dt) * v) / jnp.asarray(aa, dt)

    M = 1024
    mus64 = np.asarray(
        chebyshev_moments(mk_rescaled(mv64, a, b, jnp.float64),
                          jnp.asarray(phi64, jnp.float64), M)
    )
    m32 = xxz_chain(L, Jxy=1.0, Jz=0.5, nup=L // 2, dtype=jnp.float32)
    mv32 = matvec_fn(m32)
    mus32 = np.asarray(
        chebyshev_moments(mk_rescaled(mv32, a, b, jnp.float32),
                          jnp.asarray(phi64, jnp.float32), M, compensated=True)
    )
    drift = np.max(np.abs(mus32 - mus64))
    assert drift < 5e-5, f"f32 KPM moment drift {drift:.2e}"


def test_selective_reorth_matches_full():
    """Selective (omega-triggered) reorthogonalization must reach the same
    ground state as full reorth (SURVEY.md §7 hard-part-3)."""
    from spindynamics_tpu import lanczos_groundstate

    L = 12
    m32 = xxz_chain(L, Jxy=1.0, Jz=0.5, nup=L // 2, dtype=jnp.float32)
    m64 = xxz_chain(L, Jxy=1.0, Jz=0.5, nup=L // 2, dtype=jnp.float64)
    H = build_dense_H(m64)
    e_exact = np.linalg.eigvalsh(H)[0]
    mv = matvec_fn(m32)
    E_sel, psi_sel, info_sel = lanczos_groundstate(
        mv, m32.n_states, lanc_m=120, dtype=jnp.float32, reorth="selective"
    )
    assert E_sel == pytest.approx(e_exact, abs=5e-4)
    assert info_sel["residual"] < 5e-2


def test_f32_restarted_residual():
    """Restarted two-pass with compensated dots: residual < 1e-4 in f32
    (VERDICT r1 item 4 asks < 1e-4 at L=28 on TPU; CPU proxy at L=16)."""
    from spindynamics_tpu import lanczos_groundstate_restarted

    L = 16
    m32 = xxz_chain(L, Jxy=1.0, Jz=1.0, nup=L // 2, dtype=jnp.float32)
    mv = matvec_fn(m32)
    E0, psi, info = lanczos_groundstate_restarted(
        mv, m32.n_states, lanc_m=40, cycles=8, dtype=jnp.float32,
        target_residual=1e-5,
    )
    assert info["residual"] < 1e-5, info
    m64 = xxz_chain(L, Jxy=1.0, Jz=1.0, nup=L // 2, dtype=jnp.float64)
    from spindynamics_tpu import lanczos_groundstate as lgs

    E64, _, _ = lgs(matvec_fn(m64), m64.n_states, lanc_m=120, dtype=jnp.float64)
    assert E0 == pytest.approx(E64, abs=2e-4)


def test_blockvec_selective_reorth_groundstate_kron():
    """reorth='selective' on BlockVec kron states (VERDICT r4 #8): one
    stored-basis cycle at lanc_m=100 reaches the f64 ground energy and
    matches the restarted two-pass result — the omega recurrence + stacked-
    leaf basis projections working on the layout where f32 orthogonality
    loss actually bites."""
    from spindynamics_tpu import groundstate_kron, lanczos_groundstate

    L = 16
    mk = xxz_chain(L, Jxy=1.0, Jz=1.0, nup=L // 2, dtype=jnp.float32,
                   layout="sector_kron")
    m64 = xxz_chain(L, Jxy=1.0, Jz=1.0, nup=L // 2, dtype=jnp.float64)
    E64, _, _ = lanczos_groundstate(matvec_fn(m64), m64.n_states,
                                    lanc_m=120, dtype=jnp.float64)
    E_sel, psi_sel, info_sel, lay = groundstate_kron(
        mk, lanc_m=100, fused=False, reorth="selective")
    assert E_sel == pytest.approx(E64, abs=5e-4)
    assert info_sel["residual"] < 5e-2
    # the basis came back as stacked BlockVec leaves and psi is a BlockVec
    assert psi_sel.leaves[0].ndim == 3
    # single-cycle selective == the restarted route (VERDICT done criterion)
    E_rst, _, info_rst, _ = groundstate_kron(
        mk, lanc_m=40, cycles=6, target_residual=1e-4, fused=False)
    assert E_sel == pytest.approx(E_rst, abs=5e-4)


def test_blockvec_full_reorth_matches_selective():
    """reorth='full' on BlockVec states: reference-parity every-step
    reorthogonalization, same ground energy as selective."""
    from spindynamics_tpu import groundstate_kron

    L = 12
    mk = xxz_chain(L, Jxy=1.0, Jz=0.5, nup=L // 2, dtype=jnp.float32,
                   layout="sector_kron")
    E_full, _, info_full, _ = groundstate_kron(mk, lanc_m=60, fused=False,
                                               reorth="full")
    E_sel, _, info_sel, _ = groundstate_kron(mk, lanc_m=60, fused=False,
                                             reorth="selective")
    assert E_full == pytest.approx(E_sel, abs=2e-4)
    assert info_full["residual"] < 5e-2
