"""Accelerator-safe library defaults (VERDICT r1 weak-4/5).

The local TPU relay cannot CREATE complex buffers eagerly (CLAUDE.md), so no
library entry point may do so by default on a non-CPU backend. These tests run
on CPU but pin the dispatch logic by monkeypatching jax.default_backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import spindynamics_tpu as sd


@pytest.fixture
def model():
    return sd.xxz_chain(8, Jxy=1.0, Jz=0.5, nup=4, dtype=jnp.float64)


def test_extremal_default_dtype_is_complex_on_cpu(model):
    from spindynamics_tpu.solvers.lanczos import _backend_safe_dtype

    assert _backend_safe_dtype(None) == jnp.complex64


def test_extremal_default_dtype_real_on_accelerator(monkeypatch):
    from spindynamics_tpu.solvers import lanczos as lz

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert lz._backend_safe_dtype(None) == jnp.float32
    # explicit dtype always wins
    assert lz._backend_safe_dtype(jnp.complex128) == jnp.complex128


def test_bounds_real_vs_complex_start_agree(model):
    mv = sd.matvec_fn(model)
    lo_c, hi_c = sd.estimate_energy_bounds(mv, model.n_states, lanc_m=40,
                                           dtype=jnp.complex128)
    lo_r, hi_r = sd.estimate_energy_bounds(mv, model.n_states, lanc_m=40,
                                           dtype=jnp.float64)
    # H is real symmetric: a real start spans the same Krylov information
    assert lo_r == pytest.approx(lo_c, abs=1e-6)
    assert hi_r == pytest.approx(hi_c, abs=1e-6)


def test_kpm_sqw_real_state_delegates_to_planes(model, monkeypatch):
    q = [2 * np.pi * k / model.L for k in range(model.L)]
    omega = np.linspace(0, 4, 40)
    E0, psi0, _ = sd.lanczos_groundstate(mv := sd.matvec_fn(model),
                                         model.n_states, lanc_m=40,
                                         dtype=jnp.float64)
    lo, hi = sd.estimate_energy_bounds(mv, model.n_states, lanc_m=40,
                                       dtype=jnp.float64)
    a, b = sd.rescaling_params(lo, hi)
    S_cpu = np.asarray(sd.kpm_sqw(psi0, model, q, omega, a=a, b=b, kpm_m=64,
                                  E0=E0))

    from spindynamics_tpu.solvers import kpm as kpm_mod

    called = {}
    import spindynamics_tpu.solvers.planes as planes_mod

    orig = planes_mod.kpm_sqw_planes

    def spy(*args, **kw):
        called["yes"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(planes_mod, "kpm_sqw_planes", spy)
    monkeypatch.setattr(kpm_mod.jax, "default_backend", lambda: "tpu")
    S_pl = np.asarray(kpm_mod.kpm_sqw(jnp.asarray(psi0, jnp.float32), model,
                                      q, omega, a=a, b=b, kpm_m=64, E0=E0))
    assert called.get("yes")
    assert np.allclose(S_pl, S_cpu, rtol=1e-3, atol=1e-4 * S_cpu.max())


def test_evolve_planes_rejects_nondiagonal_observe(model):
    psi0 = sd.neel_state(model, dtype=jnp.float32)

    def phase_sensitive(psi, m):  # no diagonal_in_z attribute
        return jnp.angle(jnp.sum(psi)) if jnp.iscomplexobj(psi) else psi[0]

    with pytest.raises(ValueError, match="diagonal"):
        sd.evolve_trajectory_planes(model, psi0, 0.1, 2, Ebounds=(-6.0, 6.0),
                                    cheb_n=16, observe=phase_sensitive)


def test_evolve_planes_observe_planes_kwarg(model):
    psi0 = sd.neel_state(model, dtype=jnp.float32)

    def overlap_with_start(planes, m):
        # phase-sensitive: Re<psi0|psi(t)> — needs both planes
        return jnp.vdot(psi0, planes[0])

    _, obs = sd.evolve_trajectory_planes(model, psi0, 0.1, 3,
                                         Ebounds=(-6.0, 6.0), cheb_n=16,
                                         observe_planes=overlap_with_start)
    assert obs.shape == (3,)
    assert np.all(np.abs(obs) <= 1.0 + 1e-5)


def test_kpm_correlation_matrix_chunked_matches(model):
    omega = np.linspace(-2, 6, 30)
    psi0 = sd.neel_state(model, dtype=jnp.complex128)
    C_full = np.asarray(sd.kpm_correlation_matrix(psi0, omega, model, n=40,
                                                  a=8.0, b=0.0, chunk_B=8))
    C_chunk = np.asarray(sd.kpm_correlation_matrix(psi0, omega, model, n=40,
                                                   a=8.0, b=0.0, chunk_B=3))
    assert np.allclose(C_full, C_chunk, atol=1e-10)
    # non-diagonal A kind still works (stacked-operator fallback)
    C_pm = np.asarray(sd.kpm_correlation_matrix(psi0, omega, model, n=20,
                                                a=8.0, b=0.0, opA_kind="plus",
                                                opB_kind="minus", chunk_B=5))
    assert np.isfinite(C_pm).all()
