"""High-level runners + checkpoint round trip."""

import jax.numpy as jnp
import numpy as np
import pytest

from spindynamics_tpu import xxz_chain
from spindynamics_tpu.solvers.runners import evolve_trajectory, run_chebyshev, run_krylov
from spindynamics_tpu.models.initial_states import domain_wall_state
from spindynamics_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


@pytest.fixture(scope="module")
def model():
    return xxz_chain(8, Jxy=1.0, Jz=0.5, nup=4, dtype=jnp.float64)


def test_run_chebyshev(model):
    mags, (q, Sq), bounds = run_chebyshev(model, dt=0.1, cheb_n=20, lanc_m=40)
    assert mags.shape == (8,)
    assert np.all(np.isfinite(np.asarray(mags)))
    assert bounds[0] < bounds[1]
    # total Sz conserved = 0 in the Sz=0 sector
    assert float(jnp.sum(mags)) == pytest.approx(0.0, abs=1e-5)


def test_run_krylov(model):
    mags, (q, Sq) = run_krylov(model, dt=0.1, kry_m=20)
    assert np.all(np.isfinite(np.asarray(mags)))
    assert float(jnp.sum(mags)) == pytest.approx(0.0, abs=1e-5)


def test_trajectory_methods_agree(model):
    psi0 = domain_wall_state(model, dtype=jnp.complex128)
    psi_c, obs_c = evolve_trajectory(model, psi0, 0.1, 5, method="chebyshev",
                                     cheb_n=30)
    psi_k, obs_k = evolve_trajectory(model, psi0, 0.1, 5, method="krylov",
                                     kry_m=30)
    assert np.allclose(obs_c, obs_k, atol=1e-5)


def test_checkpoint_roundtrip(tmp_path, model):
    psi = domain_wall_state(model, dtype=jnp.complex128)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, psi, meta={"step": 7},
                    extra_arrays={"alphas": np.arange(3.0)})
    psi2, meta, extra = load_checkpoint(path)
    assert meta["step"] == 7
    assert np.allclose(np.asarray(psi2), np.asarray(psi))
    assert np.allclose(extra["alphas"], np.arange(3.0))


def test_trajectory_planes_matches_complex(model):
    """f32-plane trajectory == complex trajectory (diagonal observables)."""
    from spindynamics_tpu.solvers.runners import evolve_trajectory_planes

    psi0 = domain_wall_state(model, dtype=jnp.complex128)
    bounds = (-8.0, 8.0)
    _, obs_c = evolve_trajectory(model, psi0, 0.1, 4, method="chebyshev",
                                 cheb_n=30, Ebounds=bounds)
    psi0_real = domain_wall_state(model, dtype=jnp.float32)
    planes, obs_p = evolve_trajectory_planes(model, psi0_real, 0.1, 4,
                                             Ebounds=bounds, cheb_n=30)
    assert planes.shape[0] == 2
    assert np.allclose(obs_p, obs_c, atol=5e-5)
