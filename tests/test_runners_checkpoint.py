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


def test_trajectory_checkpoint_resume(tmp_path, model):
    """Interrupted + resumed trajectory is bit-identical to uninterrupted
    (checkpoint/resume — SURVEY.md §5: the reference has none)."""
    from spindynamics_tpu.solvers.runners import evolve_trajectory_planes

    psi0 = domain_wall_state(model, dtype=jnp.float32)
    bounds = (-8.0, 8.0)
    want_planes, want_obs = evolve_trajectory_planes(
        model, psi0, 0.1, 8, Ebounds=bounds, cheb_n=24)

    ck = str(tmp_path / "traj")
    # "crash" after 5 of 8 steps (checkpoint lands at step 3, then the
    # final save of the partial run at step 5)
    evolve_trajectory_planes(model, psi0, 0.1, 5, Ebounds=bounds, cheb_n=24,
                             checkpoint_dir=ck, checkpoint_every=3)
    # resume to 8 steps; Ebounds intentionally omitted — restored from meta
    got_planes, got_obs = evolve_trajectory_planes(
        model, psi0, 0.1, 8, cheb_n=24,
        checkpoint_dir=ck, checkpoint_every=3, resume=True)
    assert np.array_equal(np.asarray(got_planes), np.asarray(want_planes))
    assert got_obs.shape == want_obs.shape
    assert np.array_equal(got_obs, want_obs)

    # resuming a FINISHED run is a no-op returning the saved state
    again_planes, again_obs = evolve_trajectory_planes(
        model, psi0, 0.1, 8, cheb_n=24, checkpoint_dir=ck, resume=True)
    assert np.array_equal(np.asarray(again_planes), np.asarray(want_planes))
    assert np.array_equal(again_obs, want_obs)


def test_trajectory_resume_requires_dir(model):
    from spindynamics_tpu.solvers.runners import evolve_trajectory_planes

    psi0 = domain_wall_state(model, dtype=jnp.float32)
    with pytest.raises(ValueError, match="checkpoint_dir"):
        evolve_trajectory_planes(model, psi0, 0.1, 2, Ebounds=(-8.0, 8.0),
                                 resume=True)
