"""Lanczos S(q, omega) vs exact broadened pole sum (ref src/LanczosSqw.jl)."""

import jax.numpy as jnp
import numpy as np
import pytest

from spindynamics_tpu import (
    build_dense_H,
    lanczos_groundstate,
    lanczos_sqw,
    matvec_fn,
    spectral_from_tridiagonal,
    sz_q_vector,
    xxz_chain,
)


@pytest.fixture(scope="module")
def setup():
    m = xxz_chain(8, Jxy=1.0, Jz=1.0, nup=4, dtype=jnp.float64)
    H = build_dense_H(m)
    evals, evecs = np.linalg.eigh(H)
    mv = matvec_fn(m)
    E0, psi0, _ = lanczos_groundstate(mv, m.n_states, lanc_m=70, dtype=jnp.float64)
    return m, H, evals, evecs, float(E0), np.asarray(psi0)


def exact_sqw(m, evals, evecs, psi0, q, omega, eta):
    """S(q, w) = sum_n |<n|Sz_q|0>|^2 Lorentz(w - (E_n - E0))."""
    phi = np.asarray(sz_q_vector(m, jnp.asarray(psi0 + 0j), q, dtype=jnp.complex128))
    amps = np.abs(evecs.T.conj() @ phi) ** 2
    E0 = float(np.dot(psi0, np.asarray(build_dense_H(m)) @ psi0))
    out = np.zeros_like(omega)
    for En, w2 in zip(evals, amps):
        out += w2 * (1 / np.pi) * eta / ((omega - (En - E0)) ** 2 + eta**2)
    return out


def test_lanczos_sqw_matches_exact(setup):
    m, H, evals, evecs, E0, psi0 = setup
    eta = 0.08
    omega = np.linspace(0.0, 4.0, 120)
    q_list = [2 * np.pi * k / m.L for k in [1, 2, 4]]
    S = lanczos_sqw(jnp.asarray(psi0), m, q_list, omega, lanc_m=60, eta=eta)
    assert S.shape == (3, 120)
    for iq, q in enumerate(q_list):
        want = exact_sqw(m, evals, evecs, psi0, q, omega, eta)
        assert np.allclose(S[iq], want, atol=1e-5 + 0.02 * want.max())


def test_lanczos_sqw_gaussian_broadening(setup):
    m, H, evals, evecs, E0, psi0 = setup
    omega = np.linspace(0.0, 4.0, 60)
    S = lanczos_sqw(jnp.asarray(psi0), m, [np.pi], omega, lanc_m=50,
                    eta=0.1, broaden="gauss")
    assert np.all(np.isfinite(S))
    assert S.max() > 0


def test_zero_phi_row_is_zero(setup):
    """q = 0 at half filling: Sz_q |0> proportional to total Sz = 0 -> zero row
    (guard behavior fixed vs ref src/KPM_Sqw.jl:199-204, SURVEY.md §2.4-6)."""
    m, H, evals, evecs, E0, psi0 = setup
    omega = np.linspace(0.0, 2.0, 20)
    S = lanczos_sqw(jnp.asarray(psi0), m, [0.0], omega, lanc_m=30)
    assert np.allclose(S[0], 0.0, atol=1e-20)


def test_spectral_from_tridiagonal_single_pole():
    """alpha=[e], beta=[] -> one Lorentzian at omega = e - E0 with weight ||phi||^2."""
    omega = np.linspace(-2, 2, 200)
    eta = 0.05
    S = spectral_from_tridiagonal(np.array([1.0]), np.array([]), 2.0, 0.5, omega, eta=eta)
    want = 4.0 * (1 / np.pi) * eta / ((omega - 0.5) ** 2 + eta**2)
    assert np.allclose(S, want, atol=1e-12)


class TestLanczosSqwKron:
    """lanczos_sqw_kron — the Lanczos spectral path at the kron/BlockVec
    layout (VERDICT r4 #2; ref src/LanczosSqw.jl:49-76)."""

    @pytest.fixture(scope="class")
    def kron_setup(self):
        from spindynamics_tpu.ops.sector_kron import (
            PAD_SENTINEL, flat_to_blocks, kron_order_states,
            make_sector_kron_layout)
        from spindynamics_tpu.solvers.blockvec import BlockVec

        L = 12
        m64 = xxz_chain(L, Jxy=1.0, Jz=0.7, nup=L // 2, dtype=jnp.float64)
        mk64 = xxz_chain(L, Jxy=1.0, Jz=0.7, nup=L // 2, dtype=jnp.float64,
                         layout="sector_kron")
        lay = make_sector_kron_layout(mk64, mk64.kron_splits, mk64.kron_pads)
        mv = matvec_fn(m64)
        E0, psi0, _ = lanczos_groundstate(mv, m64.n_states, lanc_m=80,
                                          dtype=jnp.float64)
        psi0 = np.asarray(psi0)
        # flat ascending sector order -> kron order -> BlockVec leaves
        states_asc = np.asarray(m64.basis_states())
        states_k = kron_order_states(L, L // 2, mk64.kron_splits,
                                     mk64.kron_pads)
        valid = states_k != PAD_SENTINEL
        flat_k = np.zeros(lay.n_states)
        flat_k[valid] = psi0[np.searchsorted(states_asc, states_k[valid])]

        def bv64():
            return BlockVec(flat_to_blocks(jnp.asarray(flat_k), lay))

        return m64, mk64, lay, float(E0), psi0, bv64

    def test_matches_flat_f64(self, kron_setup):
        """f64, unfused: the kron pair recurrence reproduces the flat
        lanczos_sqw spectrum (same psi0, same E0) at 1e-6 (VERDICT r4 #2)."""
        from spindynamics_tpu import lanczos_sqw_kron

        m64, mk64, lay, E0, psi0, bv64 = kron_setup
        omega = np.linspace(0.0, 4.0, 80)
        q_list = [2 * np.pi * k / m64.L for k in [1, 3, 6]]
        eta = 0.08
        # lanc_m = 30: past the invariant-subspace dimension of phi the two
        # recurrences diverge by rounding chaos (measured 4e-4 at m = 40,
        # <= 1e-8 for m <= 30) — both remain valid Lanczos spectra, but the
        # equivalence statement needs the pre-breakdown regime
        S_ref = lanczos_sqw(jnp.asarray(psi0 + 0j), m64, q_list, omega,
                            lanc_m=30, eta=eta)
        S, info = lanczos_sqw_kron(mk64, q_list, omega, lanc_m=30, eta=eta,
                                   fused=False, psi0=bv64(), E0=E0, info={})
        assert info["E0"] == E0
        scale = float(np.max(np.asarray(S_ref)))
        np.testing.assert_allclose(np.asarray(S), np.asarray(S_ref), rtol=0,
                                   atol=1e-6 * scale)

    def test_zero_norm_q_row_is_zero(self, kron_setup):
        """q = 0 at Sz = 0: phi = 0 -> zero row, no division (SURVEY §2.4-6)."""
        from spindynamics_tpu import lanczos_sqw_kron

        m64, mk64, lay, E0, psi0, bv64 = kron_setup
        omega = np.linspace(0.0, 2.0, 10)
        S, _ = lanczos_sqw_kron(mk64, [0.0], omega, lanc_m=20, fused=False,
                                psi0=bv64(), E0=E0, info={})
        assert np.allclose(np.asarray(S), 0.0)

    def test_mesh_matches_single_device(self, kron_setup):
        """8-virtual-device mesh == single device (f64, unfused path)."""
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from spindynamics_tpu import lanczos_sqw_kron
        from spindynamics_tpu.parallel.sharded_kron_scaling import (
            KronShardSpec, shard_kron_blockvec)
        from spindynamics_tpu.solvers.blockvec import BlockVec

        m64, mk64, lay, E0, psi0, bv64 = kron_setup
        omega = np.linspace(0.0, 3.0, 40)
        q_list = [2 * np.pi * 2 / m64.L, np.pi]
        S1, _ = lanczos_sqw_kron(mk64, q_list, omega, lanc_m=30,
                                 fused=False, psi0=bv64(), E0=E0, info={})
        mesh = Mesh(np.array(jax.devices()[:8]), ("rows",))
        spec = KronShardSpec(lay, 8)
        sh = NamedSharding(mesh, P("rows"))
        bv_sh = BlockVec([jax.device_put(l, sh) for l in
                          shard_kron_blockvec(bv64(), spec).leaves])
        S8, _ = lanczos_sqw_kron(mk64, q_list, omega, lanc_m=30,
                                 fused=False, psi0=bv_sh, E0=E0, info={},
                                 mesh=mesh)
        scale = float(np.max(np.asarray(S1)))
        np.testing.assert_allclose(np.asarray(S8), np.asarray(S1), rtol=0,
                                   atol=1e-8 * scale)

    def test_split_plane_mode_matches_pair(self, kron_setup):
        """plane_mode='split' (the accelerator route: S_phi = S_re + S_im
        via two real-plane tridiagonalizations — exact for real H and real
        psi0) converges to the pair-recurrence spectrum: measured 1.9e-4 /
        2.9e-5 / 2.1e-7 rel at m = 40/80/120 (L=12)."""
        from spindynamics_tpu import lanczos_sqw_kron

        m64, mk64, lay, E0, psi0, bv64 = kron_setup
        omega = np.linspace(0.0, 4.0, 60)
        q_list = [2 * np.pi / m64.L, np.pi]
        Sp, ip = lanczos_sqw_kron(mk64, q_list, omega, lanc_m=120,
                                  fused=False, psi0=bv64(), E0=E0, info={},
                                  plane_mode="pair")
        Ss, isp = lanczos_sqw_kron(mk64, q_list, omega, lanc_m=120,
                                   fused=False, psi0=bv64(), E0=E0, info={},
                                   plane_mode="split")
        assert ip["plane_mode"] == "pair" and isp["plane_mode"] == "split"
        scale = float(np.max(np.asarray(Sp)))
        np.testing.assert_allclose(np.asarray(Ss), np.asarray(Sp), rtol=0,
                                   atol=1e-6 * scale)

    def test_split_mode_mesh(self, kron_setup):
        """split mode on the 8-device mesh == split single-device."""
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from spindynamics_tpu import lanczos_sqw_kron
        from spindynamics_tpu.parallel.sharded_kron_scaling import (
            KronShardSpec, shard_kron_blockvec)
        from spindynamics_tpu.solvers.blockvec import BlockVec

        m64, mk64, lay, E0, psi0, bv64 = kron_setup
        omega = np.linspace(0.0, 3.0, 30)
        q_list = [2 * np.pi * 2 / m64.L]
        S1, _ = lanczos_sqw_kron(mk64, q_list, omega, lanc_m=25,
                                 fused=False, psi0=bv64(), E0=E0, info={},
                                 plane_mode="split")
        mesh = Mesh(np.array(jax.devices()[:8]), ("rows",))
        spec = KronShardSpec(lay, 8)
        sh = NamedSharding(mesh, P("rows"))
        bv_sh = BlockVec([jax.device_put(l, sh) for l in
                          shard_kron_blockvec(bv64(), spec).leaves])
        S8, _ = lanczos_sqw_kron(mk64, q_list, omega, lanc_m=25,
                                 fused=False, psi0=bv_sh, E0=E0, info={},
                                 mesh=mesh, plane_mode="split")
        scale = float(np.max(np.asarray(S1)))
        np.testing.assert_allclose(np.asarray(S8), np.asarray(S1), rtol=0,
                                   atol=1e-8 * scale)
