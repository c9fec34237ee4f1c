"""BlockVec kron observables + real-time evolution vs the flat-path oracles
(VERDICT r3 missing-2/3). Reference: src/Observables.jl, examples/example.jl:86-117,
src/TimeEvolution/{Chebyshev,Krylov}.jl."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import spindynamics_tpu as sd
from spindynamics_tpu.observables_kron import bv_apply_sz, szsz_matrix_kron
from spindynamics_tpu.ops.sector_kron import (
    blocks_to_flat,
    flat_to_blocks,
    make_sector_kron_layout,
)
from spindynamics_tpu.solvers.blockvec import BlockVec, bv_basis_state, bv_random
from spindynamics_tpu.solvers.kron_evolve import (
    chebyshev_time_evolve_kron,
    evolve_trajectory_kron,
    kron_energy_bounds,
    kron_planes_matvec_fn,
    krylov_imaginary_time_evolve_kron,
    krylov_time_evolve_kron,
    pair_norm2,
)


@pytest.fixture(scope="module")
def setup():
    L = 12
    m = sd.xxz_chain(L, Jxy=1.0, Jz=0.7, h=np.linspace(-0.1, 0.2, L),
                     nup=L // 2, dtype=jnp.float32, layout="sector_kron")
    lay = make_sector_kron_layout(m, m.kron_splits, m.kron_pads)
    return m, lay


def _random_bv(lay, seed=0):
    bv = bv_random(lay, jax.random.PRNGKey(seed), jnp.float32)
    n = float(jnp.sqrt(sum(jnp.vdot(x, x) for x in bv.leaves)))
    return bv * (1.0 / n)


class TestKronObservables:
    def test_magnetization_matches_flat(self, setup):
        m, lay = setup
        bv = _random_bv(lay)
        flat = blocks_to_flat(bv.leaves, lay)
        ref = sd.magnetization_per_site(flat, m)
        got = sd.magnetization_per_site_kron(bv, lay)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6)

    def test_magnetization_pair_input(self, setup):
        m, lay = setup
        r, i = _random_bv(lay, 1), _random_bv(lay, 2)
        flat = blocks_to_flat(r.leaves, lay) + 1j * blocks_to_flat(i.leaves,
                                                                   lay)
        ref = sd.magnetization_per_site(flat, m)
        got = sd.magnetization_per_site_kron((r, i), lay)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6)

    def test_szsz_and_connected_match_flat(self, setup):
        m, lay = setup
        bv = _random_bv(lay, 3)
        flat = blocks_to_flat(bv.leaves, lay)
        szsz_ref, si_ref = sd.observables.szsz_matrix(flat, m)
        szsz, si = szsz_matrix_kron(bv, lay)
        np.testing.assert_allclose(np.asarray(szsz), np.asarray(szsz_ref),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(si), np.asarray(si_ref),
                                   atol=1e-6)
        c_ref = sd.connected_correlations(flat, m)
        c = sd.connected_correlations_kron(bv, lay)
        np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref),
                                   atol=1e-6)
        q_ref, S_ref = sd.structure_factor_Sq(flat, m)
        q, S = sd.structure_factor_Sq_kron(bv, lay)
        np.testing.assert_allclose(np.asarray(S), np.asarray(S_ref),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(q), np.asarray(q_ref))

    def test_bv_basis_state_matches_flat_onehot(self, setup):
        m, lay = setup
        from spindynamics_tpu.models.initial_states import (
            domain_wall_bitstring, neel_bitstring)

        for bits in (domain_wall_bitstring(m), neel_bitstring(m)):
            bv = bv_basis_state(lay, bits, jnp.float32)
            flat = blocks_to_flat(bv.leaves, lay)
            ref = sd.basis_state_vector(m, bits, dtype=jnp.float32)
            np.testing.assert_array_equal(np.asarray(flat), np.asarray(ref))

    def test_bv_apply_sz_matches_flat(self, setup):
        m, lay = setup
        bv = _random_bv(lay, 4)
        flat = blocks_to_flat(bv.leaves, lay)
        for site in (0, m.L // 2, m.L - 1):
            ref = sd.apply_spin_operator(flat, m, site, "z")
            got = blocks_to_flat(bv_apply_sz(bv, lay, site).leaves, lay)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-7)


class TestKronEvolution:
    def test_chebyshev_matches_planes(self, setup):
        from spindynamics_tpu.solvers.planes import (
            chebyshev_time_evolve_planes, planes_matvec_fn)

        m, lay = setup
        bv = _random_bv(lay, 5)
        flat = blocks_to_flat(bv.leaves, lay)
        planes = jnp.stack([flat, jnp.zeros_like(flat)])
        pmv_flat = planes_matvec_fn(m)
        pmv = kron_planes_matvec_fn(lay, fused=False)
        Eb = kron_energy_bounds(lay, pmv)
        pair = (bv, BlockVec([jnp.zeros_like(l) for l in bv.leaves]))
        for _ in range(3):
            pair = chebyshev_time_evolve_kron(pair, pmv, 0.1, Eb, cheb_n=24)
            planes = chebyshev_time_evolve_planes(planes, pmv_flat, 0.1, Eb,
                                                  cheb_n=24)
        got_r = blocks_to_flat(pair[0].leaves, lay)
        got_i = blocks_to_flat(pair[1].leaves, lay)
        np.testing.assert_allclose(np.asarray(got_r), np.asarray(planes[0]),
                                   atol=2e-6)
        np.testing.assert_allclose(np.asarray(got_i), np.asarray(planes[1]),
                                   atol=2e-6)
        # fused (interpret) path agrees too
        pmv_f = kron_planes_matvec_fn(lay, fused=True)
        pair2 = (bv, BlockVec([jnp.zeros_like(l) for l in bv.leaves]))
        for _ in range(3):
            pair2 = chebyshev_time_evolve_kron(pair2, pmv_f, 0.1, Eb,
                                               cheb_n=24)
        np.testing.assert_allclose(
            np.asarray(blocks_to_flat(pair2[0].leaves, lay)),
            np.asarray(planes[0]), atol=1e-5)

    def test_krylov_matches_planes(self, setup):
        from spindynamics_tpu.solvers.planes import (
            krylov_time_evolve_planes, planes_matvec_fn)

        m, lay = setup
        bv = _random_bv(lay, 6)
        flat = blocks_to_flat(bv.leaves, lay)
        planes = jnp.stack([flat, jnp.zeros_like(flat)])
        pmv = kron_planes_matvec_fn(lay, fused=False)
        pair = (bv, BlockVec([jnp.zeros_like(l) for l in bv.leaves]))
        out = krylov_time_evolve_kron(pair, pmv, 0.15, kry_m=20)
        ref = krylov_time_evolve_planes(planes, planes_matvec_fn(m), 0.15,
                                        kry_m=20)
        np.testing.assert_allclose(
            np.asarray(blocks_to_flat(out[0].leaves, lay)),
            np.asarray(ref[0]), atol=5e-6)
        np.testing.assert_allclose(
            np.asarray(blocks_to_flat(out[1].leaves, lay)),
            np.asarray(ref[1]), atol=5e-6)

    def test_imaginary_time_matches_planes(self, setup):
        from spindynamics_tpu.solvers.planes import (
            krylov_imaginary_time_evolve_planes, planes_matvec_fn)

        m, lay = setup
        bv = _random_bv(lay, 7)
        flat = blocks_to_flat(bv.leaves, lay)
        planes = jnp.stack([flat, jnp.zeros_like(flat)])
        pmv = kron_planes_matvec_fn(lay, fused=False)
        pair = (bv, BlockVec([jnp.zeros_like(l) for l in bv.leaves]))
        out = krylov_imaginary_time_evolve_kron(pair, pmv, 0.8, kry_m=25,
                                                renormalize=True)
        ref = krylov_imaginary_time_evolve_planes(
            planes, planes_matvec_fn(m), 0.8, kry_m=25, renormalize=True)
        np.testing.assert_allclose(
            np.asarray(blocks_to_flat(out[0].leaves, lay)),
            np.asarray(ref[0]), atol=2e-5)

    def test_trajectory_magnetization_and_conservation(self, setup):
        """The flagship demo shape: domain-wall start, magnetization per
        step; total Sz exactly conserved, norm drift small (ref
        examples/example.jl:86-117)."""
        from spindynamics_tpu.models.initial_states import (
            domain_wall_bitstring)
        from spindynamics_tpu.solvers.runners import evolve_trajectory_planes

        m, lay = setup
        bits = domain_wall_bitstring(m)
        pair, obs, info = evolve_trajectory_kron(m, bits, 0.1, 5, cheb_n=30,
                                                 fused=False)
        assert obs.shape == (5, m.L)
        # total Sz conserved (U(1) sector)
        np.testing.assert_allclose(obs.sum(axis=1), 0.0, atol=1e-5)
        assert info["norm_drift"] < 1e-4
        # against the flat plane driver
        psi0 = sd.domain_wall_state(m, dtype=jnp.float32)
        _, obs_ref = evolve_trajectory_planes(
            m, psi0, 0.1, 5, Ebounds=info["Ebounds"], cheb_n=30)
        np.testing.assert_allclose(obs, obs_ref, atol=2e-5)


class TestKronTypicality:
    def test_matches_planes_typicality(self, setup):
        """Same random pair -> identical finite-T correlator as the flat
        planes implementation (ref capability:
        src/TimeEvolution/QuantumTypicality.jl — dead code there)."""
        from spindynamics_tpu.solvers.kron_evolve import (
            typicality_correlation_kron)
        from spindynamics_tpu.solvers.planes import (
            typicality_correlation_function_planes)

        m, lay = setup
        key = jax.random.PRNGKey(11)
        ts = np.linspace(0.0, 1.0, 4)
        beta = 0.7
        ref = typicality_correlation_function_planes(
            m, beta, 2, 5, ts, kind="z", key=key, kry_m=25, cheb_n=40)
        # reproduce the planes driver's exact random start on BlockVec
        kr, ki = jax.random.split(key)
        N = m.n_states
        r = jnp.stack([jax.random.normal(kr, (N,), jnp.float32),
                       jax.random.normal(ki, (N,), jnp.float32)])
        mask = m.valid_mask()
        r = jnp.where(mask[None, :], r, 0)
        r0 = (BlockVec(flat_to_blocks(r[0], lay)),
              BlockVec(flat_to_blocks(r[1], lay)))
        # same bounds as the planes driver computes internally
        from spindynamics_tpu.solvers.lanczos import estimate_energy_bounds
        from spindynamics_tpu.ops.apply import matvec_fn

        Eb = estimate_energy_bounds(matvec_fn(m), N, dtype=jnp.float32,
                                    mask=mask, lanc_m=60)
        got = typicality_correlation_kron(
            m, beta, 2, 5, ts, kry_m=25, cheb_n=40, Ebounds=Eb, r0=r0,
            fused=False)
        np.testing.assert_allclose(got.real, ref.real, atol=2e-5)
        np.testing.assert_allclose(got.imag, ref.imag, atol=2e-5)


class TestShardedKronObservables:
    def test_sharded_szsz_matches_unsharded(self):
        """Observables straight off the block-distributed sharded state —
        O(L^2) communication, no gather (VERDICT r3 missing-3)."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from spindynamics_tpu.observables_kron import (
            szsz_matrix_kron_sharded)
        from spindynamics_tpu.parallel.sharded_kron_scaling import (
            KronShardSpec, shard_kron_state)

        L = 14
        m = sd.xxz_chain(L, Jxy=1.0, Jz=0.7, nup=L // 2, dtype=jnp.float32,
                         layout="sector_kron", kron_splits=(6, 4, 4))
        lay = make_sector_kron_layout(m, m.kron_splits, m.kron_pads)
        mesh = Mesh(np.array(jax.devices()), ("rows",))
        spec = KronShardSpec(lay, 8)
        bv = _random_bv(lay, 9)
        flat = blocks_to_flat(bv.leaves, lay)
        szsz_ref, si_ref = szsz_matrix_kron(bv, lay)
        xs = jax.device_put(shard_kron_state(flat, spec),
                            NamedSharding(mesh, P("rows")))
        szsz, si = szsz_matrix_kron_sharded(xs, spec, mesh)
        np.testing.assert_allclose(np.asarray(szsz), np.asarray(szsz_ref),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(si), np.asarray(si_ref),
                                   atol=1e-6)


def test_chebyshev_imaginary_time_matches_krylov(setup):
    """The O(3)-vector Chebyshev thermal-state builder agrees with the
    Krylov variant (both converge to e^{-tau H}|r> / norm)."""
    from spindynamics_tpu.solvers.kron_evolve import (
        chebyshev_imaginary_time_kron, kron_energy_bounds,
        krylov_imaginary_time_evolve_kron)

    m, lay = setup
    pmv = kron_planes_matvec_fn(lay, fused=False)
    r = (_random_bv(lay, 21), _random_bv(lay, 22))
    Eb = kron_energy_bounds(lay, pmv)
    a = chebyshev_imaginary_time_kron(r, pmv, 0.6, Eb)
    b = krylov_imaginary_time_evolve_kron(r, pmv, 0.6, kry_m=30,
                                          renormalize=True)
    for pa, pb in zip(a, b):
        np.testing.assert_allclose(
            np.asarray(blocks_to_flat(pa.leaves, lay)),
            np.asarray(blocks_to_flat(pb.leaves, lay)), atol=3e-6)


def test_sharded_trajectory_matches_unsharded(setup):
    """The whole trajectory on the 8-device mesh: sharded fused matvec +
    sharded marginal observables, state P(rows)-sharded end to end — obs
    match the single-device trajectory (ROADMAP r5 item 3, landed r4)."""
    from jax.sharding import Mesh

    from spindynamics_tpu.models.initial_states import domain_wall_bitstring

    m, lay = setup
    bits = domain_wall_bitstring(m)
    _, obs_ref, info_ref = sd.evolve_trajectory_kron(m, bits, 0.1, 3,
                                                     cheb_n=20, fused=False)
    mesh = Mesh(np.array(jax.devices()), ("rows",))
    pair, obs, info = sd.evolve_trajectory_kron(
        m, bits, 0.1, 3, cheb_n=20, fused=False, mesh=mesh,
        Ebounds=info_ref["Ebounds"])
    np.testing.assert_allclose(obs, obs_ref, atol=2e-5)
    assert abs(info["norms"][-1] - 1.0) < 1e-4
    # the state stayed sharded
    from jax.sharding import NamedSharding, PartitionSpec as P

    rows = NamedSharding(mesh, P("rows"))
    assert pair[0].leaves[0].sharding.is_equivalent_to(
        rows, pair[0].leaves[0].ndim)


def test_bv_sz_q_matches_flat(setup):
    """BlockVec-native S^z_q (per-axis additive weights) vs the flat
    sz_q_vector oracle, real and complex inputs."""
    from spindynamics_tpu.observables_kron import bv_sz_q
    from spindynamics_tpu.ops.spin_ops import sz_q_vector

    m, lay = setup
    bv = _random_bv(lay, 31)
    for q in (0.7, np.pi):
        pr, pi = bv_sz_q(bv, lay, q)
        flat = blocks_to_flat(bv.leaves, lay).astype(jnp.complex64)
        ref = sz_q_vector(m, flat, q)
        got = (np.asarray(blocks_to_flat(pr.leaves, lay))
               + 1j * np.asarray(blocks_to_flat(pi.leaves, lay)))
        np.testing.assert_allclose(got, np.asarray(ref), atol=2e-6)
    # complex (pair) input
    r2, i2 = _random_bv(lay, 32), _random_bv(lay, 33)
    pr, pi = bv_sz_q((r2, i2), lay, 0.9)
    flat = (blocks_to_flat(r2.leaves, lay)
            + 1j * blocks_to_flat(i2.leaves, lay)).astype(jnp.complex64)
    ref = sz_q_vector(m, flat, 0.9)
    got = (np.asarray(blocks_to_flat(pr.leaves, lay))
           + 1j * np.asarray(blocks_to_flat(pi.leaves, lay)))
    np.testing.assert_allclose(got, np.asarray(ref), atol=2e-6)


class TestBf16Evolution:
    """bf16 BlockVec evolution (VERDICT r4 #3): states stream bf16 through
    the recurrences, combines + coefficient accumulation in f32."""

    def test_bf16_trajectory_matches_f32(self, setup):
        from spindynamics_tpu.models.initial_states import (
            domain_wall_bitstring)

        m, lay = setup
        bits = domain_wall_bitstring(m)
        _, obs32, info32 = evolve_trajectory_kron(m, bits, 0.1, 4, cheb_n=20)
        pair, obsbf, infobf = evolve_trajectory_kron(
            m, bits, 0.1, 4, cheb_n=20, state_dtype=jnp.bfloat16,
            Ebounds=info32["Ebounds"])
        assert pair[0].leaves[0].dtype == jnp.bfloat16
        # bf16 accuracy class: one state rounding per stored term (~4e-3
        # rel per apply) -> per-site magnetization within ~1e-2 absolute
        np.testing.assert_allclose(obsbf, obs32, atol=2e-2)
        # norm drift bound: documented at the same class
        assert infobf["norm_drift"] < 5e-2
        # total Sz still exactly conserved (U(1) structure is dtype-exact)
        np.testing.assert_allclose(obsbf.sum(axis=1), 0.0, atol=1e-2)

    def test_f32_path_unchanged_by_dtype_generic_scan(self, setup):
        """The dtype-generic _cheb_kron_scan is an identity change for f32:
        same trajectory as the planes driver (regression guard)."""
        from spindynamics_tpu.models.initial_states import (
            domain_wall_bitstring)
        from spindynamics_tpu.solvers.runners import evolve_trajectory_planes

        m, lay = setup
        bits = domain_wall_bitstring(m)
        _, obs, info = evolve_trajectory_kron(m, bits, 0.12, 3, cheb_n=24,
                                              fused=False,
                                              state_dtype=jnp.float32)
        psi0 = sd.domain_wall_state(m, dtype=jnp.float32)
        _, obs_ref = evolve_trajectory_planes(
            m, psi0, 0.12, 3, Ebounds=info["Ebounds"], cheb_n=24)
        np.testing.assert_allclose(obs, obs_ref, atol=2e-5)

    def test_bf16_sharded_trajectory(self):
        """bf16 state end to end on the 8-device mesh (bf16 model — the
        shard_map kernel dtype follows the model)."""
        from jax.sharding import Mesh

        from spindynamics_tpu.models.initial_states import (
            domain_wall_bitstring)

        L = 12
        mbf = sd.xxz_chain(L, Jxy=1.0, Jz=0.7, nup=L // 2,
                           dtype=jnp.bfloat16, layout="sector_kron")
        m32 = sd.xxz_chain(L, Jxy=1.0, Jz=0.7, nup=L // 2,
                           dtype=jnp.float32, layout="sector_kron")
        bits = domain_wall_bitstring(m32)
        _, obs32, info32 = evolve_trajectory_kron(m32, bits, 0.1, 2,
                                                  cheb_n=16)
        mesh = Mesh(np.array(jax.devices()), ("rows",))
        pair, obsbf, infobf = evolve_trajectory_kron(
            mbf, bits, 0.1, 2, cheb_n=16, state_dtype=jnp.bfloat16,
            mesh=mesh, Ebounds=info32["Ebounds"])
        assert pair[0].leaves[0].dtype == jnp.bfloat16
        np.testing.assert_allclose(obsbf, obs32, atol=2e-2)
        assert infobf["norm_drift"] < 5e-2

    def test_bf16_mesh_requires_bf16_model(self, setup):
        from jax.sharding import Mesh

        m, lay = setup
        mesh = Mesh(np.array(jax.devices()), ("rows",))
        with pytest.raises(ValueError, match="bfloat16"):
            evolve_trajectory_kron(m, 0, 0.1, 1, state_dtype=jnp.bfloat16,
                                   mesh=mesh)


def test_sharded_typicality_matches_unsharded(setup):
    """typicality_correlation_kron(mesh=...) — the fourth end-to-end sharded
    driver (VERDICT r4 #4): same r0 -> 8-device result == single-device kron
    result at the existing cross-check tolerance."""
    from jax.sharding import Mesh

    from spindynamics_tpu.solvers.kron_evolve import (
        typicality_correlation_kron)

    m, lay = setup
    key = jax.random.PRNGKey(5)
    kr, ki = jax.random.split(key)
    r0 = (bv_random(lay, kr, jnp.float32), bv_random(lay, ki, jnp.float32))
    ts = np.linspace(0.0, 0.8, 3)
    from spindynamics_tpu.solvers.kron_evolve import kron_energy_bounds

    pmv = kron_planes_matvec_fn(lay, fused=False)
    Eb = kron_energy_bounds(lay, pmv, key=key)
    ref = typicality_correlation_kron(m, 0.6, 2, 5, ts, cheb_n=30,
                                      Ebounds=Eb, r0=r0, fused=False)
    mesh = Mesh(np.array(jax.devices()), ("rows",))
    got = typicality_correlation_kron(m, 0.6, 2, 5, ts, cheb_n=30,
                                      Ebounds=Eb, r0=r0, fused=False,
                                      mesh=mesh)
    np.testing.assert_allclose(got.real, ref.real, atol=2e-5)
    np.testing.assert_allclose(got.imag, ref.imag, atol=2e-5)
