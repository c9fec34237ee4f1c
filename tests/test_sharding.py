"""Multi-device equivalence tests on the 8-device virtual CPU mesh
(what the reference lacks entirely — SURVEY.md §4 'add what the reference lacks')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spindynamics_tpu import (
    apply_H,
    chebyshev_time_evolve,
    domain_wall_state,
    lanczos_groundstate,
    magnetization_per_site,
    matvec_fn,
    xxz_chain,
)
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spindynamics_tpu.parallel.mesh import make_mesh, shard_model, shard_state
from spindynamics_tpu.parallel.sharded_apply import (
    pad_state,
    sharded_matvec_fn,
    unpad_state,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual CPU devices"
    return make_mesh(8)


@pytest.fixture(scope="module")
def problem(mesh):
    m = xxz_chain(10, Jxy=1.0, Jz=0.5, nup=5, dtype=jnp.float64)  # N = 252
    rng = np.random.default_rng(0)
    psi = rng.normal(size=m.n_states) + 1j * rng.normal(size=m.n_states)
    psi /= np.linalg.norm(psi)
    return m, jnp.asarray(psi)


def test_auto_spmd_matvec_matches(problem, mesh):
    """Same apply_H code, sharded inputs: XLA SPMD result == single-device."""
    m, psi = problem
    want = np.asarray(apply_H(psi, m))
    m_sh = shard_model(m, mesh)
    psi_sh = shard_state(psi, mesh)
    f = jax.jit(lambda p: apply_H(p, m_sh))
    got = np.asarray(f(psi_sh))
    assert got.shape[0] == m_sh.n_states  # padded to a multiple of 8
    assert np.allclose(got[: m.n_states], want, atol=1e-12)
    assert np.allclose(got[m.n_states :], 0.0)  # pad rows stay exactly zero


def test_shard_map_matvec_matches(problem, mesh):
    m, psi = problem
    want = np.asarray(apply_H(psi, m))
    matvec, pm = sharded_matvec_fn(m, mesh)
    psi_p = shard_state(pad_state(psi, 8), mesh)
    got = np.asarray(unpad_state(matvec(psi_p), m.n_states))
    assert np.allclose(got, want, atol=1e-12)
    # padded tail stays exactly zero
    full = np.asarray(matvec(psi_p))
    assert np.allclose(full[m.n_states :], 0.0)


def test_halo_matvec_matches(problem, mesh):
    """Static halo exchange (D-1 ppermute rounds) == single-device apply."""
    from spindynamics_tpu.parallel.sharded_apply import sharded_matvec_halo_fn

    m, psi = problem
    want = np.asarray(apply_H(psi, m))
    matvec, pm = sharded_matvec_halo_fn(m, mesh)
    psi_p = shard_state(pad_state(psi, 8), mesh)
    got = np.asarray(unpad_state(matvec(psi_p), m.n_states))
    assert np.allclose(got, want, atol=1e-12)
    assert np.allclose(np.asarray(matvec(psi_p))[m.n_states:], 0.0)


def test_halo_matvec_no_full_allgather(problem, mesh):
    """Memory-scaling contract (VERDICT r2 item 7): the compiled halo apply
    communicates via collective-permute only — no all-gather of the state,
    mirroring the sector_kron assertion at tests/test_sharding.py
    TestShardedKronScaling.test_no_full_allgather."""
    from spindynamics_tpu.parallel.sharded_apply import sharded_matvec_halo_fn

    m, psi = problem
    matvec, pm = sharded_matvec_halo_fn(m, mesh)
    psi_p = shard_state(pad_state(psi, 8), mesh)
    txt = jax.jit(matvec).lower(psi_p).compile().as_text()
    assert "all-gather" not in txt, "halo ELL apply all-gathers the state"
    assert "collective-permute" in txt


def test_halo_matvec_long_range(mesh):
    """Non-NN bonds stress the halo plan (remote sets differ per pair)."""
    from spindynamics_tpu.parallel.sharded_apply import sharded_matvec_halo_fn
    from spindynamics_tpu import build_model

    L = 10
    hopping = ([(i, (i + 3) % L, 0.7) for i in range(L)]
               + [(i, i + 1, 1.0) for i in range(L - 1)])
    m = build_model(L, nup=4, hopping=hopping, dtype=jnp.float64,
                    build_neighbor_table=True)
    rng = np.random.default_rng(3)
    psi = jnp.asarray(rng.normal(size=m.n_states))
    want = np.asarray(apply_H(psi, m))
    matvec, pm = sharded_matvec_halo_fn(m, mesh)
    psi_p = shard_state(pad_state(psi, 8), mesh)
    got = np.asarray(unpad_state(matvec(psi_p), m.n_states))
    assert np.allclose(got, want, atol=1e-12)


def test_sharded_lanczos_groundstate(problem, mesh):
    """Full solver stack on sharded arrays: energies agree to 1e-9."""
    m, _ = problem
    mv = matvec_fn(m)
    E0_single, _, _ = lanczos_groundstate(mv, m.n_states, lanc_m=50, dtype=jnp.float64)

    m_sh = shard_model(m, mesh)
    mv_sh = matvec_fn(m_sh)
    E0_sh, psi_sh, info = lanczos_groundstate(
        mv_sh, m_sh.n_states, lanc_m=50, dtype=jnp.float64,
        mask=m_sh.valid_mask(),
    )
    assert E0_sh == pytest.approx(E0_single, abs=1e-9)
    assert info["residual"] < 1e-6


def test_sharded_chebyshev_evolution(problem, mesh):
    m, psi = problem
    mv = matvec_fn(m)
    bounds = (-8.0, 8.0)
    want = np.asarray(chebyshev_time_evolve(psi, mv, 0.1, bounds, cheb_n=24))

    m_sh = shard_model(m, mesh)
    psi_sh = shard_state(psi, mesh)
    got = np.asarray(
        chebyshev_time_evolve(psi_sh, matvec_fn(m_sh), 0.1, bounds, cheb_n=24)
    )
    assert np.allclose(got[: m.n_states], want, atol=1e-11)


def test_sharded_observables(problem, mesh):
    m, psi = problem
    want = np.asarray(magnetization_per_site(psi, m))
    m_sh = shard_model(m, mesh)
    psi_sh = shard_state(psi, mesh)
    got = np.asarray(magnetization_per_site(psi_sh, m_sh))
    assert np.allclose(got, want, atol=1e-12)


def test_sharded_full_mode_tensor(mesh):
    """Full-mode flip backend under sharding: psi as (2,)*L tensor sharded on
    the leading (high-bit) axis."""
    m = xxz_chain(8, Jxy=1.0, Jz=0.3, nup=None, dtype=jnp.float64,
                  build_neighbor_table=False)
    rng = np.random.default_rng(1)
    psi = jnp.asarray(rng.normal(size=m.n_states))
    want = np.asarray(apply_H(psi, m, backend="tensor"))
    psi_sh = shard_state(psi, mesh)
    f = jax.jit(lambda p: apply_H(p, m, backend="tensor"))
    got = np.asarray(f(psi_sh))
    assert np.allclose(got, want, atol=1e-12)


def test_sharded_blocked_backend(mesh):
    """Blocked (matmul+flip) backend under row sharding: XLA SPMD turns the
    major-axis flips into collective permutes; result must match single-device."""
    m = xxz_chain(10, Jxy=1.0, Jz=0.3, nup=None, dtype=jnp.float64,
                  build_neighbor_table=False)
    rng = np.random.default_rng(3)
    psi = jnp.asarray(rng.normal(size=m.n_states))
    want = np.asarray(apply_H(psi, m, backend="blocked"))
    psi_sh = shard_state(psi, mesh)
    f = jax.jit(lambda p: apply_H(p, m, backend="blocked"))
    got = np.asarray(f(psi_sh))
    assert np.allclose(got, want, atol=1e-12)


def test_sharded_embedded_groundstate(mesh):
    """Embedded layout + blocked backend + sharded psi: full ground-state solve."""
    from spindynamics_tpu import lanczos_groundstate

    m = xxz_chain(10, Jxy=1.0, Jz=0.5, nup=5, dtype=jnp.float64, layout="embedded")
    mv = matvec_fn(m)
    E0_ref, _, _ = lanczos_groundstate(mv, m.n_states, lanc_m=50,
                                       dtype=jnp.float64, mask=m.valid_mask())
    m_cmp = xxz_chain(10, Jxy=1.0, Jz=0.5, nup=5, dtype=jnp.float64)
    E0_sec, _, _ = lanczos_groundstate(matvec_fn(m_cmp), m_cmp.n_states,
                                       lanc_m=50, dtype=jnp.float64)
    assert E0_ref == pytest.approx(E0_sec, abs=1e-9)


def test_sharded_blocked_explicit_ppermute(mesh):
    """Hand-scheduled shard_map blocked matvec (ppermute halo for crossing
    bonds) == single-device blocked result, full and embedded modes."""
    from spindynamics_tpu.parallel.sharded_blocked import sharded_blocked_matvec_fn
    from spindynamics_tpu.ops.blocked import make_blocked_plan

    rng = np.random.default_rng(11)
    for nup in (None, 6):
        m = xxz_chain(12, Jxy=1.0, Jz=0.4, nup=nup, dtype=jnp.float64,
                      layout="embedded" if nup else "compact",
                      build_neighbor_table=False)
        plan = make_blocked_plan(m, 3, 3)  # B = 2^6 = 64 blocks over 8 shards
        psi = jnp.asarray(rng.normal(size=m.n_states))
        want = np.asarray(apply_H(psi, m, backend="blocked"))
        mv = sharded_blocked_matvec_fn(m, mesh, plan=plan)
        psi_sh = shard_state(psi, mesh)
        got = np.asarray(mv(psi_sh))
        assert np.allclose(got, want, atol=1e-12), np.abs(got - want).max()


def test_sharded_blocked_long_range(mesh):
    """Long-range model: crossing bonds with residual local flips."""
    from spindynamics_tpu import long_range_xy_chain
    from spindynamics_tpu.parallel.sharded_blocked import sharded_blocked_matvec_fn
    from spindynamics_tpu.ops.blocked import make_blocked_plan

    rng = np.random.default_rng(13)
    m = long_range_xy_chain(10, lambda i, j: 1.0 / (j - i) ** 2, nup=None,
                            dtype=jnp.float64, build_neighbor_table=False)
    plan = make_blocked_plan(m, 2, 2)  # B = 2^6 blocks over 8 shards
    psi = jnp.asarray(rng.normal(size=m.n_states))
    want = np.asarray(apply_H(psi, m, backend="blocked"))
    mv = sharded_blocked_matvec_fn(m, mesh, plan=plan)
    got = np.asarray(mv(shard_state(psi, mesh)))
    assert np.allclose(got, want, atol=1e-12), np.abs(got - want).max()


def test_sharded_planes_trajectory(mesh):
    """Complex-free plane trajectory with the state sharded over the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from spindynamics_tpu.solvers.planes import (
        chebyshev_time_evolve_planes, planes_matvec_fn)

    m = xxz_chain(10, Jxy=1.0, Jz=0.5, nup=5, dtype=jnp.float64,
                  layout="embedded")
    psi0 = np.asarray(domain_wall_state(m, dtype=jnp.float32))
    planes = jnp.stack([jnp.asarray(psi0), jnp.zeros_like(jnp.asarray(psi0))])
    bounds = (-8.0, 8.0)
    want = np.asarray(chebyshev_time_evolve_planes(planes, m, 0.2, bounds,
                                                   cheb_n=24))
    planes_sh = jax.device_put(planes, NamedSharding(mesh, P(None, "rows")))
    got = np.asarray(chebyshev_time_evolve_planes(planes_sh, m, 0.2, bounds,
                                                  cheb_n=24))
    assert np.allclose(got, want, atol=1e-6)


def test_sharded_kron_matvec_matches(mesh):
    """Row-sharded sector_kron flat state: GSPMD collectives on the hi-axis
    matmuls; result == single-device kron apply bit-for-bit tolerances."""
    from spindynamics_tpu.parallel.sharded_kron import (
        shardable_devices, sharded_kron_matvec_fn)

    m = xxz_chain(12, Jxy=1.0, Jz=0.4, nup=6, dtype=jnp.float64,
                  layout="sector_kron")
    rng = np.random.default_rng(7)
    mask = np.asarray(m.valid_mask())
    psi = jnp.asarray(rng.normal(size=m.n_states) * mask)
    want = np.asarray(apply_H(psi, m))
    mv, lay = sharded_kron_matvec_fn(m, mesh)
    assert shardable_devices(lay, 8) == 8  # group tensors are 1024-aligned
    got = np.asarray(mv(shard_state(psi, mesh)))
    assert np.allclose(got, want, atol=1e-10), np.abs(got - want).max()
    # pad slots stay an exact null subspace under the sharded apply too
    assert np.all(got[~mask] == 0.0)


def test_sharded_kron_groundstate(mesh):
    """Full Lanczos ground state through the sharded kron matvec; energy
    matches the compact-sector reference to 1e-9."""
    from spindynamics_tpu import lanczos_groundstate
    from spindynamics_tpu.parallel.sharded_kron import sharded_kron_matvec_fn

    m = xxz_chain(12, Jxy=1.0, Jz=0.5, nup=6, dtype=jnp.float64,
                  layout="sector_kron")
    mv, _ = sharded_kron_matvec_fn(m, mesh)
    E0, psi_gs, info = lanczos_groundstate(mv, m.n_states, lanc_m=60,
                                           dtype=jnp.float64,
                                           mask=m.valid_mask())
    m_cmp = xxz_chain(12, Jxy=1.0, Jz=0.5, nup=6, dtype=jnp.float64)
    E0_ref, _, _ = lanczos_groundstate(matvec_fn(m_cmp), m_cmp.n_states,
                                       lanc_m=60, dtype=jnp.float64)
    assert E0 == pytest.approx(E0_ref, abs=1e-9)
    assert info["residual"] < 1e-6


# ---- memory-scaling sharded kron (parallel/sharded_kron_scaling) -----------


class TestShardedKronScaling:
    @pytest.fixture(scope="class")
    def setup(self):
        import spindynamics_tpu as sd
        from spindynamics_tpu.parallel.sharded_kron_scaling import (
            sharded_kron_scaling_matvec_fn,
        )

        L = 14
        m = sd.xxz_chain(L, Jxy=1.0, Jz=0.7, nup=L // 2, dtype=jnp.float64,
                         layout="sector_kron")
        mesh = Mesh(np.array(jax.devices()), ("rows",))
        mv, lay, spec = sharded_kron_scaling_matvec_fn(m, mesh)
        return m, mesh, mv, lay, spec

    def test_matches_single_device(self, setup, rng):
        from spindynamics_tpu.ops.sector_kron import apply_H_sector_kron
        from spindynamics_tpu.parallel.sharded_kron_scaling import (
            shard_kron_state, unshard_kron_state,
        )

        m, mesh, mv, lay, spec = setup
        x = jnp.asarray(rng.standard_normal(lay.n_states))
        x = jnp.where(m.valid_mask(), x, 0.0)
        y_ref = apply_H_sector_kron(x, None, lay)
        xs = jax.device_put(shard_kron_state(x, spec),
                            NamedSharding(mesh, P("rows")))
        y = unshard_kron_state(mv(xs), spec)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=0, atol=1e-12)

    def test_shard_roundtrip_exact(self, setup, rng):
        from spindynamics_tpu.parallel.sharded_kron_scaling import (
            shard_kron_state, unshard_kron_state,
        )

        m, mesh, mv, lay, spec = setup
        x = jnp.asarray(rng.standard_normal(lay.n_states))
        assert float(jnp.max(jnp.abs(
            unshard_kron_state(shard_kron_state(x, spec), spec) - x))) == 0.0

    def test_no_full_allgather(self, setup):
        """The whole point (VERDICT r1 missing-1): per-device memory must be
        ~N/D — the compiled program may not all-gather the state. Hi-axis
        terms communicate via reduce-scatter only."""
        from spindynamics_tpu.ops.sector_kron import sector_kron_tables
        from spindynamics_tpu.parallel.sharded_kron_scaling import (
            shard_kron_state,
        )

        m, mesh, mv, lay, spec = setup
        x = jnp.zeros(lay.n_states)
        xs = jax.device_put(shard_kron_state(x, spec),
                            NamedSharding(mesh, P("rows")))
        # reach the underlying jitted fn to inspect the compiled module
        tables = jax.tree_util.tree_map(jnp.asarray, sector_kron_tables(lay))
        inner = mv.__closure__[0].cell_contents  # _mv jitted
        txt = inner.lower(xs, tables).compile().as_text()
        assert "all-gather" not in txt, "sharded kron apply all-gathers"

    def test_sharded_groundstate_matches_compact(self, setup):
        import spindynamics_tpu as sd
        from spindynamics_tpu.parallel.sharded_kron_scaling import (
            shard_kron_state,
        )

        m, mesh, mv, lay, spec = setup
        L = m.L
        mask = shard_kron_state(
            m.valid_mask().astype(jnp.float64), spec) > 0.5
        mask = jax.device_put(mask, NamedSharding(mesh, P("rows")))
        E_sh, _, info = sd.lanczos_groundstate_twopass(
            mv, spec.n_sharded, lanc_m=60, dtype=jnp.float64, mask=mask)
        mc = sd.xxz_chain(L, Jxy=1.0, Jz=0.7, nup=L // 2, dtype=jnp.float64)
        E_c, _, _ = sd.lanczos_groundstate(
            sd.matvec_fn(mc), mc.n_states, lanc_m=80, dtype=jnp.float64)
        assert E_sh == pytest.approx(E_c, abs=1e-9)


# ---- fused Pallas kernel on the memory-scaling sharded path (VERDICT r3 #1) -


class TestShardedKronFused:
    """The fused hi-local kernel (ops/pallas_kron) running INSIDE shard_map,
    with W_hi partials psum_scattered as the seed and mid|hi cross terms
    delivered as GSPMD halo windows (D > 1) or shifted BlockSpecs (D == 1)."""

    @pytest.fixture(scope="class")
    def setup(self):
        import spindynamics_tpu as sd
        from spindynamics_tpu.parallel.sharded_kron_scaling import (
            sharded_kron_scaling_matvec_fn,
        )

        L = 16
        fld = np.linspace(-0.2, 0.3, L)
        # splits (6, 4, 6): hi axes up to C(6,3)=20 > 8 devices, so local hi
        # blocks have b > 1 and windows genuinely cross shard boundaries
        m = sd.xxz_chain(L, Jxy=1.0, Jz=0.7, h=fld, nup=L // 2,
                         dtype=jnp.float32, layout="sector_kron",
                         kron_splits=(6, 4, 6))
        m64 = sd.xxz_chain(L, Jxy=1.0, Jz=0.7, h=fld, nup=L // 2,
                           dtype=jnp.float64, layout="sector_kron",
                           kron_splits=(6, 4, 6))
        mesh = Mesh(np.array(jax.devices()), ("rows",))
        mv, lay, spec = sharded_kron_scaling_matvec_fn(m, mesh, use_fused=True)
        return m, m64, mesh, mv, lay, spec

    def _oracle(self, m64, x):
        from spindynamics_tpu.ops.sector_kron import (
            apply_H_sector_kron, make_sector_kron_layout)

        lay64 = make_sector_kron_layout(m64, m64.kron_splits, m64.kron_pads)
        return apply_H_sector_kron(x.astype(jnp.float64), None, lay64)

    def test_matches_x64_oracle(self, setup, rng):
        from spindynamics_tpu.parallel.sharded_kron_scaling import (
            shard_kron_state, unshard_kron_state,
        )

        m, m64, mesh, mv, lay, spec = setup
        x = jnp.asarray(rng.standard_normal(lay.n_states), jnp.float32)
        x = jnp.where(m.valid_mask(), x, 0.0)
        y_ref = self._oracle(m64, x)
        xs = jax.device_put(shard_kron_state(x, spec),
                            NamedSharding(mesh, P("rows")))
        y = unshard_kron_state(mv(xs), spec)
        scale = float(jnp.max(jnp.abs(y_ref)))
        np.testing.assert_allclose(np.asarray(y, np.float64),
                                   np.asarray(y_ref), rtol=0,
                                   atol=1e-5 * scale)

    def test_matches_single_device_fused(self, setup, rng):
        """Bit-level f32 agreement band with the single-device fused apply."""
        from spindynamics_tpu.ops.pallas_kron import apply_H_sector_kron_fused
        from spindynamics_tpu.ops.sector_kron import (
            blocks_to_flat, flat_to_blocks)
        from spindynamics_tpu.parallel.sharded_kron_scaling import (
            shard_kron_state, unshard_kron_state,
        )

        m, m64, mesh, mv, lay, spec = setup
        x = jnp.asarray(rng.standard_normal(lay.n_states), jnp.float32)
        x = jnp.where(m.valid_mask(), x, 0.0)
        y1 = blocks_to_flat(
            apply_H_sector_kron_fused(flat_to_blocks(x, lay), lay), lay)
        xs = jax.device_put(shard_kron_state(x, spec),
                            NamedSharding(mesh, P("rows")))
        y = unshard_kron_state(mv(xs), spec)
        scale = float(jnp.max(jnp.abs(y1)))
        np.testing.assert_allclose(np.asarray(y), np.asarray(y1), rtol=0,
                                   atol=2e-6 * scale)

    def test_no_allgather(self, setup):
        m, m64, mesh, mv, lay, spec = setup
        from spindynamics_tpu.parallel.sharded_kron_scaling import (
            shard_kron_state,
        )

        x = jnp.zeros(lay.n_states, jnp.float32)
        xs = jax.device_put(shard_kron_state(x, spec),
                            NamedSharding(mesh, P("rows")))
        txt = mv._jitted.lower(xs, mv._tables).compile().as_text()
        assert "all-gather" not in txt, \
            "fused sharded kron apply all-gathers (windows must lower to " \
            "slice/pad halo exchanges, not scatters)"

    def test_seeds_issued_before_kernels(self, setup):
        """Collective/compute overlap structure (VERDICT r4 #1): in the
        traced apply, EVERY W_hi psum_scatter is issued before ANY Pallas
        kernel launches, and (by construction of that order) no scatter
        operand can depend on a kernel output — the dataflow freedom the
        latency-hiding scheduler needs to keep reduce-scatters in flight
        under other groups' kernel compute. Asserted on the jaxpr (trace
        order is what XLA schedules from; CPU interpret-mode HLO has no
        custom-call markers to assert on)."""
        from spindynamics_tpu.parallel.sharded_kron_scaling import (
            collective_traffic_model, shard_kron_state,
        )

        m, m64, mesh, mv, lay, spec = setup
        x = jnp.zeros(lay.n_states, jnp.float32)
        xs = jax.device_put(shard_kron_state(x, spec),
                            NamedSharding(mesh, P("rows")))
        jx = jax.make_jaxpr(mv._jitted.__wrapped__)(xs, mv._tables)

        names = []

        def walk(j):
            for e in j.eqns:
                names.append(e.primitive.name)
                for v in e.params.values():
                    vs = v if isinstance(v, (list, tuple)) else [v]
                    for w in vs:
                        if hasattr(w, "eqns"):
                            walk(w)
                        elif hasattr(w, "jaxpr") and hasattr(w.jaxpr, "eqns"):
                            walk(w.jaxpr)

        walk(jx.jaxpr)
        rs = [i for i, n in enumerate(names) if n == "reduce_scatter"]
        pc = [i for i, n in enumerate(names) if n == "pallas_call"]
        model = collective_traffic_model(lay, spec, mv._cfg)
        assert len(rs) == model["n_reduce_scatter"]
        assert pc, "fused apply must launch Pallas kernels"
        assert max(rs) < min(pc), (
            "two-phase overlap structure violated: a W_hi psum_scatter is "
            "traced after a kernel launch (serializes ICI with compute)")
        assert model["overlappable_bytes"] == (
            model["reduce_scatter_bytes"] * (spec.D - 1) // spec.D
            + model["window_bytes"])

    def test_collective_volume_matches_model(self, setup):
        """HLO-level collective accounting (VERDICT r3 weak-2 / next-4): the
        compiled module's reduce-scatter operands must match the locality
        model EXACTLY (count and bytes), and the window halo exchange must
        stay within a small multiple of the window content — a change that
        silently doubles traffic fails here."""
        import re

        from spindynamics_tpu.parallel.sharded_kron_scaling import (
            collective_traffic_model, shard_kron_state,
        )

        m, m64, mesh, mv, lay, spec = setup
        model = collective_traffic_model(lay, spec, mv._cfg)
        x = jnp.zeros(lay.n_states, jnp.float32)
        xs = jax.device_put(shard_kron_state(x, spec),
                            NamedSharding(mesh, P("rows")))
        txt = mv._jitted.lower(xs, mv._tables).compile().as_text()

        def op_bytes(name):
            tot, n = 0, 0
            for mt in re.finditer(
                    r"= f32\[([\d,]*)\]\S* " + name + r"\(", txt):
                dims = [int(v) for v in mt.group(1).split(",") if v]
                el = 1
                for v in dims:
                    el *= v
                tot += 4 * el
                n += 1
            return tot, n

        rs_bytes, n_rs = op_bytes("reduce-scatter")
        # reduce-scatter HLO ops report the scattered OUTPUT shape [b, ...];
        # operand volume is D x that
        assert n_rs == model["n_reduce_scatter"]
        assert rs_bytes * spec.D == model["reduce_scatter_bytes"]

        cp_bytes, n_cp = op_bytes("collective-permute")
        assert model["window_bytes"] > 0
        assert cp_bytes > 0
        # halo exchanges move boundary rows; allow GSPMD slack but fail on
        # anything close to a second full-window copy
        assert cp_bytes <= 2 * model["window_bytes"], (
            cp_bytes, model["window_bytes"])

    def test_single_device_mesh_uses_blockspec_path(self, rng):
        """D == 1: no windows are built; crossh streams through the kernel's
        shifted BlockSpecs (the exact single-device v2 Mosaic modules)."""
        import spindynamics_tpu as sd
        from spindynamics_tpu.parallel.sharded_kron_scaling import (
            shard_kron_state, sharded_kron_scaling_matvec_fn,
            unshard_kron_state,
        )

        L = 14
        m = sd.xxz_chain(L, Jxy=1.0, Jz=0.7, nup=L // 2, dtype=jnp.float32,
                         layout="sector_kron")
        m64 = sd.xxz_chain(L, Jxy=1.0, Jz=0.7, nup=L // 2, dtype=jnp.float64,
                           layout="sector_kron")
        mesh = Mesh(np.array(jax.devices()[:1]), ("rows",))
        mv, lay, spec = sharded_kron_scaling_matvec_fn(m, mesh,
                                                       use_fused=True)
        assert mv._cfg is not None and not mv._cfg.windowed
        x = jnp.asarray(rng.standard_normal(lay.n_states), jnp.float32)
        x = jnp.where(m.valid_mask(), x, 0.0)
        y_ref = self._oracle(m64, x)
        xs = jax.device_put(shard_kron_state(x, spec),
                            NamedSharding(mesh, P("rows")))
        y = unshard_kron_state(mv(xs), spec)
        scale = float(jnp.max(jnp.abs(y_ref)))
        np.testing.assert_allclose(np.asarray(y, np.float64),
                                   np.asarray(y_ref), rtol=0,
                                   atol=1e-5 * scale)

    def test_sharded_fused_groundstate(self, setup):
        """End-to-end: two-pass ground state through the fused sharded matvec
        matches the compact-layout reference energy."""
        import spindynamics_tpu as sd
        from spindynamics_tpu.parallel.sharded_kron_scaling import (
            shard_kron_state,
        )

        m, m64, mesh, mv, lay, spec = setup
        mask = shard_kron_state(
            m.valid_mask().astype(jnp.float32), spec) > 0.5
        mask = jax.device_put(mask, NamedSharding(mesh, P("rows")))
        E_sh, _, info = sd.lanczos_groundstate_twopass(
            mv, spec.n_sharded, lanc_m=50, dtype=jnp.float32, mask=mask)
        mc = sd.xxz_chain(m.L, Jxy=1.0, Jz=0.7,
                          h=np.linspace(-0.2, 0.3, m.L), nup=m.L // 2,
                          dtype=jnp.float64)
        E_c, _, _ = sd.lanczos_groundstate(
            sd.matvec_fn(mc), mc.n_states, lanc_m=80, dtype=jnp.float64)
        assert E_sh == pytest.approx(E_c, abs=5e-4)


class TestShardedKronFusedBlockVec:
    """The BlockVec form of the fused sharded matvec (leaves as whole
    buffers: no slice copies, no concatenate — the fast form)."""

    @pytest.fixture(scope="class")
    def setup(self):
        import spindynamics_tpu as sd
        from spindynamics_tpu.parallel.sharded_kron_scaling import (
            sharded_kron_scaling_bv_matvec_fn,
        )

        L = 16
        fld = np.linspace(-0.2, 0.3, L)
        m = sd.xxz_chain(L, Jxy=1.0, Jz=0.7, h=fld, nup=L // 2,
                         dtype=jnp.float32, layout="sector_kron",
                         kron_splits=(6, 4, 6))
        m64 = sd.xxz_chain(L, Jxy=1.0, Jz=0.7, h=fld, nup=L // 2,
                           dtype=jnp.float64, layout="sector_kron",
                           kron_splits=(6, 4, 6))
        mesh = Mesh(np.array(jax.devices()), ("rows",))
        mv, lay, spec = sharded_kron_scaling_bv_matvec_fn(m, mesh,
                                                          use_fused=True)
        return m, m64, mesh, mv, lay, spec

    def _sharded_state(self, mesh, spec, bv):
        from spindynamics_tpu.parallel.sharded_kron_scaling import (
            shard_kron_blockvec,
        )
        from spindynamics_tpu.solvers.blockvec import BlockVec

        sh = NamedSharding(mesh, P("rows"))
        return BlockVec([jax.device_put(l, sh)
                         for l in shard_kron_blockvec(bv, spec).leaves])

    def test_matches_x64_oracle(self, setup):
        from spindynamics_tpu.ops.sector_kron import (
            apply_H_sector_kron, make_sector_kron_layout)
        from spindynamics_tpu.parallel.sharded_kron_scaling import (
            unshard_kron_blockvec,
        )
        from spindynamics_tpu.solvers.blockvec import bv_random

        m, m64, mesh, mv, lay, spec = setup
        bv = bv_random(lay, jax.random.PRNGKey(3), jnp.float32)
        lay64 = make_sector_kron_layout(m64, m64.kron_splits, m64.kron_pads)
        y_ref = apply_H_sector_kron([l.astype(jnp.float64) for l in bv.leaves],
                                    None, lay64)
        y = unshard_kron_blockvec(mv(self._sharded_state(mesh, spec, bv)),
                                  spec)
        scale = max(float(jnp.max(jnp.abs(b))) for b in y_ref)
        for a, b in zip(y.leaves, y_ref):
            np.testing.assert_allclose(np.asarray(a, np.float64),
                                       np.asarray(b), rtol=0,
                                       atol=1e-5 * scale)

    def test_no_allgather_and_collectives_match_flat_form(self, setup):
        from spindynamics_tpu.parallel.sharded_kron_scaling import (
            collective_traffic_model,
        )
        from spindynamics_tpu.solvers.blockvec import bv_random

        m, m64, mesh, mv, lay, spec = setup
        bv = bv_random(lay, jax.random.PRNGKey(4), jnp.float32)
        xs = self._sharded_state(mesh, spec, bv)
        txt = mv._jitted.lower(tuple(xs.leaves), mv._tables).compile().as_text()
        assert "all-gather" not in txt
        model = collective_traffic_model(lay, spec, mv._cfg)
        assert txt.count("reduce-scatter(") == model["n_reduce_scatter"]

    def test_groundstate_through_bv_form(self, setup):
        import spindynamics_tpu as sd
        from spindynamics_tpu.solvers.blockvec import bv_random

        m, m64, mesh, mv, lay, spec = setup
        v0 = self._sharded_state(mesh, spec,
                                 bv_random(lay, jax.random.PRNGKey(5),
                                           jnp.float32))
        E_sh, _, info = sd.lanczos_groundstate_twopass(
            mv, None, lanc_m=50, dtype=jnp.float32, v0=v0)
        mc = sd.xxz_chain(m.L, Jxy=1.0, Jz=0.7,
                          h=np.linspace(-0.2, 0.3, m.L), nup=m.L // 2,
                          dtype=jnp.float64)
        E_c, _, _ = sd.lanczos_groundstate(
            sd.matvec_fn(mc), mc.n_states, lanc_m=80, dtype=jnp.float64)
        assert E_sh == pytest.approx(E_c, abs=5e-4)


def test_zext_guard_regression_khmax_tail_groups(rng):
    """Regression (round-4 shardmap smoke catch): the hi-run Zext scratch in
    _hi_terms_z must contain the update wherever it lands — with a SOURCE hi
    axis larger than the destination's (k_h-max groups) and small D, an
    undersized buffer made dynamic_update_slice clamp the start and place
    the slab on the WRONG rows (rel err 2e-2 at L=24 D=1). Force tail
    groups with a small top_k so the XLA Zext path runs."""
    import spindynamics_tpu as sd
    from spindynamics_tpu.ops.sector_kron import (
        apply_H_sector_kron, make_sector_kron_layout)
    from spindynamics_tpu.parallel.sharded_kron_scaling import (
        shard_kron_blockvec, sharded_kron_scaling_bv_matvec_fn,
        unshard_kron_blockvec)
    from spindynamics_tpu.solvers.blockvec import BlockVec

    L = 14
    m = sd.xxz_chain(L, Jxy=1.0, Jz=0.7, nup=L // 2, dtype=jnp.float32,
                     layout="sector_kron", kron_splits=(6, 4, 4))
    m64 = sd.xxz_chain(L, Jxy=1.0, Jz=0.7, nup=L // 2, dtype=jnp.float64,
                       layout="sector_kron", kron_splits=(6, 4, 4))
    lay = make_sector_kron_layout(m, m.kron_splits, m.kron_pads)
    lay64 = make_sector_kron_layout(m64, m64.kron_splits, m64.kron_pads)
    x = jnp.asarray(rng.standard_normal(lay.n_states), jnp.float32)
    x = jnp.where(m.valid_mask(), x, 0.0)
    from spindynamics_tpu.ops.sector_kron import flat_to_blocks

    bv = BlockVec(flat_to_blocks(x, lay))
    y_ref = apply_H_sector_kron([l.astype(jnp.float64) for l in bv.leaves],
                                None, lay64)
    scale = max(float(jnp.max(jnp.abs(b))) for b in y_ref)
    for D in (1, 2):
        mesh = Mesh(np.array(jax.devices()[:D]), ("rows",))
        mv, _, spec = sharded_kron_scaling_bv_matvec_fn(m, mesh, top_k=8)
        sh = NamedSharding(mesh, P("rows"))
        xs = BlockVec([jax.device_put(l, sh)
                       for l in shard_kron_blockvec(bv, spec).leaves])
        with mesh:
            y = unshard_kron_blockvec(mv(xs), spec)
        for a, b in zip(y.leaves, y_ref):
            np.testing.assert_allclose(np.asarray(a, np.float64),
                                       np.asarray(b), rtol=0,
                                       atol=1e-5 * scale)


def test_sharded_bv_bf16_amplitude_mode(rng):
    """bf16 amplitude mode on the sharded BV path: half HBM AND half ICI
    per apply; f32 in-kernel accumulation keeps the error at the bf16
    representation level (same bound as the single-chip mode)."""
    import spindynamics_tpu as sd
    from spindynamics_tpu.ops.sector_kron import (
        apply_H_sector_kron, flat_to_blocks, make_sector_kron_layout)
    from spindynamics_tpu.parallel.sharded_kron_scaling import (
        shard_kron_blockvec, sharded_kron_scaling_bv_matvec_fn,
        unshard_kron_blockvec)
    from spindynamics_tpu.solvers.blockvec import BlockVec

    L = 14
    m = sd.xxz_chain(L, Jxy=1.0, Jz=0.7, nup=L // 2, dtype=jnp.bfloat16,
                     layout="sector_kron", kron_splits=(6, 4, 4))
    m64 = sd.xxz_chain(L, Jxy=1.0, Jz=0.7, nup=L // 2, dtype=jnp.float64,
                       layout="sector_kron", kron_splits=(6, 4, 4))
    lay = make_sector_kron_layout(m, m.kron_splits, m.kron_pads)
    lay64 = make_sector_kron_layout(m64, m64.kron_splits, m64.kron_pads)
    x = jnp.asarray(rng.standard_normal(lay.n_states), jnp.float32)
    x = jnp.where(m.valid_mask(), x, 0.0)
    bv = BlockVec(flat_to_blocks(x, lay)).astype(jnp.bfloat16)
    y_ref = apply_H_sector_kron(
        [l.astype(jnp.float64) for l in bv.leaves], None, lay64)
    scale = max(float(jnp.max(jnp.abs(b))) for b in y_ref)
    mesh = Mesh(np.array(jax.devices()), ("rows",))
    mv, _, spec = sharded_kron_scaling_bv_matvec_fn(m, mesh)
    assert mv._cfg is not None and mv._cfg.state_dtype == jnp.bfloat16
    sh = NamedSharding(mesh, P("rows"))
    xs = BlockVec([jax.device_put(l, sh)
                   for l in shard_kron_blockvec(bv, spec).leaves])
    with mesh:
        y = unshard_kron_blockvec(mv(xs), spec)
    assert y.leaves[0].dtype == jnp.bfloat16
    for a, b in zip(y.leaves, y_ref):
        np.testing.assert_allclose(np.asarray(a, np.float64), np.asarray(b),
                                   rtol=0, atol=2e-2 * scale)


def test_groundstate_kron_on_mesh():
    """groundstate_kron(mesh=...): the whole restarted solve sharded — the
    multi-host L>=32 route. Matches the compact reference energy and keeps
    the Ritz vector sharded."""
    import spindynamics_tpu as sd

    L = 12
    m = sd.xxz_chain(L, Jxy=1.0, Jz=0.5, nup=L // 2, dtype=jnp.float32,
                     layout="sector_kron")
    mesh = Mesh(np.array(jax.devices()), ("rows",))
    E0, psi, info, lay = sd.groundstate_kron(
        m, lanc_m=30, cycles=3, target_residual=1e-4, mesh=mesh)
    mc = sd.xxz_chain(L, Jxy=1.0, Jz=0.5, nup=L // 2, dtype=jnp.float64)
    E_c, _, _ = sd.lanczos_groundstate(
        sd.matvec_fn(mc), mc.n_states, lanc_m=60, dtype=jnp.float64)
    assert E0 == pytest.approx(E_c, abs=1e-3)
    assert info["residual"] < 1e-3
    rows = NamedSharding(mesh, P("rows"))
    assert psi.leaves[0].sharding.is_equivalent_to(rows, psi.leaves[0].ndim)


def test_kpm_sqw_kron_on_mesh():
    """kpm_sqw_kron(mesh=...): ground state + phi construction + moment
    recurrences all P(rows)-sharded — matches the single-device result."""
    import spindynamics_tpu as sd
    from spindynamics_tpu.solvers.runners import kpm_sqw_kron

    L = 12
    m = sd.xxz_chain(L, Jxy=1.0, Jz=1.0, nup=L // 2, dtype=jnp.float32,
                     layout="sector_kron")
    q = [np.pi / 2, np.pi]
    omega = np.linspace(0, 4, 40)
    S_ref, info_ref = kpm_sqw_kron(m, q, omega, kpm_m=40, lanc_m=30,
                                   cycles=3, fused=False,
                                   key=jax.random.PRNGKey(2))
    mesh = Mesh(np.array(jax.devices()), ("rows",))
    S, info = kpm_sqw_kron(m, q, omega, kpm_m=40, lanc_m=30, cycles=3,
                           fused=False, mesh=mesh,
                           key=jax.random.PRNGKey(2),
                           bounds=(info_ref["bounds"]))
    # same physics; ground states may differ by restart path details, so
    # compare spectra loosely but meaningfully
    assert S.shape == S_ref.shape
    np.testing.assert_allclose(info["E0"], info_ref["E0"], atol=2e-3)
    scale = float(np.max(np.abs(S_ref))) or 1.0
    np.testing.assert_allclose(S, S_ref, atol=0.05 * scale)
