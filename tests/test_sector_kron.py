"""3-way Kronecker-factorized sector layout: all-matmul matvec (ops/sector_kron.py).

Oracle: dense H built from the ascending-order compact model (exact at 1e-10 in
x64), reordered into the kron group order — the same sector-vs-oracle pattern as
the reference's embedding test (test/runtests.jl:52-91). Tile-padding slots
(PAD_SENTINEL states) must stay exactly zero through the apply."""

import jax.numpy as jnp
import numpy as np
import pytest

from spindynamics_tpu import build_dense_H, build_model, xxz_chain
from spindynamics_tpu.ops.sector_kron import (
    PAD_SENTINEL,
    apply_H_sector_kron,
    default_kron_splits,
    kron_order_states,
    kron_rank,
    make_sector_kron_layout,
)


def _oracle_check(m, splits, rng, pads=(8, 128), atol=1e-10):
    H = build_dense_H(m)
    states_asc = np.asarray(m.states)
    states_k = kron_order_states(m.L, m.nup, splits, pads)
    valid = states_k != PAD_SENTINEL
    assert np.array_equal(np.sort(states_k[valid]), states_asc)
    perm = np.searchsorted(states_asc, states_k[valid])
    layout = make_sector_kron_layout(
        (m.L, m.nup, m.hop_sites, tuple(np.asarray(m.hop_J, np.float64).tolist())),
        splits, pads,
    )
    assert layout.n_states == states_k.shape[0]
    assert layout.n_basis == m.n_states
    psi = rng.normal(size=m.n_states)
    psi_pad = np.zeros(layout.n_states)
    psi_pad[valid] = psi[perm]
    diag_pad = np.zeros(layout.n_states)
    diag_pad[valid] = np.asarray(m.diag)[perm]
    want = np.zeros(layout.n_states)
    want[valid] = (H @ psi)[perm]
    got = np.asarray(
        apply_H_sector_kron(jnp.asarray(psi_pad), jnp.asarray(diag_pad), layout)
    )
    assert np.abs(got - want).max() < atol
    # pad slots are an exact invariant null subspace
    assert np.all(got[~valid] == 0.0)
    # factored-diagonal path (diag=None, layout built from the model so it
    # carries field/zz) must agree exactly
    layout_f = make_sector_kron_layout(m, splits, pads)
    got_f = np.asarray(apply_H_sector_kron(jnp.asarray(psi_pad), None, layout_f))
    assert np.abs(got_f - want).max() < atol


@pytest.mark.parametrize(
    "L,nup,splits,pads",
    [
        (8, 4, (3, 3, 2), (8, 128)),
        (10, 5, (4, 3, 3), (8, 128)),
        (10, 5, (4, 3, 3), (1, 1)),
        (12, 6, (5, 4, 3), (8, 128)),
        (12, 6, (5, 4, 3), (4, 8)),
        (12, 3, (4, 4, 4), (8, 128)),
        (9, 7, (3, 3, 3), (2, 4)),
    ],
)
def test_matvec_vs_dense(L, nup, splits, pads, rng):
    m = xxz_chain(L, Jxy=1.0, Jz=0.55, h=rng.normal(size=L) * 0.2, nup=nup,
                  dtype=jnp.float64)
    _oracle_check(m, splits, rng, pads)


def test_long_range_bonds(rng):
    # all-pairs hopping exercises lo-mid, lo-hi, mid-hi crossings and the
    # per-(part-pair, bit, direction) merging of one-hot factors
    L, nup = 9, 4
    hopping = [(i, j, 0.3 + 0.1 * (i + j)) for i in range(L)
               for j in range(i + 1, L)]
    zz = [(i, j, 0.2) for i in range(L - 1) for j in (i + 1,)]
    m = build_model(L, nup=nup, hopping=hopping, zz=zz, dtype=jnp.float64)
    _oracle_check(m, (3, 3, 3), rng)


def test_random_bonds_fuzz(rng):
    L, nup = 10, 5
    for trial in range(4):
        nb = int(rng.integers(1, 12))
        bonds = set()
        while len(bonds) < nb:
            i, j = sorted(rng.integers(0, L, size=2).tolist())
            if i != j:
                bonds.add((i, j))
        hopping = [(i, j, float(rng.normal())) for (i, j) in bonds]
        m = build_model(L, nup=nup, hopping=hopping, dtype=jnp.float64)
        _oracle_check(m, (4, 3, 3), rng, pads=(2, 4))


def test_complex_psi(rng):
    m = xxz_chain(10, Jxy=1.0, Jz=1.0, nup=5, dtype=jnp.float64)
    splits, pads = (4, 3, 3), (2, 4)
    H = build_dense_H(m)
    states_asc = np.asarray(m.states)
    states_k = kron_order_states(10, 5, splits, pads)
    valid = states_k != PAD_SENTINEL
    perm = np.searchsorted(states_asc, states_k[valid])
    layout = make_sector_kron_layout(
        (10, 5, m.hop_sites, tuple(np.asarray(m.hop_J, np.float64).tolist())),
        splits, pads,
    )
    psi = rng.normal(size=m.n_states) + 1j * rng.normal(size=m.n_states)
    psi_pad = np.zeros(layout.n_states, complex)
    psi_pad[valid] = psi[perm]
    diag_pad = np.zeros(layout.n_states)
    diag_pad[valid] = np.asarray(m.diag)[perm]
    want = np.zeros(layout.n_states, complex)
    want[valid] = (H @ psi)[perm]
    got = np.asarray(
        apply_H_sector_kron(jnp.asarray(psi_pad), jnp.asarray(diag_pad), layout)
    )
    assert np.abs(got - want).max() < 1e-10


def test_model_integration(rng):
    from spindynamics_tpu import (
        apply_H,
        chebyshev_time_evolve,
        domain_wall_state,
        lanczos_groundstate,
        magnetization_per_site,
        matvec_fn,
    )

    m_c = xxz_chain(10, Jxy=1.0, Jz=0.5, nup=5, dtype=jnp.float64)
    m_k = xxz_chain(10, Jxy=1.0, Jz=0.5, nup=5, dtype=jnp.float64,
                    layout="sector_kron")
    assert m_k.kron_splits is not None
    assert m_k.dim == m_c.n_states  # logical dimension excludes tile padding
    # dispatch picks the kron backend and matches the compact apply (reordered)
    states_asc = np.asarray(m_c.states)
    states_k = np.asarray(m_k.states)
    valid = states_k != PAD_SENTINEL
    perm = np.searchsorted(states_asc, states_k[valid])
    psi = rng.normal(size=m_c.n_states)
    psi_k = np.zeros(m_k.n_states)
    psi_k[valid] = psi[perm]
    want = np.asarray(apply_H(jnp.asarray(psi), m_c, backend="ell"))
    got = np.asarray(apply_H(jnp.asarray(psi_k), m_k))
    assert np.allclose(got[valid], want[perm], atol=1e-10)
    assert np.all(got[~valid] == 0.0)

    E_c, _, _ = lanczos_groundstate(matvec_fn(m_c), m_c.n_states, lanc_m=50,
                                    dtype=jnp.float64)
    E_k, _, info = lanczos_groundstate(matvec_fn(m_k), m_k.n_states,
                                       lanc_m=50, dtype=jnp.float64,
                                       mask=m_k.valid_mask())
    assert E_k == pytest.approx(E_c, abs=1e-9)
    assert info["residual"] < 1e-8

    # initial states and evolution work in the kron order
    psi0 = domain_wall_state(m_k, dtype=jnp.complex128)
    psi_t = chebyshev_time_evolve(psi0, matvec_fn(m_k), 0.2, (-8, 8), cheb_n=30)
    mags_k = np.asarray(magnetization_per_site(psi_t, m_k))
    psi0c = domain_wall_state(m_c, dtype=jnp.complex128)
    psi_tc = chebyshev_time_evolve(psi0c, matvec_fn(m_c), 0.2, (-8, 8), cheb_n=30)
    mags_c = np.asarray(magnetization_per_site(psi_tc, m_c))
    assert np.allclose(mags_k, mags_c, atol=1e-10)


def test_lean_build(rng):
    """lean=True skips states/diag; synthesized states, factored diag and the
    valid mask must reproduce the materialized model exactly."""
    from spindynamics_tpu import apply_H, lanczos_groundstate, matvec_fn

    m = xxz_chain(10, Jxy=1.0, Jz=0.5, h=rng.normal(size=10) * 0.1, nup=5,
                  dtype=jnp.float64, layout="sector_kron")
    ml = xxz_chain(10, Jxy=1.0, Jz=0.5, h=np.asarray(m.field), nup=5,
                   dtype=jnp.float64, layout="sector_kron", lean=True)
    assert ml.states is None and ml.diag is None
    assert ml.n_states == m.n_states and ml.dim == m.dim
    assert np.array_equal(np.asarray(ml.basis_states()), np.asarray(m.states))
    assert np.array_equal(np.asarray(ml.valid_mask()), np.asarray(m.valid_mask()))
    psi = rng.normal(size=m.n_states) * np.asarray(m.valid_mask())
    got = np.asarray(apply_H(jnp.asarray(psi), ml))
    want = np.asarray(apply_H(jnp.asarray(psi), m))
    assert np.allclose(got, want, atol=1e-12)
    E, _, info = lanczos_groundstate(matvec_fn(ml), ml.n_states, lanc_m=40,
                                     dtype=jnp.float64, mask=ml.valid_mask())
    E0, _, _ = lanczos_groundstate(matvec_fn(m), m.n_states, lanc_m=40,
                                   dtype=jnp.float64, mask=m.valid_mask())
    assert E == pytest.approx(E0, abs=1e-9)


def test_kron_rank_roundtrip():
    splits, pads = (4, 3, 3), (8, 128)
    states = kron_order_states(10, 5, splits, pads)
    for i in range(0, len(states), 13):
        if states[i] == PAD_SENTINEL:
            continue
        assert kron_rank(int(states[i]), 10, 5, splits, pads) == i


def test_default_splits():
    for L in (8, 12, 16, 24, 28, 32):
        L1, L2, L3 = default_kron_splits(L)
        assert L1 + L2 + L3 == L and min(L1, L2, L3) >= 1
        import math

        assert math.comb(L1, L1 // 2) <= 512


def test_split_argmin_study():
    """Round-3 split study (kron_split_argmin docstring): the flop-argmin
    split genuinely cuts modeled flops vs the default heuristic — and still
    LOST on the real chip at every measured point, which is why
    default_kron_splits keeps the lane-512 heuristic. This pins both halves:
    the proxy ranks the argmin below the default (the study is reproducible)
    while the default stays the heuristic (the measured winner)."""
    from spindynamics_tpu.ops.sector_kron import (
        _kron_split_cost, kron_apply_flops, kron_split_argmin)

    # pin the specific argmin tuples recorded in the round-3 study (the
    # "<= default by construction" loop was tautological — the default lies
    # inside the argmin's search space; advisor r3)
    assert kron_split_argmin(32) == (10, 11, 11)
    assert kron_split_argmin(28) == (10, 8, 10)
    assert default_kron_splits(32) == (11, 11, 10)
    assert default_kron_splits(28) == (11, 9, 8)
    assert kron_split_argmin(28) != default_kron_splits(28)
    with pytest.raises(ValueError):
        kron_split_argmin(3)

    # the proxy's flop ordering agrees with the exact kron_apply_flops where
    # the exact model is cheap to build (validated by hand to L=32 in round 3)
    m = build_model(16, nup=8, hopping=[(i, i + 1, 1.0) for i in range(15)],
                    layout="sector_kron")
    lay_am = make_sector_kron_layout(m, kron_split_argmin(16, 8))
    lay_de = make_sector_kron_layout(m, default_kron_splits(16, 8))
    assert kron_apply_flops(lay_am) < kron_apply_flops(lay_de)


# ---- fused Pallas hi-local kernel (ops/pallas_kron, VERDICT r1 item 2) -----


class TestFusedKron:
    @pytest.mark.parametrize("L", [12, 14])
    @pytest.mark.parametrize("fuse_crossh", [False, True])
    def test_fused_matches_x64_oracle(self, L, fuse_crossh):
        import spindynamics_tpu as sd
        from spindynamics_tpu.ops.pallas_kron import apply_H_sector_kron_fused
        from spindynamics_tpu.ops.sector_kron import (
            apply_H_sector_kron, blocks_to_flat, flat_to_blocks,
            make_sector_kron_layout)

        fld = np.linspace(-0.2, 0.3, L)
        m = sd.xxz_chain(L, Jxy=1.0, Jz=0.7, h=fld, nup=L // 2,
                         dtype=jnp.float64, layout="sector_kron")
        lay = make_sector_kron_layout(m, m.kron_splits)
        rng = np.random.default_rng(0)
        x64 = jnp.asarray(rng.standard_normal(lay.n_states))
        x64 = jnp.where(m.valid_mask(), x64, 0.0)
        y64 = apply_H_sector_kron(x64, None, lay)
        blocks = flat_to_blocks(x64.astype(jnp.float32), lay)
        y32 = blocks_to_flat(
            apply_H_sector_kron_fused(blocks, lay, fuse_crossh=fuse_crossh),
            lay)
        scale = float(jnp.max(jnp.abs(y64)))
        err = float(jnp.max(jnp.abs(y32.astype(jnp.float64) - y64)))
        assert err < 5e-6 * scale

    def test_fused_bf16_amplitudes(self):
        """Opt-in bf16 state mode (VERDICT r2 item 8): half-traffic amplitude
        storage with f32 in-kernel accumulation. Accuracy class = one bf16
        rounding of the state per apply (~4e-3 rel), NOT the garbage class of
        bf16 accumulation."""
        import spindynamics_tpu as sd
        from spindynamics_tpu.ops.pallas_kron import apply_H_sector_kron_fused
        from spindynamics_tpu.ops.sector_kron import (
            apply_H_sector_kron, blocks_to_flat, flat_to_blocks,
            make_sector_kron_layout)

        L = 12
        m = sd.xxz_chain(L, Jxy=1.0, Jz=0.7, h=np.linspace(-0.2, 0.3, L),
                         nup=L // 2, dtype=jnp.float64, layout="sector_kron")
        lay = make_sector_kron_layout(m, m.kron_splits)
        rng = np.random.default_rng(0)
        x64 = jnp.asarray(rng.standard_normal(lay.n_states))
        x64 = jnp.where(m.valid_mask(), x64, 0.0)
        y64 = apply_H_sector_kron(x64, None, lay)
        blocks = flat_to_blocks(x64.astype(jnp.float32), lay)
        bblocks = [b.astype(jnp.bfloat16) for b in blocks]
        out = apply_H_sector_kron_fused(bblocks, lay)
        assert all(b.dtype == jnp.bfloat16 for b in out)
        ybf = blocks_to_flat([b.astype(jnp.float32) for b in out], lay)
        scale = float(jnp.max(jnp.abs(y64)))
        err = float(jnp.max(jnp.abs(ybf.astype(jnp.float64) - y64)))
        assert err < 3e-2 * scale  # bf16 state rounding, not accumulation
        # and far better than bf16-accumulated would be at this L: the f32
        # scratch keeps the per-element error to a few input roundings
        assert err > 1e-7 * scale  # sanity: it IS the bf16 class

    def test_groundstate_kron_runner(self):
        import spindynamics_tpu as sd

        L = 12
        m = sd.xxz_chain(L, Jxy=1.0, Jz=1.0, nup=L // 2, dtype=jnp.float32,
                         layout="sector_kron")
        E0, psi, info, lay = sd.groundstate_kron(
            m, lanc_m=30, cycles=6, target_residual=1e-4)
        m64 = sd.xxz_chain(L, Jxy=1.0, Jz=1.0, nup=L // 2, dtype=jnp.float64)
        E64, _, _ = sd.lanczos_groundstate(sd.matvec_fn(m64), m64.n_states,
                                           lanc_m=80, dtype=jnp.float64)
        assert E0 == pytest.approx(E64, abs=2e-4)
        assert info["residual"] < 1e-4


class TestBf16Physics:
    def test_kpm_dos_bf16_vs_f32(self):
        """Solver-level bf16 amplitude check (VERDICT r2 item 8): Jackson-
        damped KPM local-DOS moments computed with a bf16 BlockVec recurrence
        through the fused kernel match the f32 recurrence within the f32
        tolerance band (reference observable tolerance atol 1e-3 — BASELINE.md,
        ref test/runtests.jl:130)."""
        import spindynamics_tpu as sd
        from spindynamics_tpu.ops.pallas_kron import apply_H_sector_kron_fused
        from spindynamics_tpu.ops.sector_kron import (
            flat_to_blocks, make_sector_kron_layout)
        from spindynamics_tpu.solvers.blockvec import BlockVec
        from spindynamics_tpu.solvers.chebyshev import (
            chebyshev_moments, jackson_kernel, kpm_reconstruct)

        L, M = 12, 24
        m = sd.xxz_chain(L, Jxy=1.0, Jz=1.0, nup=L // 2, dtype=jnp.float64,
                         layout="sector_kron")
        lay = make_sector_kron_layout(m, m.kron_splits)
        rng = np.random.default_rng(3)
        v = rng.standard_normal(lay.n_states)
        v = np.where(np.asarray(m.valid_mask()), v, 0.0)
        v /= np.linalg.norm(v)
        a, b = float(L) * 0.75, 0.0  # safe spectral half-width for XXZ

        def mv_rescaled(bv):
            w = BlockVec(apply_H_sector_kron_fused(bv.leaves, lay))
            return (w - b * bv) * (1.0 / a)

        blocks = flat_to_blocks(jnp.asarray(v, jnp.float32), lay)
        mu32 = np.asarray(chebyshev_moments(
            mv_rescaled, BlockVec(blocks), M))
        mubf = np.asarray(chebyshev_moments(
            mv_rescaled, BlockVec([x.astype(jnp.bfloat16) for x in blocks]),
            M).astype(jnp.float32))
        g = jackson_kernel(M)
        # damped moments drive every downstream observable; compare there
        dmax = np.abs(g * (mubf - mu32)).max()
        assert dmax < 5e-3, dmax
        # and the reconstructed DOS curves agree pointwise
        x = np.linspace(-0.95, 0.95, 101) * a
        d32 = np.asarray(kpm_reconstruct(jnp.asarray(mu32), jnp.asarray(x),
                                         a, b))
        dbf = np.asarray(kpm_reconstruct(jnp.asarray(mubf, np.float32),
                                         jnp.asarray(x), a, b))
        assert np.abs(d32 - dbf).max() < 5e-3 * max(1.0, np.abs(d32).max())


class TestKpmSqwKron:
    def test_matches_planes_path(self):
        """kpm_sqw_kron (BlockVec moments through the fused kernel) vs the
        flat planes path (solvers/planes.kpm_sqw_planes) on the same model,
        ground state and bounds — the spectra must agree to f32 recurrence
        tolerance. Parity target: kpm_sqw, ref src/KPM_Sqw.jl:172."""
        import spindynamics_tpu as sd
        from spindynamics_tpu.ops.sector_kron import blocks_to_flat
        from spindynamics_tpu.solvers.planes import kpm_sqw_planes

        L, M = 10, 32
        m = sd.xxz_chain(L, Jxy=1.0, Jz=1.0, nup=L // 2, dtype=jnp.float32,
                         layout="sector_kron")
        E0, psi_bv, info, lay = sd.groundstate_kron(
            m, lanc_m=30, cycles=4, target_residual=1e-5)
        qs = [2 * np.pi * k / L for k in range(1, 4)]
        omega = np.linspace(0.0, 4.0, 40)
        lo, hi = -8.0, 8.0
        S_kron, inf = sd.kpm_sqw_kron(
            m, qs, omega, kpm_m=M, psi0=psi_bv, E0=E0, info=info,
            bounds=(lo, hi))
        flat = blocks_to_flat(psi_bv.leaves, lay)
        planes = jnp.stack([flat, jnp.zeros_like(flat)])
        a, b = (hi - lo) / 2.0, (hi + lo) / 2.0
        S_pl = kpm_sqw_planes(planes, m, qs, omega, a, b, kpm_m=M, E0=E0)
        scale = max(float(np.abs(S_pl).max()), 1e-9)
        assert np.abs(np.asarray(S_kron) - np.asarray(S_pl)).max() < 2e-3 * scale
        assert np.all(np.isfinite(S_kron)) and S_kron.min() >= 0.0


class TestFusedAxpy:
    def test_axpy_seed_matches_separate(self):
        """apply_H_sector_kron_fused(axpy=(s, psi0)) == H psi + s psi0 (the
        seeded Lanczos recurrence form; memory shape of the L=32 fix)."""
        import spindynamics_tpu as sd
        from spindynamics_tpu.ops.pallas_kron import apply_H_sector_kron_fused
        from spindynamics_tpu.ops.sector_kron import (
            flat_to_blocks, make_sector_kron_layout)

        L = 12
        m = sd.xxz_chain(L, Jxy=1.0, Jz=0.7, h=np.linspace(-0.1, 0.2, L),
                         nup=L // 2, dtype=jnp.float64, layout="sector_kron")
        lay = make_sector_kron_layout(m, m.kron_splits)
        rng = np.random.default_rng(5)
        x = jnp.where(m.valid_mask(),
                      jnp.asarray(rng.standard_normal(lay.n_states)), 0.0)
        y0 = jnp.where(m.valid_mask(),
                       jnp.asarray(rng.standard_normal(lay.n_states)), 0.0)
        bx = flat_to_blocks(x.astype(jnp.float32), lay)
        b0 = flat_to_blocks(y0.astype(jnp.float32), lay)
        s = jnp.float32(-0.37)
        got = apply_H_sector_kron_fused(bx, lay, axpy=(s, b0))
        base = apply_H_sector_kron_fused(bx, lay)
        want = [h + s * z for h, z in zip(base, b0)]
        scale = max(float(jnp.max(jnp.abs(w))) for w in want)
        err = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(got, want))
        assert err < 2e-6 * scale

    def test_groundstate_kron_seeded_recurrence(self):
        """groundstate_kron (now axpy-seeded) still matches the x64 oracle."""
        import spindynamics_tpu as sd

        L = 12
        m = sd.xxz_chain(L, Jxy=1.0, Jz=1.0, nup=L // 2, dtype=jnp.float32,
                         layout="sector_kron")
        E0, psi, info, lay = sd.groundstate_kron(
            m, lanc_m=30, cycles=6, target_residual=1e-4)
        m64 = sd.xxz_chain(L, Jxy=1.0, Jz=1.0, nup=L // 2, dtype=jnp.float64)
        E64, _, _ = sd.lanczos_groundstate(sd.matvec_fn(m64), m64.n_states,
                                           lanc_m=80, dtype=jnp.float64)
        assert E0 == pytest.approx(E64, abs=2e-4)
        assert info["residual"] < 1e-4
