"""Matvec correctness oracles.

Key oracle: sector-vs-full embedding consistency at 1e-12 (the legacy reference
test at test/runtests.jl:52-91, called out by SURVEY.md §4 as the single most
valuable check for any Hamiltonian kernel rewrite), plus dense-matrix
cross-validation of every backend and Hermiticity/symmetry checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spindynamics_tpu import (
    apply_H,
    apply_H_dense,
    apply_rescaled_H,
    build_dense_H,
    build_model,
    nn_hopping,
    xxz_chain,
)


def dense_reference(model):
    return build_dense_H(model)


@pytest.mark.parametrize("mode", ["full", "sector"])
def test_backends_match_dense(mode, rng):
    L = 6
    nup = 3 if mode == "sector" else None
    h = rng.normal(size=L) * 0.3
    m = xxz_chain(L, Jxy=1.0, Jz=0.5, h=h, nup=nup, dtype=jnp.float64,
                  build_neighbor_table=True)
    H = dense_reference(m)
    # Hermitian (real symmetric)
    assert np.allclose(H, H.T, atol=1e-12)

    psi = rng.normal(size=m.n_states) + 1j * rng.normal(size=m.n_states)
    psi = jnp.asarray(psi)
    want = H @ np.asarray(psi)

    out_ell = apply_H(psi, m, backend="ell")
    assert np.allclose(np.asarray(out_ell), want, atol=1e-10)

    if mode == "full":
        out_tensor = apply_H(psi, m, backend="tensor")
        assert np.allclose(np.asarray(out_tensor), want, atol=1e-10)

    out_dense = apply_H_dense(psi, jnp.asarray(H))
    assert np.allclose(np.asarray(out_dense), want, atol=1e-10)


def test_sector_vs_full_embedding(rng):
    """Embed a sector vector into the full space, apply full H, compare
    elementwise to the sector apply at 1e-12 (ref test/runtests.jl:52-91)."""
    L, nup = 6, 3
    h = rng.normal(size=L) * 0.2
    m_sec = xxz_chain(L, Jxy=1.0, Jz=0.5, h=h, nup=nup, dtype=jnp.float64)
    m_full = xxz_chain(L, Jxy=1.0, Jz=0.5, h=h, nup=None, dtype=jnp.float64)

    psi_sec = jnp.asarray(rng.normal(size=m_sec.n_states))
    states = np.asarray(m_sec.states)
    psi_full = np.zeros(m_full.n_states)
    psi_full[states] = np.asarray(psi_sec)

    out_full = np.asarray(apply_H(jnp.asarray(psi_full), m_full, backend="tensor"))
    out_sec = np.asarray(apply_H(psi_sec, m_sec, backend="ell"))

    # full-space result must live entirely inside the sector...
    outside = np.ones(m_full.n_states, dtype=bool)
    outside[states] = False
    assert np.allclose(out_full[outside], 0.0, atol=1e-12)
    # ...and agree elementwise with the sector apply
    assert np.allclose(out_full[states], out_sec, atol=1e-12)


def test_apply_rescaled(rng):
    m = xxz_chain(5, nup=2, dtype=jnp.float64)
    psi = jnp.asarray(rng.normal(size=m.n_states))
    a, b = 2.5, -0.7
    want = (np.asarray(apply_H(psi, m)) - b * np.asarray(psi)) / a
    got = np.asarray(apply_rescaled_H(psi, m, a, b))
    assert np.allclose(got, want, atol=1e-12)


def test_zero_coupling_edge_cases(rng):
    # field-only model: H is diagonal
    L = 4
    h = [0.5, -0.5, 0.25, 0.1]
    m = build_model(L, nup=2, onsite_field=h, dtype=jnp.float64)
    psi = jnp.asarray(rng.normal(size=m.n_states))
    out = np.asarray(apply_H(psi, m, backend="ell")) if m.nbr is not None else None
    # no hopping -> nbr table may be absent; diagonal only
    got = np.asarray(apply_H(psi, m)) if out is None else out
    assert np.allclose(got, np.asarray(m.diag) * np.asarray(psi), atol=1e-12)


def test_matvec_under_jit_and_vmap(rng):
    m = xxz_chain(6, nup=3, dtype=jnp.float64)
    H = dense_reference(m)
    psis = rng.normal(size=(4, m.n_states))
    f = jax.jit(lambda p: apply_H(p, m, backend="ell"))
    single = np.stack([np.asarray(f(jnp.asarray(p))) for p in psis])
    batched = np.asarray(jax.vmap(f)(jnp.asarray(psis)))
    assert np.allclose(batched, single, atol=1e-12)
    assert np.allclose(batched, psis @ H.T, atol=1e-10)


def test_backend_fuzz_random_bond_sets(rng):
    """Property fuzz: random bond sets / couplings / fields — all backends agree
    with the dense oracle."""
    import itertools

    for trial in range(6):
        L = int(rng.integers(5, 11))
        pairs = list(itertools.combinations(range(L), 2))
        rng.shuffle(pairs)
        nb = int(rng.integers(1, min(len(pairs), 8) + 1))
        hopping = [(i, j, float(rng.normal())) for (i, j) in pairs[:nb]]
        zz = [(i, j, float(rng.normal())) for (i, j) in pairs[: nb // 2]]
        h = rng.normal(size=L) * 0.5
        from spindynamics_tpu import build_model

        m = build_model(L, hopping=hopping, onsite_field=h, zz=zz,
                        dtype=jnp.float64, build_neighbor_table=True)
        H = build_dense_H(m)
        psi = jnp.asarray(rng.normal(size=m.n_states))
        want = H @ np.asarray(psi)
        for backend in ("ell", "tensor", "blocked"):
            got = np.asarray(apply_H(psi, m, backend=backend))
            assert np.allclose(got, want, atol=1e-9), (trial, backend)
