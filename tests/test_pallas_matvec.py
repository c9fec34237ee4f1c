"""Fused Pallas matvec kernel vs dense oracle (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from spindynamics_tpu import build_dense_H, xxz_chain
from spindynamics_tpu.ops.blocked import make_blocked_plan
from spindynamics_tpu.ops.pallas_matvec import apply_H_pallas, pallas_supported


@pytest.mark.parametrize("L,w,t", [(8, 2, 3), (10, 3, 3), (12, 4, 4)])
def test_pallas_matches_dense(L, w, t, rng):
    m = xxz_chain(L, Jxy=1.0, Jz=0.4, h=rng.normal(size=L) * 0.1, nup=None,
                  dtype=jnp.float64, build_neighbor_table=False)
    plan = make_blocked_plan(m, w, t)
    assert pallas_supported(m, plan)
    H = build_dense_H(m)
    psi = rng.normal(size=m.n_states)
    want = H @ psi
    got = np.asarray(
        apply_H_pallas(jnp.asarray(psi, jnp.float32), m, plan, interpret=True)
    )
    # split-2/split-3 in-kernel dots are f32-grade (~2^-17 per bf16 half, a
    # few products deep => ~1e-5 rel), NOT bf16-grade (2.4e-3): assert well
    # below the bf16 truncation floor
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 3e-5 * scale


def test_pallas_complex(rng):
    m = xxz_chain(9, Jxy=1.0, Jz=0.3, nup=None, dtype=jnp.float64,
                  build_neighbor_table=False)
    plan = make_blocked_plan(m, 3, 3)
    H = build_dense_H(m)
    psi = rng.normal(size=m.n_states) + 1j * rng.normal(size=m.n_states)
    want = H @ psi
    got = np.asarray(
        apply_H_pallas(jnp.asarray(psi, jnp.complex64), m, plan, interpret=True)
    )
    assert np.abs(got - want).max() < 1e-4


def test_pallas_long_range(rng):
    """Long-range bonds: cut-bond permutations run as one-hot matmuls."""
    from spindynamics_tpu import long_range_xy_chain

    m = long_range_xy_chain(8, lambda i, j: 1.0 / (j - i), nup=None,
                            dtype=jnp.float64, build_neighbor_table=False)
    plan = make_blocked_plan(m, 3, 3)
    assert pallas_supported(m, plan)
    H = build_dense_H(m)
    psi = rng.normal(size=m.n_states)
    got = np.asarray(
        apply_H_pallas(jnp.asarray(psi, jnp.float32), m, plan, interpret=True)
    )
    assert np.abs(got - H @ psi).max() < 1e-4


def test_exact_J_two_pass_matches_oracle():
    """exact_J (bf16-exact couplings, e.g. J = 1.0) drops the local dots to
    2 MXU passes — numerics must stay f32-grade vs the x64 dense oracle."""
    import spindynamics_tpu as sd
    from spindynamics_tpu.ops.pallas_matvec import (
        _concrete_exact_J, apply_H_pallas)

    L = 14
    m = sd.xxz_chain(L, Jxy=1.0, Jz=0.5, nup=L // 2, dtype=jnp.float32,
                     layout="embedded")
    assert _concrete_exact_J(m.hop_J)
    m64 = sd.xxz_chain(L, Jxy=1.0, Jz=0.5, nup=L // 2, dtype=jnp.float64,
                       layout="embedded")
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal(m.n_states), jnp.float32)
    x = jnp.where(m.valid_mask(), x, 0.0)
    y_ref = sd.apply_H(x.astype(jnp.float64), m64, backend="blocked")
    y = apply_H_pallas(x, m, exact_J=True)
    scale = float(jnp.max(jnp.abs(y_ref)))
    np.testing.assert_allclose(np.asarray(y, np.float64), np.asarray(y_ref),
                               rtol=0, atol=1e-5 * scale)
    # non-exact couplings must NOT be treated as exact by autodetection
    m2 = sd.xxz_chain(L, Jxy=1.1, Jz=0.5, nup=L // 2, dtype=jnp.float32,
                      layout="embedded")
    assert not _concrete_exact_J(m2.hop_J)


def test_hold_elision_structure_and_correctness():
    """Holdable specials (adjacent block-bit bonds) keep exact results: the
    held (stale) partner blocks are masked to zero in-kernel."""
    import spindynamics_tpu as sd
    from spindynamics_tpu.ops.blocked import make_blocked_plan
    from spindynamics_tpu.ops.pallas_matvec import (
        _holdable, apply_H_pallas, pallas_pass_count)

    L = 16
    m = sd.xxz_chain(L, Jxy=1.0, Jz=0.5, nup=L // 2, dtype=jnp.float32,
                     layout="embedded")
    # force small tiles so several specials land on adjacent block bits
    plan = make_blocked_plan(m, w=4, t=4)
    holds = [_holdable(s[1], s[2], s[3]) for s in plan.special]
    assert sum(1 for h in holds if h >= 0) >= 3
    assert pallas_pass_count(plan) < 2 + sum(
        1 for s in plan.special if s[3] != 0) + 1
    m64 = sd.xxz_chain(L, Jxy=1.0, Jz=0.5, nup=L // 2, dtype=jnp.float64,
                       layout="embedded")
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal(m.n_states), jnp.float32)
    x = jnp.where(m.valid_mask(), x, 0.0)
    y_ref = sd.apply_H(x.astype(jnp.float64), m64, backend="blocked")
    y = apply_H_pallas(x, m, plan=plan)
    scale = float(jnp.max(jnp.abs(y_ref)))
    np.testing.assert_allclose(np.asarray(y, np.float64), np.asarray(y_ref),
                               rtol=0, atol=1e-5 * scale)
