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
