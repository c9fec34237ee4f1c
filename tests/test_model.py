"""Model construction (oracles: ref test/test_SpinModel.jl)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from spindynamics_tpu import (
    build_model,
    long_range_hopping,
    nn_hopping,
    xxz_chain,
)


def test_full_model_dimension():
    m = build_model(4, hopping=nn_hopping(4, 1.0))
    assert m.mode == "full"
    assert m.n_states == 16  # ref test/test_SpinModel.jl:20


def test_sector_model_dimension():
    m = build_model(6, nup=3, hopping=nn_hopping(6, 1.0))
    assert m.mode == "sector"
    assert m.n_states == math.comb(6, 3)


def test_nn_hopping():
    # ref test/test_SpinModel.jl:30-32
    hops = nn_hopping(5, 0.7)
    assert len(hops) == 4
    assert hops[0] == (0, 1, 0.7)
    assert hops[-1] == (3, 4, 0.7)


def test_long_range_hopping():
    # ref test/test_SpinModel.jl:35-38 — count L(L-1)/2 and J(i,j) values
    L = 5
    hops = long_range_hopping(L, lambda i, j: 1.0 / (j - i))
    assert len(hops) == L * (L - 1) // 2
    for (i, j, J) in hops:
        assert i < j
        assert J == pytest.approx(1.0 / (j - i))


def test_couplings_stored_verbatim():
    # ref test/test_SpinModel.jl:44-47
    h = [0.1, -0.2, 0.3, 0.0]
    zz = [(0, 2, 0.5), (1, 3, -0.25)]
    m = build_model(4, nup=2, hopping=[(0, 1, 1.5)], onsite_field=h, zz=zz,
                    dtype=jnp.float64)
    assert np.allclose(np.asarray(m.field), h)
    assert np.asarray(m.hop_i).tolist() == [0]
    assert np.asarray(m.hop_j).tolist() == [1]
    assert np.allclose(np.asarray(m.hop_J), [1.5])
    assert np.asarray(m.zz_i).tolist() == [0, 1]
    assert np.allclose(np.asarray(m.zz_J), [0.5, -0.25])


def test_precomputed_diagonal():
    # diag must equal sum_i h_i sz_i + sum Jz sz_i sz_j state-by-state
    L = 5
    h = [0.3, -0.1, 0.7, 0.2, -0.4]
    zz = [(i, i + 1, 0.8) for i in range(L - 1)]
    m = build_model(L, nup=2, onsite_field=h, zz=zz, dtype=jnp.float64)
    states = np.asarray(m.states)
    expected = np.zeros(states.shape[0])
    for n, s in enumerate(states):
        sz = [(int(s) >> i & 1) - 0.5 for i in range(L)]
        expected[n] = sum(h[i] * sz[i] for i in range(L)) + sum(
            0.8 * sz[i] * sz[i + 1] for i in range(L - 1)
        )
    assert np.allclose(np.asarray(m.diag), expected, atol=1e-12)


def test_ell_table_consistency():
    L, nup = 6, 3
    m = xxz_chain(L, nup=nup, dtype=jnp.float64)
    states = np.asarray(m.states)
    nbr = np.asarray(m.nbr)
    hop_i = np.asarray(m.hop_i)
    hop_j = np.asarray(m.hop_j)
    for n, s in enumerate(states):
        for b in range(len(hop_i)):
            i, j = int(hop_i[b]), int(hop_j[b])
            differ = ((s >> i) ^ (s >> j)) & 1
            if differ:
                flipped = int(s) ^ ((1 << i) | (1 << j))
                target = int(np.searchsorted(states, flipped))
                assert nbr[n, b] == target
                # symmetry: the reverse entry points back
                assert nbr[target, b] == n
            else:
                assert nbr[n, b] == -1


def test_model_is_pytree():
    import jax

    m = xxz_chain(4, nup=2)
    leaves = jax.tree_util.tree_leaves(m)
    assert len(leaves) > 0
    m2 = jax.tree_util.tree_map(lambda x: x, m)
    assert m2.L == m.L and m2.mode == m.mode
