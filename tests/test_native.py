"""Native C++ basis builders vs numpy reference (skipped if csrc not built)."""

import numpy as np
import pytest

from spindynamics_tpu.basis import _sector_states_cached
from spindynamics_tpu.model import _build_ell_table
from spindynamics_tpu.utils.native import (
    native_available,
    native_ell_table,
    native_sector_basis,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="csrc/libspindyn.so not built"
)


@pytest.mark.parametrize("L,nup", [(8, 4), (12, 5), (16, 8), (18, 9)])
def test_native_sector_basis(L, nup):
    got = native_sector_basis(L, nup)
    want = _sector_states_cached(L, nup)
    assert np.array_equal(got, want)


def test_native_ell_table():
    states = _sector_states_cached(12, 6)
    hop_i = np.arange(11, dtype=np.int32)
    hop_j = hop_i + 1
    got = native_ell_table(states, hop_i, hop_j)
    want = _build_ell_table(states, hop_i, hop_j)
    assert np.array_equal(got, want)


def test_native_ell_long_range():
    states = _sector_states_cached(10, 5)
    pairs = [(i, j) for i in range(10) for j in range(i + 1, 10)]
    hop_i = np.asarray([p[0] for p in pairs], np.int32)
    hop_j = np.asarray([p[1] for p in pairs], np.int32)
    got = native_ell_table(states, hop_i, hop_j)
    want = _build_ell_table(states, hop_i, hop_j)
    assert np.array_equal(got, want)
