"""ctypes loader for the optional native (C++/OpenMP) basis/table builders.

The hot *compute* path is JAX/XLA/Pallas on TPU; this native library accelerates
the host-side setup work (sector enumeration and ELL neighbor-table construction),
which at L>=28 (N ~ 4e7..6e8 states) would otherwise dominate wall-clock in numpy.

Build: `make -C csrc` produces `csrc/libspindyn.so`. All entry points degrade
gracefully (return None) when the library is missing.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    candidates = [
        os.path.join(here, "csrc", "libspindyn.so"),
        os.path.join(os.path.dirname(__file__), "libspindyn.so"),
    ]
    for path in candidates:
        if os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
                lib.sd_sector_basis.restype = ctypes.c_longlong
                lib.sd_sector_basis.argtypes = [
                    ctypes.c_int,
                    ctypes.c_int,
                    ctypes.POINTER(ctypes.c_uint32),
                ]
                lib.sd_ell_table.restype = ctypes.c_int
                lib.sd_ell_table.argtypes = [
                    ctypes.POINTER(ctypes.c_uint32),  # states
                    ctypes.c_longlong,  # N
                    ctypes.c_int,  # L
                    ctypes.c_int,  # nup
                    ctypes.POINTER(ctypes.c_int32),  # hop_i
                    ctypes.POINTER(ctypes.c_int32),  # hop_j
                    ctypes.c_int,  # n_bonds
                    ctypes.POINTER(ctypes.c_int32),  # out nbr [N, nb]
                ]
                _LIB = lib
                break
            except OSError:
                continue
    return _LIB


def native_available() -> bool:
    return _load() is not None


def native_sector_basis(L: int, nup: int) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    import math

    N = math.comb(L, nup)
    out = np.empty(N, dtype=np.uint32)
    got = lib.sd_sector_basis(
        L, nup, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))
    )
    if got != N:
        return None
    return out


def native_ell_table(
    states: np.ndarray, hop_i: np.ndarray, hop_j: np.ndarray
) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    states = np.ascontiguousarray(states, dtype=np.uint32)
    hop_i = np.ascontiguousarray(hop_i, dtype=np.int32)
    hop_j = np.ascontiguousarray(hop_j, dtype=np.int32)
    N = states.shape[0]
    nb = hop_i.shape[0]
    # L and nup recovered from the states themselves.
    L = int(states.max()).bit_length() if N > 1 else 1
    nup = int(bin(int(states[0])).count("1"))
    nbr = np.empty((N, nb), dtype=np.int32)
    ok = lib.sd_ell_table(
        states.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        N,
        L,
        nup,
        hop_i.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        hop_j.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        nb,
        nbr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if ok != 0:
        return None
    return nbr
