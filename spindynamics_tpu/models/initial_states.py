"""Product-state constructors (capability parity with src/InitialStates.jl).

API fix vs the reference (SURVEY.md §2.4-8): the reference returns a one-hot
vector in sector mode but a raw UInt64 bitstring in full mode
(src/InitialStates.jl:9-28). Here every `*_state` constructor uniformly returns
a (device) state VECTOR in the model's basis; the encoded bitstring is available
separately via the `*_bitstring` helpers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import basis as basis_mod
from ..model import SpinModel

__all__ = [
    "domain_wall_state",
    "neel_state",
    "polarized_state",
    "polarized_state_with_flips",
    "domain_wall_bitstring",
    "neel_bitstring",
    "polarized_bitstring",
    "basis_state_vector",
    "state_index",
]


def domain_wall_bitstring(model: SpinModel) -> int:
    """First nup sites up, rest down (ref: src/InitialStates.jl:9-28).
    Full mode uses nup = ceil(L/2) as the reference does (src/InitialStates.jl:23)."""
    nup = model.nup if model.nup is not None else -(-model.L // 2)
    return (1 << nup) - 1


def neel_bitstring(model: SpinModel) -> int:
    """Up at even sites 0,2,4,... (ref sites 1,3,5,... 1-based; src/InitialStates.jl:34-54)."""
    s = 0
    for i in range(0, model.L, 2):
        s |= 1 << i
    return s


def polarized_bitstring(model: SpinModel, up: bool = True) -> int:
    return ((1 << model.L) - 1) if up else 0


def state_index(model: SpinModel, bitstring: int) -> int:
    """Basis index of an encoded bitstring (combinadic rank; replaces Dict lookup)."""
    if model.mode in ("full", "embedded"):
        if model.mode == "embedded" and bin(bitstring).count("1") != model.nup:
            raise ValueError(
                f"state {bitstring:#x} has wrong magnetization for embedded sector"
                f" nup={model.nup}"
            )
        return int(bitstring)
    if bin(bitstring).count("1") != model.nup:
        raise ValueError(
            f"state {bitstring:#x} has wrong magnetization for sector nup={model.nup}"
        )
    if model.kron_splits is not None:
        from ..ops.sector_kron import DEFAULT_PADS, kron_rank

        return kron_rank(bitstring, model.L, model.nup, model.kron_splits,
                         model.kron_pads or DEFAULT_PADS)
    if model.lo_bits is not None:
        from ..ops.sector_blocked import blocked_rank

        return blocked_rank(bitstring, model.L, model.nup, model.lo_bits)
    return basis_mod.rank_state(bitstring, model.L, model.nup)


def basis_state_vector(model: SpinModel, bitstring: int, dtype=None) -> jax.Array:
    """One-hot state vector |bitstring> in the model's basis."""
    if dtype is None:
        dtype = model.dtype
    idx = state_index(model, bitstring)
    return jnp.zeros(model.n_states, dtype=dtype).at[idx].set(1)


def domain_wall_state(model: SpinModel, dtype=None) -> jax.Array:
    """|up...up down...down> (ref: src/InitialStates.jl:9-28)."""
    return basis_state_vector(model, domain_wall_bitstring(model), dtype)


def neel_state(model: SpinModel, dtype=None) -> jax.Array:
    """|up down up down ...> (ref: src/InitialStates.jl:34-54)."""
    return basis_state_vector(model, neel_bitstring(model), dtype)


def polarized_state(model: SpinModel, up: bool = True, dtype=None) -> jax.Array:
    """All spins aligned (ref: src/InitialStates.jl:61-85; raises if the state is
    not in the sector, matching ref :74-77)."""
    return basis_state_vector(model, polarized_bitstring(model, up), dtype)


def polarized_state_with_flips(
    model: SpinModel, flips, dtype=None
) -> jax.Array:
    """All-up with the given (0-based) sites flipped (ref: src/InitialStates.jl:93-110)."""
    s = (1 << model.L) - 1
    for i in flips:
        if not 0 <= i < model.L:
            raise ValueError(f"flip site {i} out of range")
        s ^= 1 << i
    return basis_state_vector(model, s, dtype)
