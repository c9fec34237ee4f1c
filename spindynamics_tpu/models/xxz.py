"""Convenience builders for the model families exercised by the reference examples.

The reference drives everything through XXZ-type chains
(examples/example.jl:10-24, examples/example_kpmSqw.jl:11-25,
examples/example_lanczosSqw.jl:11-25); these builders package those setups.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..model import SpinModel, build_model, long_range_hopping, nn_hopping

__all__ = ["xxz_chain", "heisenberg_chain", "xy_chain", "long_range_xy_chain"]


def xxz_chain(
    L: int,
    Jxy: float = 1.0,
    Jz: float = 0.5,
    h=None,
    nup: int | None = None,
    dtype=jnp.float32,
    **kwargs,
) -> SpinModel:
    """Open XXZ chain: H = sum_i Jxy (S+_i S-_{i+1} + h.c.) + Jz Sz_i Sz_{i+1} + sum h_i Sz_i."""
    hopping = nn_hopping(L, Jxy)
    zz = [(i, i + 1, float(Jz)) for i in range(L - 1)]
    return build_model(
        L, nup=nup, hopping=hopping, onsite_field=h, zz=zz, dtype=dtype, **kwargs
    )


def heisenberg_chain(L: int, J: float = 1.0, nup: int | None = None, **kwargs) -> SpinModel:
    """Isotropic Heisenberg chain (Jxy = Jz = J), as in examples/example_kpmSqw.jl:13."""
    return xxz_chain(L, Jxy=J, Jz=J, nup=nup, **kwargs)


def xy_chain(L: int, Jxy: float = 1.0, nup: int | None = None, **kwargs) -> SpinModel:
    """XY chain (Jz = 0)."""
    return xxz_chain(L, Jxy=Jxy, Jz=0.0, nup=nup, **kwargs)


def long_range_xy_chain(
    L: int, J, nup: int | None = None, dtype=jnp.float32, **kwargs
) -> SpinModel:
    """All-pairs hopping with user J(i, j) (ref: src/SpinModel.jl:44-46)."""
    return build_model(
        L, nup=nup, hopping=long_range_hopping(L, J), dtype=dtype, **kwargs
    )
