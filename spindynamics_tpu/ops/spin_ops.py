"""Single-site spin operators and S^z_q vectors (parity with src/Hamiltonian.jl:49-115, 218-234).

The reference builds closures doing per-state Dict lookups
(`create_spin_operator`, src/Hamiltonian.jl:49-115). Here operators are
vectorized jit-compatible functions:

  - S^z is diagonal: elementwise multiply with (bit - 1/2).
  - S^+/S^-/S^x/S^y flip one bit. In full mode the target index is `idx XOR 2^site`
    (a single axis-flip of the rank-L tensor view — no gather). In sector mode a
    single flip leaves the U(1) sector, so the projection back onto the basis is
    identically zero — the same semantics the reference's `haskey` check produces
    (src/Hamiltonian.jl:62-64).

`sz_q_vector` fixes the reference's data race (threads accumulating into one
shared vector at src/Hamiltonian.jl:228-231, SURVEY.md §2.4-2): S^z_q is diagonal,
so phi = w_q * psi with a per-state complex weight w_q[n] = L^{-1/2} sum_r e^{iqr} sz_r(n).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..model import SpinModel

__all__ = ["apply_spin_operator", "make_spin_operator", "sz_q_weights", "sz_q_vector"]


def _sz_diag(model: SpinModel, site: int, dtype):
    bits = ((model.basis_states() >> np.uint32(site)) & np.uint32(1)).astype(dtype)
    return bits - jnp.asarray(0.5, dtype)


def _flip_full(psi: jax.Array, L: int, site: int) -> jax.Array:
    """psi[idx XOR 2^site] via a single axis flip of the (2,)*L tensor view."""
    axis = L - 1 - site
    return jnp.flip(psi.reshape((2,) * L), axis=axis).reshape(-1)


def apply_spin_operator(
    psi: jax.Array, model: SpinModel, site: int, kind: str
) -> jax.Array:
    """Apply S^{kind}_site to psi. kind in {'z','plus','minus','x','y'}.

    Semantics match ref src/Hamiltonian.jl:49-115 (note: S^z eigenvalues +-1/2,
    S^+/S^- amplitudes 1, S^x amplitude 1/2, S^y amplitudes -+ i/2)."""
    if not 0 <= site < model.L:
        raise ValueError(f"site {site} out of range [0, {model.L})")
    if kind not in ("z", "plus", "minus", "x", "y"):
        raise ValueError(f"unknown operator kind {kind!r}")
    rdtype = psi.real.dtype if jnp.iscomplexobj(psi) else psi.dtype
    bits = ((model.basis_states() >> np.uint32(site)) & np.uint32(1)).astype(rdtype)

    if kind == "z":
        return psi * (bits - jnp.asarray(0.5, rdtype))

    if model.mode == "sector":
        # Single-bit flip leaves the nup sector; projection onto the basis is 0
        # (reference haskey-miss semantics, src/Hamiltonian.jl:62-64).
        if kind == "y":
            return jnp.zeros_like(psi, dtype=jnp.result_type(psi.dtype, jnp.complex64))
        return jnp.zeros_like(psi)

    flipped = _flip_full(psi, model.L, site)
    flipped_bits_here = bits  # bit of the *destination* state at `site`
    if kind == "plus":
        # out[k] = psi[k ^ m] when bit_site(k) == 1 (source had 0)
        return flipped * flipped_bits_here
    if kind == "minus":
        return flipped * (1 - flipped_bits_here)
    if kind == "x":
        return flipped * jnp.asarray(0.5, rdtype)
    if kind == "y":
        # S^y = (S+ - S-)/(2i): out[k] = -i/2 psi[k^m] if bit(k)=1 else +i/2 psi[k^m]
        sign = jnp.asarray(1.0, rdtype) - 2.0 * flipped_bits_here  # +1 if bit==0
        cdtype = jnp.result_type(psi.dtype, jnp.complex64)
        return (flipped * sign).astype(cdtype) * jnp.asarray(0.5j, cdtype)
    raise ValueError(f"unknown operator kind {kind!r}")


def make_spin_operator(site: int, kind: str):
    """Closure factory mirroring ref `create_spin_operator` (src/Hamiltonian.jl:49)."""
    def op(psi, model):
        return apply_spin_operator(psi, model, site, kind)

    return op


def sz_q_weights(model: SpinModel, q, dtype=jnp.complex64) -> jax.Array:
    """Per-state diagonal weight of S^z_q = L^{-1/2} sum_r e^{iqr} S^z_r.

    Race-free replacement for ref src/Hamiltonian.jl:218-234 (`Sz_q_vector`)."""
    from ..utils.dtypes import real_dtype

    rdtype = real_dtype(dtype)
    L = model.L
    q = jnp.asarray(q, rdtype)
    r = jnp.arange(L, dtype=rdtype)
    phases = jnp.exp(1j * q * r).astype(dtype)  # [L]
    # bits[n, r] built per-site to avoid materializing N x L at large N:
    w = jnp.zeros(model.n_states, dtype=dtype)
    for site in range(L):
        sz = _sz_diag(model, site, rdtype)
        w = w + phases[site] * sz.astype(dtype)
    return w / jnp.sqrt(jnp.asarray(L, rdtype)).astype(dtype)


def sz_q_vector(model: SpinModel, psi: jax.Array, q, dtype=jnp.complex64) -> jax.Array:
    """phi = S^z_q |psi> (diagonal multiply; ref: src/Hamiltonian.jl:218-234)."""
    return sz_q_weights(model, q, dtype) * psi.astype(dtype)
