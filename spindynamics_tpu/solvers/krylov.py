"""Krylov (Lanczos) time evolution, real and imaginary time.

Capability parity with src/TimeEvolution/Krylov.jl (:55-192) and the
imaginary-time propagator from the reference's dead QuantumTypicality module
(src/TimeEvolution/QuantumTypicality.jl:154-211), reimplemented cleanly.

Design: one jit region runs the Lanczos build as a lax.scan storing the m Krylov
vectors (m ~ 30, so the [m, N] stack is small), exponentiates the tiny
tridiagonal with jnp.linalg.eigh on-device, and reconstructs
psi_t = V^T (Q f(D) Q^H ||psi|| e_1). Breakdown needs no special casing: masked
steps emit beta = 0 and v = 0, block-decoupling the tridiagonal; the decoupled
eigenvectors have zero overlap with e_1 so they contribute nothing.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = [
    "krylov_time_evolve",
    "krylov_expm_multiply",
    "krylov_imaginary_time_evolve",
]


def _real_dtype(dtype):
    from ..utils.dtypes import real_dtype

    return real_dtype(dtype)


@partial(jax.jit, static_argnums=(0, 2))
def _krylov_factorize(matvec: Callable, psi: jax.Array, m: int):
    """Lanczos build with stored basis: returns (V [m,N], alphas [m], betas [m-1], norm0)."""
    dtype = psi.dtype
    rdtype = _real_dtype(dtype)
    norm0 = jnp.linalg.norm(psi).astype(rdtype)
    inv0 = jnp.where(norm0 > 0, 1.0 / jnp.maximum(norm0, jnp.finfo(rdtype).tiny), 0.0)
    v1 = psi * inv0.astype(dtype)

    def step(carry, _):
        v_prev, v_curr, beta_prev = carry
        w = matvec(v_curr)
        alpha = jnp.real(jnp.vdot(v_curr, w))
        w = w - alpha.astype(dtype) * v_curr - beta_prev.astype(dtype) * v_prev
        beta = jnp.linalg.norm(w).astype(rdtype)
        inv = jnp.where(
            beta > 1e-14, 1.0 / jnp.maximum(beta, jnp.finfo(rdtype).tiny), 0.0
        )
        v_next = w * inv.astype(dtype)
        beta_out = jnp.where(beta > 1e-14, beta, jnp.zeros_like(beta))
        return (v_curr, v_next, beta_out), (v_curr, alpha, beta_out)

    init = (jnp.zeros_like(v1), v1, jnp.zeros((), rdtype))
    _, (V, alphas, betas) = jax.lax.scan(step, init, None, length=m)
    return V, alphas, betas[: m - 1], norm0


def _tridiag_dense(alphas, betas):
    m = alphas.shape[0]
    T = jnp.diag(alphas)
    if m > 1:
        T = T + jnp.diag(betas, 1) + jnp.diag(betas, -1)
    return T


@partial(jax.jit, static_argnums=(0, 2, 4))
def _krylov_apply_expm(matvec, psi, m, z, renormalize):
    """psi_out ~= V^T Q e^{z D} Q^H (||psi|| e1) with T = Q D Q^H the Krylov tridiagonal."""
    V, alphas, betas, norm0 = _krylov_factorize(matvec, psi, m)
    T = _tridiag_dense(alphas, betas)
    D, Q = jnp.linalg.eigh(T)
    cdtype = jnp.result_type(psi.dtype, z.dtype)
    e1 = jnp.zeros(m, cdtype).at[0].set(norm0.astype(cdtype))
    y = Q.astype(cdtype) @ (jnp.exp(z * D.astype(cdtype)) * (Q.astype(cdtype).conj().T @ e1))
    psi_out = y @ V.astype(cdtype)
    if renormalize:
        nrm = jnp.linalg.norm(psi_out)
        psi_out = psi_out / jnp.maximum(nrm, jnp.finfo(nrm.dtype).tiny).astype(cdtype)
    return psi_out


def krylov_time_evolve(
    psi, matvec, dt: float, kry_m: int = 30, renormalize: bool = True
):
    """psi(t + dt) = e^{-i H dt} psi in an m-dim Krylov subspace
    (ref: src/TimeEvolution/Krylov.jl:136-192). `renormalize=True` reproduces the
    reference's output renormalization (src/TimeEvolution/Krylov.jl:190 — note it
    masks truncation error, SURVEY.md §2.4-7; pass False to see the raw result)."""
    cdtype = jnp.result_type(psi.dtype, jnp.complex64)
    z = jnp.asarray(-1j * dt, cdtype)
    return _krylov_apply_expm(matvec, psi.astype(cdtype), kry_m, z, renormalize)


def krylov_expm_multiply(psi, matvec, z, kry_m: int = 30, renormalize: bool = False):
    """General e^{z H} psi (z complex) through the same Krylov core."""
    cdtype = jnp.result_type(psi.dtype, jnp.complex64)
    return _krylov_apply_expm(
        matvec, psi.astype(cdtype), kry_m, jnp.asarray(z, cdtype), renormalize
    )


def krylov_imaginary_time_evolve(psi, matvec, tau: float, kry_m: int = 30):
    """e^{-tau H} psi, UNnormalized (thermal-state half-propagator for quantum
    typicality; clean reimplementation of the reference's stale
    krylov_imaginary_time_evolution, src/TimeEvolution/QuantumTypicality.jl:154-211)."""
    cdtype = jnp.result_type(psi.dtype, jnp.complex64)
    z = jnp.asarray(-tau + 0j, cdtype)
    return _krylov_apply_expm(matvec, psi.astype(cdtype), kry_m, z, False)
