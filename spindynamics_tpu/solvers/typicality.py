"""Quantum typicality: finite-temperature correlation functions, plus an RK4 stepper.

The reference ships this capability as dead code written against a pre-refactor
API (src/TimeEvolution/QuantumTypicality.jl — excluded from the build at
src/TimeEvolution/TimeEvolution.jl:24,31 and uncompilable; SURVEY.md §2.1).
This is the clean reimplementation the survey calls for:

  <A(t) B(0)>_beta  ~=  <psi_beta| e^{iHt} A e^{-iHt} B |psi_beta> / <psi_beta|psi_beta>

with |psi_beta> = e^{-beta H / 2} |r> for a random |r| (one typicality sample;
average over keys for error bars). Time evolution by Krylov, Chebyshev, or RK4.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..model import SpinModel
from ..ops.apply import matvec_fn
from .chebyshev import chebyshev_time_evolve
from .krylov import krylov_imaginary_time_evolve, krylov_time_evolve
from .lanczos import estimate_energy_bounds

__all__ = ["rk4_time_step", "thermal_state", "typicality_correlation_function"]


@partial(jax.jit, static_argnums=(1,))
def rk4_time_step(psi, matvec, dt):
    """One RK4 step of i d|psi>/dt = H|psi> (ref: src/TimeEvolution/QuantumTypicality.jl:122-146)."""
    cdtype = jnp.result_type(psi.dtype, jnp.complex64)
    psi = psi.astype(cdtype)
    z = jnp.asarray(-1j * dt, cdtype)
    k1 = z * matvec(psi)
    k2 = z * matvec(psi + 0.5 * k1)
    k3 = z * matvec(psi + 0.5 * k2)
    k4 = z * matvec(psi + k3)
    return psi + (k1 + 2.0 * k2 + 2.0 * k3 + k4) / 6.0


def thermal_state(
    model: SpinModel,
    beta: float,
    key=None,
    kry_m: int = 30,
    backend: str | None = None,
    dtype=jnp.complex64,
):
    """|psi_beta> = e^{-beta H / 2}|r> normalized, plus the squared thermal norm
    Z_r = ||e^{-beta H/2} r||^2 (one typicality sample of the partition function)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    N = model.n_states
    from ..utils.dtypes import real_dtype

    rdtype = real_dtype(dtype)
    kr, ki = jax.random.split(key)
    r = jax.random.normal(kr, (N,), rdtype) + 1j * jax.random.normal(ki, (N,), rdtype)
    mask = model.valid_mask()
    if mask is not None:
        r = jnp.where(mask, r, 0)  # keep the sample in the logical subspace
    r = r.astype(dtype) / jnp.linalg.norm(r).astype(dtype)
    matvec = matvec_fn(model, backend)
    psi_b = krylov_imaginary_time_evolve(r, matvec, beta / 2.0, kry_m=kry_m)
    Z = jnp.real(jnp.vdot(psi_b, psi_b))
    psi_b = psi_b / jnp.sqrt(Z).astype(psi_b.dtype)
    return psi_b, float(Z)


def typicality_correlation_function(
    model: SpinModel,
    beta: float,
    operator_A: Callable,
    operator_B: Callable,
    t_points,
    method: str = "krylov",
    key=None,
    kry_m: int = 30,
    cheb_n: int = 100,
    rk4_substeps: int = 1,
    backend: str | None = None,
    Ebounds: tuple[float, float] | None = None,
):
    """C(t) = <A(t) B(0)>_beta from one typicality sample.

    operator_X(psi, model) -> X|psi>. `t_points` must be increasing (evolution
    proceeds incrementally between them, as the reference did,
    src/TimeEvolution/QuantumTypicality.jl:83-96). Returns complex array [T]."""
    matvec = matvec_fn(model, backend)
    psi_b, _ = thermal_state(model, beta, key=key, kry_m=kry_m, backend=backend)

    # |phi(t)> = e^{-iHt} B |psi_beta>;   |xi(t)> = e^{-iHt} |psi_beta>
    # C(t) = <xi(t)| A |phi(t)>
    phi = operator_B(psi_b, model)
    xi = psi_b

    if method == "chebyshev" and Ebounds is None:
        Ebounds = estimate_energy_bounds(matvec, model.n_states, key=jax.random.PRNGKey(7))

    t_points = np.asarray(t_points, dtype=np.float64)
    out = np.zeros(t_points.shape[0], dtype=np.complex128)

    def evolve(v, dt):
        if abs(dt) < 1e-15:
            return v
        if method == "krylov":
            return krylov_time_evolve(v, matvec, dt, kry_m=kry_m, renormalize=False)
        if method == "chebyshev":
            return chebyshev_time_evolve(v, matvec, dt, Ebounds, cheb_n=cheb_n)
        if method == "rk4":
            h = dt / rk4_substeps
            for _ in range(rk4_substeps):
                v = rk4_time_step(v, matvec, h)
            return v
        raise ValueError(f"unknown method {method!r}")

    prev_t = 0.0
    for i, t in enumerate(t_points):
        dt = float(t - prev_t)
        phi = evolve(phi, dt)
        xi = evolve(xi, dt)
        prev_t = float(t)
        out[i] = complex(jnp.vdot(xi, operator_A(phi, model)))
    return out
