"""Chebyshev machinery: KPM moments, damping kernels, series reconstruction, and
Chebyshev-Bessel time evolution.

Capability parity with src/KPM_Sqw.jl (moments :76-109, kernels :112-126, series
:49-71), src/TimeEvolution/KPM.jl (cross moments :119-163, Jackson :170-177,
series :184-209) and src/TimeEvolution/Chebyshev.jl (:62-133).

One moment/recurrence core (a lax.scan) serves all paths; the two reference KPM
normalization conventions (SURVEY.md §2.4-3) are exposed explicitly via
`kpm_reconstruct(..., doubling=..., density_2_over_a=...)` so both reference
outputs can be matched while sharing one implementation.

Series reconstruction uses T_n(x) = cos(n arccos x), exact for |x| < 1, so the
whole (W x M) evaluation is one MXU matmul instead of the reference's per-omega
scalar recurrences (src/KPM_Sqw.jl:55-67).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "chebyshev_moments",
    "chebyshev_cross_moments",
    "jackson_kernel",
    "lorentz_kernel",
    "get_kernel",
    "kpm_reconstruct",
    "kpm_diagnostics",
    "chebyshev_coefficients",
    "chebyshev_time_evolve",
    "rescaling_params",
]


def rescaling_params(Emin: float, Emax: float, safety: float = 1.0):
    """(a, b) with H_tilde = (H - b)/a. The reference shrinks `a` by 0.99/0.9
    factors (src/KPM_Sqw.jl:20, src/TimeEvolution/KPM.jl:46); pass safety<1 to
    reproduce that, but prefer expanded bounds from estimate_energy_bounds."""
    a = (Emax - Emin) / 2.0 * safety
    b = (Emax + Emin) / 2.0
    return float(a), float(b)


def _default_compensated(dtype) -> bool:
    # finfo of a complex dtype reports the component precision (32 for c64)
    return jnp.finfo(dtype).bits <= 32


def _vdot_c(x, y, compensated):
    # BlockVec (and bf16-upcast) dispatch shared with the Lanczos solvers —
    # KPM moment scans run on BlockVec kron states unchanged.
    from .lanczos import _inner_c

    return _inner_c(x, y, compensated)


@partial(jax.jit, static_argnums=(0, 2, 4))
def _moment_scan(matvec_rescaled: Callable, phi: jax.Array, M: int,
                 chi: jax.Array, compensated: bool = False):
    """mu_n = <chi| T_n(H~) |phi> for n = 0..M-1 via the 3-term recurrence.

    One matvec per moment, matching ref src/KPM_Sqw.jl:76-109 /
    src/TimeEvolution/KPM.jl:119-163 (without the reference's mid-stream
    renormalization hack, SURVEY.md §2.4-5: with correctly expanded bounds the
    iterates cannot blow up). `compensated` uses utils/compensated.vdot2 to
    suppress f32 moment drift at large M (tested vs x64 at M=1024)."""
    mu0 = _vdot_c(chi, phi, compensated)
    v_curr = matvec_rescaled(phi)
    mu1 = _vdot_c(chi, v_curr, compensated)

    def step(carry, _):
        v_prev, v_curr = carry
        v_next = 2.0 * matvec_rescaled(v_curr) - v_prev
        mu = _vdot_c(chi, v_next, compensated)
        return (v_curr, v_next), mu

    if M > 2:
        _, mus = jax.lax.scan(step, (phi, v_curr), None, length=M - 2)
        return jnp.concatenate([jnp.stack([mu0, mu1]), mus])
    return jnp.stack([mu0, mu1])[:M]


def chebyshev_moments(matvec_rescaled, phi, M: int, doubling_trick: bool = False,
                      compensated: bool | None = None):
    """Diagonal KPM moments mu_n = <phi|T_n(H~)|phi>, real part
    (ref: src/KPM_Sqw.jl:76-109).

    doubling_trick=True uses the exact product identities
      mu_{2n}   = 2 <T_n phi | T_n phi>     - mu_0
      mu_{2n+1} = 2 <T_{n+1} phi | T_n phi> - mu_1
    to produce M moments from ~M/2 matvecs — a standard KPM optimization the
    reference does not implement (one matvec per moment at src/KPM_Sqw.jl:92)."""
    if compensated is None:
        compensated = _default_compensated(phi.dtype)
    if not doubling_trick:
        return jnp.real(_moment_scan(matvec_rescaled, phi, M, phi, compensated))
    return _moment_scan_doubled(matvec_rescaled, phi, M, compensated)


@partial(jax.jit, static_argnums=(0, 2, 3))
def _moment_scan_doubled(matvec_rescaled, phi, M: int, compensated: bool = False):
    """mu_0..mu_{M-1} via the product identities (M even or odd handled)."""
    half = (M + 1) // 2  # need T_0..T_half
    mu0 = jnp.real(_vdot_c(phi, phi, compensated))
    v_curr = matvec_rescaled(phi)
    mu1 = jnp.real(_vdot_c(phi, v_curr, compensated))

    def step(carry, _):
        v_prev, v_curr = carry
        v_next = 2.0 * matvec_rescaled(v_curr) - v_prev
        even = 2.0 * jnp.real(_vdot_c(v_curr, v_curr, compensated)) - mu0
        odd = 2.0 * jnp.real(_vdot_c(v_next, v_curr, compensated)) - mu1
        return (v_curr, v_next), (even, odd)

    # n = 1 .. half: produces mu_2..mu_{2*half+1}
    _, (evens, odds) = jax.lax.scan(
        step, (phi, v_curr), None, length=max(half, 1)
    )
    mus = jnp.zeros(2 * half + 2, mu0.dtype)
    mus = mus.at[0].set(mu0).at[1].set(mu1)
    mus = mus.at[2::2].set(evens)
    mus = mus.at[3::2].set(odds)
    return mus[:M]


def chebyshev_cross_moments(matvec_rescaled, chi, phi, M: int, normalize_phi=True,
                            compensated: bool | None = None):
    """Cross moments mu_n = <chi| T_n(H~) |phi> * ||phi|| with phi normalized
    first, exactly as ref src/TimeEvolution/KPM.jl:119-163. Returns real parts
    (the reference stores real moments)."""
    if compensated is None:
        compensated = _default_compensated(phi.dtype)
    norm_phi = jnp.linalg.norm(phi)
    if normalize_phi:
        phi = phi / norm_phi.astype(phi.dtype)
    mus = _moment_scan(matvec_rescaled, phi, M, chi, compensated)
    return jnp.real(mus) * jnp.real(norm_phi)


def jackson_kernel(M: int) -> np.ndarray:
    """Jackson damping g_n (ref: src/KPM_Sqw.jl:113-118 == src/TimeEvolution/KPM.jl:170-177)."""
    n = np.arange(M)
    d = np.pi / (M + 1)
    return ((M - n + 1) * np.cos(d * n) + np.sin(d * n) / np.tan(d)) / (M + 1)


def lorentz_kernel(M: int, lam: float = 3.0) -> np.ndarray:
    """Lorentz damping (ref: src/KPM_Sqw.jl:119-124)."""
    n = np.arange(M)
    return np.sinh(lam * (1.0 - n / M)) / np.sinh(lam)


def get_kernel(M: int, kernel: str = "jackson") -> np.ndarray:
    if kernel == "jackson":
        return jackson_kernel(M)
    if kernel == "lorentz":
        return lorentz_kernel(M)
    if kernel in (None, "none"):
        return np.ones(M)
    raise ValueError(f"unknown kernel {kernel!r}")


def kpm_reconstruct(
    mu,
    omega,
    a: float,
    b: float,
    kernel: str = "jackson",
    doubling: bool = True,
    density_2_over_a: bool = False,
    clamp: float | None = 0.999,
    clip_nonneg: bool = True,
):
    """Evaluate S(omega) from (damped) moments.

    The two reference conventions (SURVEY.md §2.4-3):
      - `kpm_sw` (src/KPM_Sqw.jl:49-71): doubling=True, density_2_over_a=False,
        x clamped to +-0.999.
      - `evaluate_chebyshev_series` (src/TimeEvolution/KPM.jl:184-209):
        doubling=False, density_2_over_a=True, zero outside |x| >= 1.

    mu may be batched [..., M]; omega is [W]. Returns [..., W]."""
    mu = jnp.asarray(mu)
    M = mu.shape[-1]
    dtype = mu.real.dtype
    g = jnp.asarray(get_kernel(M, kernel), dtype)
    mu_d = mu * g
    fac = jnp.ones(M, dtype)
    if doubling:
        fac = fac.at[1:].set(2.0)
    mu_d = mu_d * fac

    omega = jnp.asarray(omega, dtype)
    x = (omega - b) / a
    inside = jnp.abs(x) < 1.0
    if clamp is not None:
        x = jnp.clip(x, -clamp, clamp)
    theta = jnp.arccos(jnp.clip(x, -1.0, 1.0))
    n = jnp.arange(M, dtype=dtype)
    T = jnp.cos(jnp.outer(theta, n))  # [W, M] — exact T_n(x) for |x|<=1
    S = mu_d @ T.T  # [..., W] on the MXU
    denom = jnp.pi * jnp.sqrt(jnp.maximum(1.0 - x * x, jnp.finfo(dtype).tiny))
    S = S / denom
    if density_2_over_a:
        S = S * (2.0 / a)
    if clamp is None:
        # without clamping the density blows up outside the domain: zero there
        S = jnp.where(inside, S, 0.0)
    if clip_nonneg:
        S = jnp.maximum(S, 0.0)
    return S


def kpm_diagnostics(matvec_rescaled, phi, omega, a: float, b: float, M: int = 32):
    """Structured KPM health check (replaces the reference's printf diagnostic
    `debug_moments`, src/KPM_Sqw.jl:133-169): returns a dict of arrays/flags
    instead of printing, per the observability plan in SURVEY.md §5.

    Checks: x-range of omega inside [-1, 1], moment magnitudes, iterate-norm
    growth (which signals eigenvalues escaping the rescaled interval)."""
    omega = jnp.asarray(omega)
    x = (omega - b) / a
    mu = chebyshev_moments(matvec_rescaled, phi, M)

    # norm of T_M(H~)|phi> — explodes iff spec(H~) escapes [-1, 1]
    v_prev = phi
    v_curr = matvec_rescaled(phi)

    def step(carry, _):
        v_prev, v_curr = carry
        v_next = 2.0 * matvec_rescaled(v_curr) - v_prev
        return (v_curr, v_next), jnp.linalg.norm(v_next)

    _, norms = jax.lax.scan(step, (v_prev, v_curr), None, length=max(M - 2, 1))
    return {
        "x_min": float(jnp.min(x)),
        "x_max": float(jnp.max(x)),
        "x_in_range": bool(jnp.all(jnp.abs(x) <= 1.0)),
        "moments": np.asarray(mu),
        "max_abs_moment": float(jnp.max(jnp.abs(mu))),
        "iterate_norms": np.asarray(norms),
        "moments_bounded": float(jnp.max(jnp.abs(mu))) < 1e3,
    }


# -----------------------------------------------------------------------------
# Chebyshev-Bessel time evolution (ref: src/TimeEvolution/Chebyshev.jl)
# -----------------------------------------------------------------------------


def chebyshev_coefficients(dt: float, Emin: float, Emax: float, cheb_n: int):
    """c_k = (2 - delta_k0) (-i)^k J_k(a dt) e^{-i b dt} and (a, b)
    (ref: src/TimeEvolution/Chebyshev.jl:71-80, incl. the 0.9999 shrink at :71).

    Host-side (scipy Bessel J); coefficients are tiny and depend only on
    (dt, bounds, n), so precompute once and reuse across steps."""
    from scipy.special import jv

    a = (Emax - Emin) / (2 * 0.9999)
    b = (Emax + Emin) / 2.0
    k = np.arange(cheb_n)
    c = (2.0 - (k == 0)) * (-1j) ** k * jv(k, a * dt) * np.exp(-1j * b * dt)
    return np.asarray(c, np.complex128), float(a), float(b)


def chebyshev_time_evolve(
    psi,
    matvec,
    dt: float,
    Ebounds: tuple[float, float],
    cheb_n: int = 100,
    coeffs=None,
):
    """psi(t + dt) = e^{-i H dt} psi via the Chebyshev-Bessel expansion
    (ref: src/TimeEvolution/Chebyshev.jl:62-133). `matvec` applies the raw H;
    rescaling happens internally from Ebounds. Pass precomputed `coeffs`
    (from chebyshev_coefficients) to skip the host Bessel evaluation."""
    if coeffs is None:
        c, a, b = chebyshev_coefficients(dt, Ebounds[0], Ebounds[1], cheb_n)
    else:
        c, a, b = coeffs
    cdtype = jnp.result_type(psi.dtype, jnp.complex64)
    psi = psi.astype(cdtype)
    c = jnp.asarray(c, cdtype)
    inv_a = 1.0 / a

    def matvec_rescaled(v):
        return (matvec(v) - jnp.asarray(b, cdtype) * v) * jnp.asarray(inv_a, cdtype)

    # scan terms buffer: avoid materializing [n, N]; accumulate in the scan carry.
    return _cheb_evolve_accum(matvec_rescaled, psi, c, cheb_n)


@partial(jax.jit, static_argnums=(0, 3))
def _cheb_evolve_accum(matvec_rescaled, psi, coeffs, n):
    phi_prev = psi
    psi_t = coeffs[0] * phi_prev
    if n >= 2:
        phi_curr = matvec_rescaled(phi_prev)
        psi_t = psi_t + coeffs[1] * phi_curr
    else:
        return psi_t

    def step(carry, c_k):
        phi_prev, phi_curr, acc = carry
        phi_next = 2.0 * matvec_rescaled(phi_curr) - phi_prev
        acc = acc + c_k * phi_next
        return (phi_curr, phi_next, acc), None

    if n > 2:
        (_, _, psi_t), _ = jax.lax.scan(step, (phi_prev, phi_curr, psi_t), coeffs[2:])
    return psi_t
