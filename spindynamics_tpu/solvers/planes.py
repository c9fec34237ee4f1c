"""Complex-free (real-plane) solver variants for backends without complex support.

The axon-relayed TPU in this environment cannot create complex buffers and its
compiler hangs on complex-typed HLO. Since every Hamiltonian here is REAL
symmetric, complex states decompose exactly: psi = re + i*im with H acting on
each plane independently; inner products, Chebyshev/Krylov recurrences and the
tiny tridiagonal exponentials all have closed real forms. These variants hold
the state as an f32 [2, N] plane stack and use NO complex dtype anywhere.

Numerically identical to the complex implementations (tests assert this on CPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..model import SpinModel
from ..ops.apply import matvec_fn
from .chebyshev import chebyshev_coefficients, kpm_reconstruct

__all__ = [
    "planes_matvec_fn",
    "chebyshev_time_evolve_planes",
    "krylov_time_evolve_planes",
    "krylov_imaginary_time_evolve_planes",
    "chebyshev_moments_planes",
    "kpm_sqw_planes",
    "lanczos_tridiag_planes",
    "lanczos_sqw_planes",
    "sz_q_planes",
    "apply_spin_operator_planes",
    "spin_operator_planes_fn",
    "chebyshev_cross_moments_planes",
    "kpm_dynamical_correlation_planes",
    "kpm_correlation_matrix_planes",
    "typicality_correlation_function_planes",
]


def planes_matvec_fn(model: SpinModel, backend: str | None = None):
    """[2, N] -> [2, N]: H applied to both planes (H is real)."""
    mv = matvec_fn(model, backend)

    def pm(p):
        return jnp.stack([mv(p[0]), mv(p[1])])

    return pm


def _pdot(x, y):
    """Re<x|y> and Im<x|y> for plane stacks: <x|y> = (xr - i xi)·(yr + i yi)."""
    re = jnp.vdot(x[0], y[0]) + jnp.vdot(x[1], y[1])
    im = jnp.vdot(x[0], y[1]) - jnp.vdot(x[1], y[0])
    return re, im


def _pnorm2(x):
    return jnp.vdot(x[0], x[0]) + jnp.vdot(x[1], x[1])


def sz_q_planes(model: SpinModel, psi_planes, q):
    """phi = S^z_q psi on plane stacks (the weight w_q is complex diagonal)."""
    L = model.L
    states = model.basis_states()
    wr = jnp.zeros(model.n_states, jnp.float32)
    wi = jnp.zeros(model.n_states, jnp.float32)
    for site in range(L):
        sz = ((states >> np.uint32(site)) & 1).astype(jnp.float32) - 0.5
        wr = wr + np.float32(np.cos(q * site)) * sz
        wi = wi + np.float32(np.sin(q * site)) * sz
    s = np.float32(1.0 / np.sqrt(L))
    wr, wi = wr * s, wi * s
    re, im = psi_planes[0], psi_planes[1]
    return jnp.stack([wr * re - wi * im, wr * im + wi * re])


@partial(jax.jit, static_argnums=(0, 4))
def _cheb_planes_scan(pmv, planes, coeffs_ri, ab, n):
    """Chebyshev-Bessel step on planes. coeffs_ri: f32 [n, 2] (re, im)."""
    a_inv, b = ab

    def mvr(p):
        return (pmv(p) - b * p) * a_inv

    phi_prev = planes
    acc_r = coeffs_ri[0, 0] * phi_prev[0] - coeffs_ri[0, 1] * phi_prev[1]
    acc_i = coeffs_ri[0, 1] * phi_prev[0] + coeffs_ri[0, 0] * phi_prev[1]
    phi_curr = mvr(phi_prev)
    acc_r = acc_r + coeffs_ri[1, 0] * phi_curr[0] - coeffs_ri[1, 1] * phi_curr[1]
    acc_i = acc_i + coeffs_ri[1, 1] * phi_curr[0] + coeffs_ri[1, 0] * phi_curr[1]

    def step(carry, c):
        p_prev, p_curr, ar, ai = carry
        p_next = 2.0 * mvr(p_curr) - p_prev
        ar = ar + c[0] * p_next[0] - c[1] * p_next[1]
        ai = ai + c[1] * p_next[0] + c[0] * p_next[1]
        return (p_curr, p_next, ar, ai), None

    if n > 2:
        (_, _, acc_r, acc_i), _ = jax.lax.scan(
            step, (phi_prev, phi_curr, acc_r, acc_i), coeffs_ri[2:]
        )
    return jnp.stack([acc_r, acc_i])


def chebyshev_time_evolve_planes(planes, model_or_pmv, dt, Ebounds, cheb_n=100,
                                 backend=None, coeffs=None):
    """e^{-iH dt} on an f32 [2, N] plane stack; zero complex dtypes anywhere."""
    pmv = (planes_matvec_fn(model_or_pmv, backend)
           if isinstance(model_or_pmv, SpinModel) else model_or_pmv)
    if coeffs is None:
        coeffs = chebyshev_coefficients(dt, Ebounds[0], Ebounds[1], cheb_n)
    c, a, b = coeffs
    c_ri = jnp.asarray(np.stack([c.real, c.imag], axis=1), jnp.float32)
    ab = (jnp.float32(1.0 / a), jnp.float32(b))
    return _cheb_planes_scan(pmv, jnp.asarray(planes, jnp.float32), c_ri, ab,
                             cheb_n)


@partial(jax.jit, static_argnums=(0, 2))
def _lanczos_planes_scan(pmv, planes, m):
    """Lanczos on a complex state held as planes: alpha/beta real throughout."""
    nrm = jnp.sqrt(_pnorm2(planes))
    v1 = planes / jnp.maximum(nrm, jnp.finfo(jnp.float32).tiny)

    def step(carry, _):
        v_prev, v_curr, beta_prev = carry
        w = pmv(v_curr)
        alpha, _ = _pdot(v_curr, w)
        w = w - alpha * v_curr - beta_prev * v_prev
        beta = jnp.sqrt(_pnorm2(w))
        inv = jnp.where(beta > 1e-12, 1.0 / jnp.maximum(beta, jnp.finfo(jnp.float32).tiny), 0.0)
        v_next = w * inv
        beta_out = jnp.where(beta > 1e-12, beta, 0.0)
        return (v_curr, v_next, beta_out), (alpha, beta_out)

    init = (jnp.zeros_like(v1), v1, jnp.float32(0.0))
    _, (alphas, betas) = jax.lax.scan(step, init, None, length=m)
    return alphas, betas, nrm


def lanczos_tridiag_planes(pmv, planes, lanc_m=100):
    """(alphas, betas, ||phi||) from a plane-stack start (cf. lanczos_tridiag)."""
    alphas, betas, nrm = _lanczos_planes_scan(pmv, jnp.asarray(planes, jnp.float32),
                                              lanc_m)
    return alphas, betas[: lanc_m - 1], nrm


@partial(jax.jit, static_argnums=(0, 2))
def _krylov_planes_factorize(pmv, planes, m):
    nrm = jnp.sqrt(_pnorm2(planes))
    v1 = planes / jnp.maximum(nrm, jnp.finfo(jnp.float32).tiny)

    def step(carry, _):
        v_prev, v_curr, beta_prev = carry
        w = pmv(v_curr)
        alpha, _ = _pdot(v_curr, w)
        w = w - alpha * v_curr - beta_prev * v_prev
        beta = jnp.sqrt(_pnorm2(w))
        inv = jnp.where(beta > 1e-12, 1.0 / jnp.maximum(beta, jnp.finfo(jnp.float32).tiny), 0.0)
        v_next = w * inv
        beta_out = jnp.where(beta > 1e-12, beta, 0.0)
        return (v_curr, v_next, beta_out), (v_curr, alpha, beta_out)

    init = (jnp.zeros_like(v1), v1, jnp.float32(0.0))
    _, (V, alphas, betas) = jax.lax.scan(step, init, None, length=m)
    return V, alphas, betas, nrm


@partial(jax.jit, static_argnums=(0, 2, 4))
def _krylov_planes_evolve(pmv, planes, m, dt, renormalize):
    """e^{-iH dt} via Krylov, all-real: y = Q [cos(D dt) - i sin(D dt)] Q^T e1."""
    V, alphas, betas, nrm = _krylov_planes_factorize(pmv, planes, m)
    T = jnp.diag(alphas)
    if m > 1:
        T = T + jnp.diag(betas[: m - 1], 1) + jnp.diag(betas[: m - 1], -1)
    D, Q = jnp.linalg.eigh(T)
    q0 = Q[0, :] * nrm  # Q^T e1 * ||psi||
    y_r = Q @ (jnp.cos(D * dt) * q0)
    y_i = Q @ (-jnp.sin(D * dt) * q0)
    # psi_t = sum_k (y_r + i y_i)_k (v_re + i v_im)_k
    out_r = jnp.einsum("k,kn->n", y_r, V[:, 0, :]) - jnp.einsum(
        "k,kn->n", y_i, V[:, 1, :]
    )
    out_i = jnp.einsum("k,kn->n", y_i, V[:, 0, :]) + jnp.einsum(
        "k,kn->n", y_r, V[:, 1, :]
    )
    out = jnp.stack([out_r, out_i])
    if renormalize:
        n2 = jnp.sqrt(_pnorm2(out))
        out = out / jnp.maximum(n2, jnp.finfo(jnp.float32).tiny)
    return out


def krylov_time_evolve_planes(planes, model_or_pmv, dt, kry_m=30,
                              renormalize=True, backend=None):
    pmv = (planes_matvec_fn(model_or_pmv, backend)
           if isinstance(model_or_pmv, SpinModel) else model_or_pmv)
    return _krylov_planes_evolve(pmv, jnp.asarray(planes, jnp.float32), kry_m,
                                 jnp.float32(dt), renormalize)


@partial(jax.jit, static_argnums=(0, 2, 4))
def _krylov_planes_expm_real(pmv, planes, m, tau, renormalize):
    """e^{-tau H} on planes (imaginary time; all-real throughout)."""
    V, alphas, betas, nrm = _krylov_planes_factorize(pmv, planes, m)
    T = jnp.diag(alphas)
    if m > 1:
        T = T + jnp.diag(betas[: m - 1], 1) + jnp.diag(betas[: m - 1], -1)
    D, Q = jnp.linalg.eigh(T)
    y = Q @ (jnp.exp(-tau * D) * (Q[0, :] * nrm))
    out_r = jnp.einsum("k,kn->n", y, V[:, 0, :])
    out_i = jnp.einsum("k,kn->n", y, V[:, 1, :])
    out = jnp.stack([out_r, out_i])
    if renormalize:
        n2 = jnp.sqrt(_pnorm2(out))
        out = out / jnp.maximum(n2, jnp.finfo(jnp.float32).tiny)
    return out


def krylov_imaginary_time_evolve_planes(planes, model_or_pmv, tau, kry_m=30,
                                        backend=None, renormalize=False):
    """e^{-tau H} on an f32 [2, N] plane stack (cf. krylov_imaginary_time_evolve)."""
    pmv = (planes_matvec_fn(model_or_pmv, backend)
           if isinstance(model_or_pmv, SpinModel) else model_or_pmv)
    return _krylov_planes_expm_real(pmv, jnp.asarray(planes, jnp.float32), kry_m,
                                    jnp.float32(tau), renormalize)


@partial(jax.jit, static_argnums=(0, 2))
def _moments_planes_scan(pmvr, phi, M):
    """mu_n = Re<phi|T_n|phi> on planes (phi normalized by caller)."""
    mu0, _ = _pdot(phi, phi)
    v_curr = pmvr(phi)
    mu1, _ = _pdot(phi, v_curr)

    def step(carry, _):
        v_prev, v_curr = carry
        v_next = 2.0 * pmvr(v_curr) - v_prev
        mu, _ = _pdot(phi, v_next)
        return (v_curr, v_next), mu

    if M > 2:
        _, mus = jax.lax.scan(step, (phi, v_curr), None, length=M - 2)
        return jnp.concatenate([jnp.stack([mu0, mu1]), mus])
    return jnp.stack([mu0, mu1])[:M]


@partial(jax.jit, static_argnums=(0, 2))
def _moments_planes_doubled(pmvr, phi, M):
    """M moments from ~M/2 matvecs on planes (product identities; cf.
    chebyshev_moments(doubling_trick=True))."""
    half = (M + 1) // 2
    mu0, _ = _pdot(phi, phi)
    v_curr = pmvr(phi)
    mu1, _ = _pdot(phi, v_curr)

    def step(carry, _):
        v_prev, v_curr = carry
        v_next = 2.0 * pmvr(v_curr) - v_prev
        even = 2.0 * _pdot(v_curr, v_curr)[0] - mu0
        odd = 2.0 * _pdot(v_next, v_curr)[0] - mu1
        return (v_curr, v_next), (even, odd)

    _, (evens, odds) = jax.lax.scan(step, (phi, v_curr), None,
                                    length=max(half, 1))
    mus = jnp.zeros(2 * half + 2, mu0.dtype)
    mus = mus.at[0].set(mu0).at[1].set(mu1)
    mus = mus.at[2::2].set(evens)
    mus = mus.at[3::2].set(odds)
    return mus[:M]


def chebyshev_moments_planes(model_or_pmv, phi_planes, M, a, b, backend=None,
                             doubling_trick=False):
    pmv = (planes_matvec_fn(model_or_pmv, backend)
           if isinstance(model_or_pmv, SpinModel) else model_or_pmv)
    a_inv = jnp.float32(1.0 / a)
    bb = jnp.float32(b)

    def pmvr(p):
        return (pmv(p) - bb * p) * a_inv

    phi = jnp.asarray(phi_planes, jnp.float32)
    if doubling_trick:
        return _moments_planes_doubled(pmvr, phi, M)
    return _moments_planes_scan(pmvr, phi, M)


def kpm_sqw_planes(psi_planes, model: SpinModel, q_list, omega, a, b,
                   kpm_m=200, kernel="jackson", backend=None, E0=None,
                   doubling_trick=True):
    """S(q, omega) via KPM with zero complex dtypes (cf. kpm_sqw).

    The q axis is vmapped into one batched moment recurrence, mirroring the
    complex kpm_sqw."""
    psi_planes = jnp.asarray(psi_planes, jnp.float32)
    phis = jnp.stack([sz_q_planes(model, psi_planes, float(q)) for q in q_list])
    n2 = jax.vmap(_pnorm2)(phis)
    safe = jnp.sqrt(jnp.maximum(n2, jnp.finfo(jnp.float32).tiny))
    phis = phis / safe[:, None, None]

    pmv = planes_matvec_fn(model, backend)
    a_inv = jnp.float32(1.0 / a)
    bb = jnp.float32(b)

    def pmvr(p):
        return (pmv(p) - bb * p) * a_inv

    mus = jax.vmap(
        lambda p: _moments_planes_doubled(pmvr, p, kpm_m)
        if doubling_trick else _moments_planes_scan(pmvr, p, kpm_m)
    )(phis)
    om = np.asarray(omega) + (E0 or 0.0)
    S = kpm_reconstruct(mus, om, a, b, kernel=kernel, doubling=True,
                        density_2_over_a=False)
    S = jnp.where((n2 > 0)[:, None], S, 0.0)
    return np.asarray(S)


def lanczos_sqw_planes(psi_planes, model: SpinModel, q_list, omega, E0,
                       lanc_m=200, eta=0.05, broaden="lorentz", backend=None):
    """Lanczos S(q, omega) on plane stacks (cf. lanczos_sqw). E0 must be given
    (computed by the caller from the real ground state)."""
    from .lanczos_sqw import spectral_from_tridiagonal_batched

    pmv = planes_matvec_fn(model, backend)
    psi_planes = jnp.asarray(psi_planes, jnp.float32)
    phis = jnp.stack([sz_q_planes(model, psi_planes, float(q)) for q in q_list])
    alphas, betas, nrms = jax.vmap(
        lambda p: _lanczos_planes_scan(pmv, p, lanc_m)
    )(phis)
    return spectral_from_tridiagonal_batched(
        np.asarray(alphas), np.asarray(betas)[:, : lanc_m - 1],
        np.asarray(nrms), E0, omega, eta=eta, broaden=broaden,
    )


def apply_spin_operator_planes(planes, model: SpinModel, site: int, kind: str):
    """Single-site spin operator on an f32 [2, N] plane stack (cf.
    apply_spin_operator). 'z'/'plus'/'minus'/'x' act plane-wise; 'y' (imaginary
    amplitudes) mixes the planes: i * (re + i im) = -im + i re."""
    from ..ops.spin_ops import apply_spin_operator

    re, im = planes[0], planes[1]
    if kind != "y":
        return jnp.stack([
            apply_spin_operator(re, model, site, kind),
            apply_spin_operator(im, model, site, kind),
        ])
    # S^y = -i/2 S^+ + i/2 S^- (all-real building blocks)
    def pm_half(p):
        return 0.5 * (apply_spin_operator(p, model, site, "plus")
                      - apply_spin_operator(p, model, site, "minus"))

    # out = -i * pm_half(psi): (-i)(a + ib) = b - i a
    return jnp.stack([pm_half(im), -pm_half(re)])


def typicality_correlation_function_planes(
    model: SpinModel, beta: float, site_a: int, site_b: int, t_points,
    kind: str = "z", key=None, kry_m: int = 30, cheb_n: int = 60,
    Ebounds=None, backend: str | None = None,
):
    """<S^kind_a(t) S^kind_b(0)>_beta by quantum typicality, complex-free
    (cf. typicality_correlation_function). Returns complex [T] (host numpy)."""
    from .lanczos import estimate_energy_bounds
    from .chebyshev import chebyshev_coefficients

    if key is None:
        key = jax.random.PRNGKey(0)
    N = model.n_states
    kr, ki = jax.random.split(key)
    r = jnp.stack([jax.random.normal(kr, (N,), jnp.float32),
                   jax.random.normal(ki, (N,), jnp.float32)])
    mask = model.valid_mask()
    if mask is not None:
        r = jnp.where(mask[None, :], r, 0)
    r = r / jnp.sqrt(_pnorm2(r))

    pmv = planes_matvec_fn(model, backend)
    psi_b = _krylov_planes_expm_real(pmv, r, kry_m, jnp.float32(beta / 2.0), True)

    if Ebounds is None:
        mv = matvec_fn(model, backend)
        Ebounds = estimate_energy_bounds(mv, N, dtype=jnp.float32,
                                         mask=mask, lanc_m=60)

    phi = apply_spin_operator_planes(psi_b, model, site_b, kind)
    xi = psi_b

    t_points = np.asarray(t_points, np.float64)
    out = np.zeros(t_points.shape[0], np.complex128)
    prev_t = 0.0
    for i, t in enumerate(t_points):
        dt = float(t - prev_t)
        if abs(dt) > 1e-15:
            coeffs = chebyshev_coefficients(dt, Ebounds[0], Ebounds[1], cheb_n)
            phi = chebyshev_time_evolve_planes(phi, pmv, dt, Ebounds,
                                               cheb_n=cheb_n, coeffs=coeffs)
            xi = chebyshev_time_evolve_planes(xi, pmv, dt, Ebounds,
                                              cheb_n=cheb_n, coeffs=coeffs)
        prev_t = float(t)
        a_phi = apply_spin_operator_planes(phi, model, site_a, kind)
        re, im = _pdot(xi, a_phi)
        out[i] = float(re) + 1j * float(im)
    return out


def spin_operator_planes_fn(site: int, kind: str):
    """operator_X(planes, model) -> X|planes> callable, the planes analog of
    ops.spin_ops.spin_operator_fn (ref create_spin_operator,
    src/Hamiltonian.jl:49-115)."""

    def op(planes, model):
        return apply_spin_operator_planes(planes, model, site, kind)

    return op


def _cross_moments_planes_scan(pmvr, chi, phi, M):
    """mu_n = Re<chi|T_n(H~)|phi> on planes (phi normalized by caller)."""
    mu0, _ = _pdot(chi, phi)
    v_curr = pmvr(phi)
    mu1, _ = _pdot(chi, v_curr)

    def step(carry, _):
        v_prev, v_curr = carry
        v_next = 2.0 * pmvr(v_curr) - v_prev
        mu, _ = _pdot(chi, v_next)
        return (v_curr, v_next), mu

    if M > 2:
        _, mus = jax.lax.scan(step, (phi, v_curr), None, length=M - 2)
        return jnp.concatenate([jnp.stack([mu0, mu1]), mus])
    return jnp.stack([mu0, mu1])[:M]


def chebyshev_cross_moments_planes(pmvr, chi_planes, phi_planes, M: int,
                                   normalize_phi=True):
    """Plane-stack cross moments mu_n = Re<chi|T_n(H~)|phi> * ||phi||, matching
    chebyshev_cross_moments (the reference stores real moments,
    src/TimeEvolution/KPM.jl:119-163)."""
    chi = jnp.asarray(chi_planes, jnp.float32)
    phi = jnp.asarray(phi_planes, jnp.float32)
    norm_phi = jnp.sqrt(_pnorm2(phi))
    if normalize_phi:
        phi = phi / jnp.maximum(norm_phi, jnp.finfo(jnp.float32).tiny)
    return _cross_moments_planes_scan(pmvr, chi, phi, M) * norm_phi


def _planes_rescaled_fn(model, a, b, backend=None):
    pmv = planes_matvec_fn(model, backend)
    a_inv = jnp.float32(1.0 / a)
    bb = jnp.float32(b)

    def pmvr(p):
        return (pmv(p) - bb * p) * a_inv

    return pmvr


def kpm_dynamical_correlation_planes(
    psi_planes, operator_A, operator_B, omega, model: SpinModel,
    n: int = 300, a: float | None = None, b: float | None = None,
    kernel: str = "jackson", backend: str | None = None, key=None,
):
    """T=0 correlation S_AB(omega) on plane stacks, zero complex dtypes (cf.
    kpm.kpm_dynamical_correlation; ref src/TimeEvolution/KPM.jl:72-116).
    operator_X(planes, model) -> X|planes> (see spin_operator_planes_fn)."""
    from .chebyshev import kpm_reconstruct, rescaling_params
    from .lanczos import estimate_energy_bounds
    from ..ops.apply import matvec_fn

    if a is None or b is None:
        lo, hi = estimate_energy_bounds(
            matvec_fn(model, backend), model.n_states, dtype=jnp.float32,
            lanc_m=min(n, 80), key=key, mask=model.valid_mask(),
        )
        a, b = rescaling_params(lo, hi, safety=1.0)
    psi_planes = jnp.asarray(psi_planes, jnp.float32)
    phi = operator_B(psi_planes, model)
    chi = operator_A(psi_planes, model)
    pmvr = _planes_rescaled_fn(model, a, b, backend)
    mu = chebyshev_cross_moments_planes(pmvr, chi, phi, n)
    return kpm_reconstruct(mu, omega, a, b, kernel=kernel, doubling=False,
                           density_2_over_a=True, clamp=None,
                           clip_nonneg=True)


def kpm_correlation_matrix_planes(
    psi_planes, omega, model: SpinModel, n: int = 300,
    opA_kind: str = "z", opB_kind: str = "z",
    a: float | None = None, b: float | None = None,
    kernel: str = "jackson", backend: str | None = None, key=None,
):
    """C[i, j, omega] for all L x L site pairs on plane stacks (cf.
    kpm.kpm_correlation_matrix; ref src/TimeEvolution/KPM.jl:214-235).

    Batched over B-sites like the complex path: one plane recurrence per
    phi_j, real moments against all chi_i at once via [L, 2N] x [2N] matmuls
    (Re<chi|v> = chi_re.v_re + chi_im.v_im — a single MXU contraction over the
    flattened plane axis)."""
    from .chebyshev import kpm_reconstruct
    from .kpm import _default_rescaling

    if a is None or b is None:
        a, b = _default_rescaling(model, backend, key=key)
    L = model.L
    psi_planes = jnp.asarray(psi_planes, jnp.float32)
    ops_A = jnp.stack([
        apply_spin_operator_planes(psi_planes, model, i, opA_kind)
        for i in range(L)
    ])  # [L, 2, N]
    ops_B = jnp.stack([
        apply_spin_operator_planes(psi_planes, model, j, opB_kind)
        for j in range(L)
    ])
    A_flat = ops_A.reshape(L, -1)  # [L, 2N]: Re<chi_i|v> = A_flat @ v_flat
    pmvr = _planes_rescaled_fn(model, a, b, backend)

    def moments_vs_all(phi):
        norm_phi = jnp.sqrt(_pnorm2(phi))
        phi_n = phi / jnp.maximum(norm_phi, jnp.finfo(jnp.float32).tiny)
        mu0 = A_flat @ phi_n.reshape(-1)
        v_curr = pmvr(phi_n)
        mu1 = A_flat @ v_curr.reshape(-1)

        def step(carry, _):
            v_prev, v_curr = carry
            v_next = 2.0 * pmvr(v_curr) - v_prev
            return (v_curr, v_next), A_flat @ v_next.reshape(-1)

        _, mus = jax.lax.scan(step, (phi_n, v_curr), None, length=n - 2)
        mu = jnp.concatenate([mu0[None], mu1[None], mus], axis=0)  # [n, L]
        return mu.T * norm_phi  # [L_A, n]

    mu_all = jax.vmap(moments_vs_all)(ops_B)  # [L_B, L_A, n]
    S = kpm_reconstruct(mu_all, omega, a, b, kernel=kernel, doubling=False,
                        density_2_over_a=True, clamp=None, clip_nonneg=True)
    return jnp.abs(jnp.swapaxes(S, 0, 1))  # [i=A, j=B, W] (ref abs at :232)
