"""Lanczos eigensolvers as lax.scan recurrences (capability parity with src/Lanczos.jl).

The reference re-implements the 3-term recurrence five times across modules
(SURVEY.md §7); here there is ONE scan core with options, shared by the
extremal/groundstate/tridiag/spectral paths.

Numerics notes vs the reference:
  - Inner products use the proper sesquilinear <x|y> = conj(x)^T y. The reference
    writes `dot(conj(x), y)` (bilinear x^T y) which only works because H is real
    (SURVEY.md §2.4-4).
  - Breakdown (beta < tol, ref src/Lanczos.jl:58-62) is handled with static
    shapes: masked steps emit beta=0, v_next=0 and repeat the last valid alpha,
    which block-decouples the tridiagonal without touching downstream weights
    (the spurious 1x1 blocks carry zero spectral weight because their
    eigenvectors have zero first component). Host-level wrappers additionally
    slice to `m_eff`.
  - `lanczos_groundstate` defaults to full reorthogonalization with a stored
    basis, as the reference does (src/Lanczos.jl:99-106), done as two [m, N]
    matmuls per step on the MXU. A two-pass O(few * N)-memory variant
    (`lanczos_groundstate_twopass`) fixes SURVEY.md §2.4-9 for large N.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "LanczosFactorization",
    "lanczos_iteration",
    "lanczos_tridiag",
    "lanczos_extremal",
    "lanczos_groundstate",
    "lanczos_groundstate_twopass",
    "lanczos_groundstate_restarted",
    "estimate_energy_bounds",
    "tridiag_eigh",
]


class LanczosFactorization(NamedTuple):
    alphas: jax.Array  # real [m]
    betas: jax.Array  # real [m-1] (padded with zeros past breakdown)
    m_eff: jax.Array  # int32 scalar: number of valid Lanczos vectors
    v0_norm: jax.Array  # real scalar: norm of the starting vector
    basis: jax.Array | None  # [m, N] Krylov basis (optional)


def _real_dtype(dtype):
    from ..utils.dtypes import real_dtype

    return real_dtype(dtype)


def _inner(x, y):
    """Proper sesquilinear inner product <x|y> (fixes SURVEY.md §2.4-4)."""
    return jnp.vdot(x, y)


@partial(jax.jit, static_argnums=(0, 2, 4, 5))
def _lanczos_scan(
    matvec: Callable,
    v1: jax.Array,
    m: int,
    tol,
    reorth: bool,
    store_basis: bool,
):
    """Run m Lanczos steps from normalized v1. Returns (alphas[m], betas[m],
    active[m], V or None). betas[j] couples step j to j+1; betas[m-1] unused."""
    N = v1.shape[0]
    dtype = v1.dtype
    rdtype = _real_dtype(dtype)
    tol = jnp.asarray(tol, rdtype)

    use_buffer = reorth  # reorth needs the basis in-carry
    V0 = jnp.zeros((m, N), dtype) if use_buffer else None
    if use_buffer:
        V0 = V0.at[0].set(v1)

    def step(carry, j):
        v_prev, v_curr, beta_prev, active, last_alpha, V = carry
        w = matvec(v_curr)
        alpha = jnp.real(_inner(v_curr, w))
        w = w - alpha.astype(dtype) * v_curr - beta_prev.astype(dtype) * v_prev
        if reorth:
            # Full reorthogonalization against all previous vectors
            # (ref: src/Lanczos.jl:99-106) as two [m,N] matmuls on the MXU.
            mask = (jnp.arange(m) <= j).astype(rdtype)
            coeffs = (V.conj() @ w) * mask.astype(dtype)
            w = w - V.T @ coeffs
        beta = jnp.linalg.norm(w).astype(rdtype)
        ok = jnp.logical_and(active, beta > tol)
        inv = jnp.where(beta > 0, 1.0 / jnp.maximum(beta, jnp.finfo(rdtype).tiny), 0.0)
        v_next = jnp.where(ok, (w * inv.astype(dtype)), jnp.zeros_like(w))
        alpha_out = jnp.where(active, alpha, last_alpha)
        beta_out = jnp.where(ok, beta, jnp.zeros_like(beta))
        if use_buffer:
            V = jax.lax.cond(
                j + 1 < m,
                lambda V: jax.lax.dynamic_update_index_in_dim(V, v_next, j + 1, axis=0),
                lambda V: V,
                V,
            )
        new_carry = (v_curr, v_next, beta_out, ok, alpha_out, V)
        ys = (alpha_out, beta_out, active)
        if store_basis and not use_buffer:
            ys = ys + (v_curr,)
        return new_carry, ys

    init = (
        jnp.zeros_like(v1),
        v1,
        jnp.zeros((), rdtype),
        jnp.asarray(True),
        jnp.zeros((), rdtype),
        V0,
    )
    carry, ys = jax.lax.scan(step, init, jnp.arange(m))
    alphas, betas, active = ys[:3]
    if store_basis:
        V = carry[5] if use_buffer else ys[3]
    else:
        V = None
    return alphas, betas, active, V


def _normalize_start(v0, dtype=None):
    v0 = jnp.asarray(v0) if not isinstance(v0, jax.Array) else v0
    if dtype is not None:
        v0 = v0.astype(dtype)
    nrm = jnp.linalg.norm(v0)
    return v0 / nrm.astype(v0.dtype), nrm


def lanczos_iteration(
    matvec: Callable,
    v0: jax.Array,
    m: int,
    tol: float = 1e-12,
    reorth: bool = False,
    store_basis: bool = False,
) -> LanczosFactorization:
    """Shared Lanczos driver. v0 need not be normalized (its norm is returned,
    mirroring ref `lanczos_tridiag`, src/Lanczos.jl:180-229)."""
    v1, v0_norm = _normalize_start(v0)
    alphas, betas, active, V = _lanczos_scan(
        matvec, v1, m, tol, reorth, store_basis
    )
    m_eff = jnp.sum(active.astype(jnp.int32))
    return LanczosFactorization(alphas, betas, m_eff, v0_norm.real, V)


def lanczos_tridiag(matvec, v0, lanc_m: int = 100, tol: float = 1e-12):
    """(alphas, betas, ||v0||) for spectral-function use
    (ref: src/Lanczos.jl:180-229). betas has length lanc_m - 1."""
    fac = lanczos_iteration(matvec, v0, lanc_m, tol=tol)
    return fac.alphas, fac.betas[: lanc_m - 1], fac.v0_norm


def tridiag_eigh(alphas, betas, m_eff=None):
    """Host eigendecomposition of the (possibly sliced) symmetric tridiagonal.

    Tiny (m <= few hundred) — LAPACK on host, exactly as the reference uses
    SymTridiagonal+eigen (src/Lanczos.jl:148-149)."""
    import scipy.linalg

    a = np.asarray(alphas, dtype=np.float64)
    b = np.asarray(betas, dtype=np.float64)
    if m_eff is not None:
        k = int(m_eff)
        a = a[:k]
        b = b[: max(k - 1, 0)]
    else:
        b = b[: a.shape[0] - 1]
    if a.shape[0] == 1:
        return a.copy(), np.ones((1, 1))
    evals, evecs = scipy.linalg.eigh_tridiagonal(a, b)
    return evals, evecs


def _backend_safe_dtype(dtype, fallback=jnp.float32):
    """Resolve a solver start dtype that is safe to CREATE on this backend.

    dtype=None -> complex64 on CPU (reference parity: src/Lanczos.jl:26-75
    uses a complex start) but f32 on accelerators: H is real symmetric, so a
    real start spans the same Krylov information, and the local TPU relay
    cannot build complex buffers eagerly (CLAUDE.md / VERDICT r1 weak-4)."""
    if dtype is not None:
        return dtype
    return jnp.complex64 if jax.default_backend() == "cpu" else fallback


def _random_start(N, dtype, key, mask=None):
    """Random start vector; `mask` (bool [N]) zeroes padded rows so sharded
    models' pad subspace (parallel/sharded_apply.pad_model) is never excited."""
    if key is None:
        key = jax.random.PRNGKey(0)
    rdtype = _real_dtype(dtype)
    if jnp.issubdtype(dtype, jnp.complexfloating):
        # combine planes INSIDE jit: the relay backend cannot run the eager
        # complex multiply (utils/complex_io); compiled complex is fine
        kr, ki = jax.random.split(key)

        @partial(jax.jit, static_argnums=(2, 3))
        def _mk(kr, ki, N, dtype):
            re = jax.random.normal(kr, (N,), rdtype)
            im = jax.random.normal(ki, (N,), rdtype)
            return jax.lax.complex(re, im).astype(dtype)

        v = _mk(kr, ki, N, dtype)
    else:
        v = jax.random.normal(key, (N,), dtype)
    if mask is not None:
        v = jnp.where(mask, v, 0)
    return v


def lanczos_extremal(
    matvec,
    N: int,
    lanc_m: int = 100,
    tol: float = 1e-12,
    dtype=None,
    key=None,
    mask=None,
):
    """(Emin, Emax) Ritz bounds from one Lanczos run with a random start
    (ref: src/Lanczos.jl:26-75). dtype=None resolves backend-safely: complex64
    on CPU (reference parity), f32 on accelerators (H is real symmetric; the
    relay backend cannot create complex buffers eagerly)."""
    v0 = _random_start(N, _backend_safe_dtype(dtype), key, mask)
    fac = lanczos_iteration(matvec, v0, lanc_m, tol=tol)
    evals, _ = tridiag_eigh(fac.alphas, fac.betas, fac.m_eff)
    return float(evals.min()), float(evals.max())


def estimate_energy_bounds(
    matvec,
    N: int,
    lanc_m: int = 80,
    tol: float = 1e-12,
    dtype=None,
    key=None,
    safety: float = 0.01,
    mask=None,
):
    """Outer estimates (Emin, Emax) of the spectrum for Chebyshev rescaling.

    The reference runs `lanczos_extremal` on H and on -H (src/Lanczos.jl:238-254),
    which is statistically redundant — both give interior Ritz bounds. Here one
    run is EXPANDED outward by `safety` * halfwidth, because Chebyshev methods
    diverge if any eigenvalue maps outside [-1, 1] (the reference instead
    *shrinks* the interval via its 0.99/0.9 factors and then needs a mid-stream
    renormalization hack, SURVEY.md §2.4-3/5 — a defect we do not replicate)."""
    lo, hi = lanczos_extremal(
        matvec, N, lanc_m=lanc_m, tol=tol, dtype=dtype, key=key, mask=mask
    )
    half = 0.5 * (hi - lo)
    pad = safety * half + 1e-6
    return lo - pad, hi + pad


def lanczos_groundstate(
    matvec,
    N: int,
    lanc_m: int = 100,
    tol: float = 1e-12,
    dtype=jnp.float32,
    key=None,
    reorth: bool = True,
    mask=None,
):
    """Ground-state energy and vector with stored basis + full reorthogonalization
    (ref: src/Lanczos.jl:78-165). Returns (E0, psi_gs, info dict with residual)."""
    v0 = _random_start(N, dtype, key, mask)
    fac = lanczos_iteration(
        matvec, v0, lanc_m, tol=tol, reorth=reorth, store_basis=True
    )
    evals, evecs = tridiag_eigh(fac.alphas, fac.betas, fac.m_eff)
    k = int(fac.m_eff)
    idx = int(np.argmin(evals))
    E0 = float(evals[idx])
    y_full = np.zeros(lanc_m)
    y_full[:k] = evecs[:, idx]
    psi = jnp.asarray(y_full, _real_dtype(dtype)).astype(fac.basis.dtype) @ fac.basis
    psi = psi / jnp.linalg.norm(psi).astype(psi.dtype)
    hpsi = matvec(psi)
    residual = float(jnp.linalg.norm(hpsi - jnp.asarray(E0, psi.dtype) * psi))
    return E0, psi, {"residual": residual, "m_eff": k, "evals": evals}


def lanczos_groundstate_twopass(
    matvec,
    N: int,
    lanc_m: int = 100,
    tol: float = 1e-12,
    dtype=jnp.float32,
    key=None,
    mask=None,
):
    """Memory-lean ground state: pass 1 computes (alpha, beta) with O(3N) memory,
    the tiny tridiagonal is solved on host, pass 2 re-runs the identical
    recurrence accumulating psi = sum_j y_j v_j. Fixes the O(N*m) memory of the
    reference (SURVEY.md §2.4-9) for large Hilbert spaces. No reorthogonalization,
    so use moderate m or check the residual in the returned info."""
    v0 = _random_start(N, dtype, key, mask)
    v1, _ = _normalize_start(v0)
    del v0, mask  # at L=32 each N-vector is ~3 GB; drop refs before the scan
    alphas, betas, active, _ = _lanczos_scan(matvec, v1, lanc_m, tol, False, False)
    m_eff = int(jnp.sum(active.astype(jnp.int32)))
    evals, evecs = tridiag_eigh(alphas, betas, m_eff)
    idx = int(np.argmin(evals))
    E0 = float(evals[idx])
    y = np.zeros(lanc_m)
    y[:m_eff] = evecs[:, idx]
    psi = _second_pass_accumulate(matvec, v1, jnp.asarray(y, _real_dtype(dtype)), lanc_m)
    psi, _, residual = _ritz_finalize(matvec, psi)
    return E0, psi, {"residual": float(residual), "m_eff": m_eff, "evals": evals}


def lanczos_groundstate_restarted(
    matvec,
    N: int,
    lanc_m: int = 40,
    cycles: int = 4,
    tol: float = 1e-12,
    dtype=jnp.float32,
    key=None,
    mask=None,
    target_residual: float | None = None,
):
    """Restarted two-pass ground state: O(3N) memory AND high accuracy.

    Each cycle runs the two-pass Lanczos (no stored basis) starting from the
    previous cycle's Ritz vector; restarting recovers the accuracy that
    orthogonality loss costs the plain two-pass at large m, without the
    reference's O(N*m) stored-basis memory (SURVEY.md §2.4-9). Stops early when
    `target_residual` is reached."""
    v0 = _random_start(N, dtype, key, mask)
    E0 = None
    psi = v0
    info = {}
    del v0, mask
    for c in range(cycles):
        v1, _ = _normalize_start(psi)
        # drop the pre-normalization vector: holding it through the scan costs
        # a full extra N-vector of HBM (fatal at L=32, ~3 GB each)
        psi = None
        alphas, betas, active, _ = _lanczos_scan(matvec, v1, lanc_m, tol, False, False)
        m_eff = int(jnp.sum(active.astype(jnp.int32)))
        evals, evecs = tridiag_eigh(alphas, betas, m_eff)
        idx = int(np.argmin(evals))
        E0 = float(evals[idx])
        y = np.zeros(lanc_m)
        y[:m_eff] = evecs[:, idx]
        psi = _second_pass_accumulate(
            matvec, v1, jnp.asarray(y, _real_dtype(dtype)), lanc_m
        )
        psi, E, resid = _ritz_finalize(matvec, psi)
        E0 = float(E)
        residual = float(resid)
        info = {"residual": residual, "m_eff": m_eff, "cycles": c + 1, "evals": evals}
        if target_residual is not None and residual < target_residual:
            break
        if m_eff < lanc_m:  # invariant subspace reached
            break
    return E0, psi, info


@partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
def _ritz_finalize(matvec, psi_unnorm):
    """Normalize the Ritz vector and compute (psi, E = <psi|H|psi>, residual)
    in ONE jitted program. Outside jit each eager kron/blocked apply
    materializes every per-group temp simultaneously — at L=32 (3 GB/vector)
    that final eager matvec alone OOMs a 16 GB chip; under jit XLA frees group
    temps as it goes and the donated input avoids a second N-buffer."""
    dtype = psi_unnorm.dtype
    rdtype = _real_dtype(dtype)
    nrm = jnp.linalg.norm(psi_unnorm)
    psi = psi_unnorm / jnp.maximum(nrm, jnp.finfo(rdtype).tiny).astype(dtype)
    hpsi = matvec(psi)
    E = jnp.real(_inner(psi, hpsi))
    resid = jnp.linalg.norm(hpsi - E.astype(dtype) * psi)
    return psi, E, resid


@partial(jax.jit, static_argnums=(0, 3), donate_argnums=(1,))
def _second_pass_accumulate(matvec, v1, y, m):
    """Re-run the Lanczos recurrence (same v1 => same vectors) accumulating
    psi = sum_j y_j v_j without storing the basis. v1 is DONATED (its buffer
    becomes the scan carry; callers must not reuse it)."""
    dtype = v1.dtype
    rdtype = _real_dtype(dtype)

    def step(carry, yj):
        v_prev, v_curr, beta_prev, acc = carry
        acc = acc + yj.astype(dtype) * v_curr
        w = matvec(v_curr)
        alpha = jnp.real(_inner(v_curr, w))
        w = w - alpha.astype(dtype) * v_curr - beta_prev.astype(dtype) * v_prev
        beta = jnp.linalg.norm(w).astype(rdtype)
        inv = jnp.where(beta > 0, 1.0 / jnp.maximum(beta, jnp.finfo(rdtype).tiny), 0.0)
        v_next = w * inv.astype(dtype)
        return (v_curr, v_next, beta, acc), None

    init = (jnp.zeros_like(v1), v1, jnp.zeros((), rdtype), jnp.zeros_like(v1))
    carry, _ = jax.lax.scan(step, init, y)
    return carry[3]
