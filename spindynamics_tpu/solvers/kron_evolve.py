"""Real-time evolution at kron BlockVec scale (VERDICT r3 missing-2).

The reference's signature demo — domain-wall magnetization dynamics
(examples/example.jl:86-117, src/TimeEvolution/Chebyshev.jl:62-133) — runs
here at L = 28-30 on one chip: the state is a pair of REAL BlockVecs
(re, im planes — zero complex dtypes anywhere, relay-safe), every matvec is
the fused Pallas kron kernel (ops/pallas_kron), and the Chebyshev-Bessel /
Krylov recurrences are lax.scan loops over the BlockVec pytree.

Memory: the Chebyshev step holds 3 plane pairs (prev, curr, acc) ~ 6 state
vectors — at L=28 Sz=14 (N = 4.0e7) that is ~1 GB; L=30 ~7 GB; L=32 needs
the sharded path. Krylov variants store the m-vector basis (scan-stacked
leaves) — use moderate m or prefer Chebyshev at large L.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.compensated import vdot2
from .blockvec import BlockVec, bv_basis_state, bv_random

__all__ = [
    "kron_planes_matvec_fn",
    "pair_dot",
    "pair_norm2",
    "lanczos_tridiag_pair",
    "chebyshev_time_evolve_kron",
    "krylov_time_evolve_kron",
    "krylov_imaginary_time_evolve_kron",
    "chebyshev_imaginary_time_kron",
    "kron_energy_bounds",
    "evolve_trajectory_kron",
    "typicality_correlation_kron",
]


def kron_planes_matvec_fn(layout, tables=None, fused: bool = True):
    """pmv((re, im)) = (H re, H im) on BlockVec planes (H is real)."""
    from ..ops.sector_kron import _device_tables

    if tables is None:
        tables = jax.tree_util.tree_map(jnp.asarray, _device_tables(layout))
    if fused:
        from ..ops.pallas_kron import apply_H_sector_kron_fused

        def mv(bv):
            return BlockVec(apply_H_sector_kron_fused(bv.leaves, layout,
                                                      tables))
    else:
        from ..ops.sector_kron import apply_H_sector_kron

        def mv(bv):
            return BlockVec(apply_H_sector_kron(bv.leaves, None, layout,
                                                tables))

    def pmv(pair):
        return (mv(pair[0]), mv(pair[1]))

    pmv.mv = mv
    # metadata for the fused Chebyshev-term kernel (ops/pallas_cheb): the
    # scan can only route through it when it knows the layout/tables behind
    # the closure; sharded matvecs don't set these, so they keep the
    # unfused scan path
    pmv.layout = layout
    pmv.tables = tables
    pmv.fused = fused
    return pmv


def _bv_vdot(x: BlockVec, y: BlockVec):
    """Compensated sum of per-leaf real vdots (f32 at N ~ 1e8 needs it).

    bf16 leaves upcast to f32 first (XLA fuses the cast into the read pass —
    traffic stays half-width); Dekker splitting and bf16 accumulation are
    both wrong at 8 mantissa bits."""
    def _d(a, b):
        if a.dtype == jnp.bfloat16:
            a = a.astype(jnp.float32)
            b = b.astype(jnp.float32)
        return jnp.real(vdot2(a, b))

    return sum(_d(a, b) for a, b in zip(x.leaves, y.leaves))


def pair_dot(x, y):
    """(Re<x|y>, Im<x|y>) for BlockVec plane pairs."""
    re = _bv_vdot(x[0], y[0]) + _bv_vdot(x[1], y[1])
    im = _bv_vdot(x[0], y[1]) - _bv_vdot(x[1], y[0])
    return re, im


def pair_norm2(x):
    return _bv_vdot(x[0], x[0]) + _bv_vdot(x[1], x[1])


@partial(jax.jit, static_argnums=(0, 2))
def _pair_tridiag_scan(pmv, pair, m, tol):
    """Basis-free Lanczos tridiagonalization of H from a complex start held
    as an (re, im) BlockVec plane pair: the kron/BlockVec mirror of
    solvers/lanczos._lanczos_scan's no-reorth path (ref recurrence
    src/Lanczos.jl:180-229). H is real symmetric, so every recurrence
    coefficient is real and the complex vector never needs a complex dtype —
    alpha = Re<v|Hv> (exact), beta = ||w||. Memory O(3 plane pairs); no
    stored basis (the spectral weights need only Q[0, :]).

    Breakdown handling matches _lanczos_scan: masked steps emit beta = 0 and
    repeat the last valid alpha, which block-decouples the tridiagonal with
    zero spectral weight on the spurious blocks (see
    spectral_from_tridiagonal_batched). Returns (alphas[m], betas[m], ||v0||)."""
    rdtype = pair[0].dtype
    tiny = jnp.finfo(rdtype).tiny
    nrm = jnp.sqrt(pair_norm2(pair))
    inv0 = 1.0 / jnp.maximum(nrm, tiny)
    v1 = (pair[0] * inv0, pair[1] * inv0)

    def step(carry, _):
        v_prev, v_curr, beta_prev, active, last_alpha = carry
        hr, hi = pmv(v_curr)
        alpha, _ = pair_dot(v_curr, (hr, hi))
        w = (hr - v_curr[0] * alpha - v_prev[0] * beta_prev,
             hi - v_curr[1] * alpha - v_prev[1] * beta_prev)
        beta = jnp.sqrt(pair_norm2(w))
        ok = jnp.logical_and(active, beta > tol)
        inv = jnp.where(ok, 1.0 / jnp.maximum(beta, tiny), 0.0)
        v_next = (w[0] * inv, w[1] * inv)
        alpha_out = jnp.where(active, alpha, last_alpha)
        beta_out = jnp.where(ok, beta, jnp.zeros_like(beta))
        return ((v_curr, v_next, beta_out, ok, alpha_out),
                (alpha_out, beta_out))

    zero = (v1[0] * 0.0, v1[1] * 0.0)
    init = (zero, v1, jnp.zeros((), rdtype), jnp.asarray(True),
            jnp.zeros((), rdtype))
    _, (alphas, betas) = jax.lax.scan(step, init, None, length=m)
    return alphas, betas, nrm


def lanczos_tridiag_pair(pmv, pair, lanc_m: int = 100, tol: float = 1e-12):
    """(alphas, betas[lanc_m-1], ||v0||) from an (re, im) BlockVec pair —
    the kron-scale lanczos_tridiag (ref src/Lanczos.jl:180-229). Reuse one
    pmv closure across q-points to avoid retraces."""
    alphas, betas, nrm = _pair_tridiag_scan(pmv, pair, lanc_m,
                                            jnp.asarray(tol, pair[0].dtype))
    return alphas, betas[: lanc_m - 1], nrm


@partial(jax.jit, static_argnums=(0, 4))
def _cheb_kron_scan(pmv, pair, coeffs_ri, ab, n):
    """Chebyshev-Bessel e^{-iH dt} step on BlockVec planes (the BlockVec
    mirror of solvers/planes._cheb_planes_scan; ref recurrence
    src/TimeEvolution/Chebyshev.jl:111-122).

    dtype-generic (VERDICT r4 #3): the pair may be bf16 — recurrence leaves
    STORE in the state dtype (half HBM traffic through the kernel), while
    every elementwise combine and the coefficient accumulator run f32 (XLA
    fuses the casts into the read/write passes, so the f32 arithmetic is
    free). One bf16 rounding per stored leaf per term; the accumulator is
    rounded to the state dtype once per step. For f32 states every cast is
    an identity — numerics are bit-identical to the previous f32-only form."""
    a_inv, b = ab
    sdt = pair[0].dtype
    f32 = jnp.float32

    def _lift(bv):  # leaf-wise f32 view (cast fused into the read)
        return jax.tree_util.tree_map(lambda x: x.astype(f32), bv)

    def mvr(p):
        hr, hi = pmv(p)
        shift = jax.tree_util.tree_map(
            lambda h, x: ((h.astype(f32) - b * x.astype(f32))
                          * a_inv).astype(sdt), (hr, hi), p)
        return shift

    phi_prev = pair
    c0r, c0i = coeffs_ri[0, 0], coeffs_ri[0, 1]
    c1r, c1i = coeffs_ri[1, 0], coeffs_ri[1, 1]
    pr, pi = _lift(phi_prev[0]), _lift(phi_prev[1])
    acc_r = pr * c0r - pi * c0i
    acc_i = pr * c0i + pi * c0r
    phi_curr = mvr(phi_prev)
    cr, ci = _lift(phi_curr[0]), _lift(phi_curr[1])
    acc_r = acc_r + cr * c1r - ci * c1i
    acc_i = acc_i + cr * c1i + ci * c1r

    def step(carry, c):
        p_prev, p_curr, ar, ai = carry
        nr, ni = mvr(p_curr)
        p_next = jax.tree_util.tree_map(
            lambda nx, pv: (nx.astype(f32) * 2.0
                            - pv.astype(f32)).astype(sdt),
            (nr, ni), p_prev)
        xr, xi = _lift(p_next[0]), _lift(p_next[1])
        ar = ar + xr * c[0] - xi * c[1]
        ai = ai + xr * c[1] + xi * c[0]
        return (p_curr, p_next, ar, ai), None

    if n > 2:
        lay = getattr(pmv, "layout", None)
        from ..ops.pallas_cheb import cheb_fused_enabled, cheb_scan_terms_fused

        if lay is not None and getattr(pmv, "fused", False) \
                and cheb_fused_enabled():
            # fully-fused term kernel (ops/pallas_cheb): shift + recurrence +
            # accumulator ride the kernel's DMA pipeline instead of a serial
            # XLA pass chain — same math, same per-term byte count
            acc_r, acc_i = cheb_scan_terms_fused(
                lay, pmv.tables, phi_prev, phi_curr, (acc_r, acc_i),
                coeffs_ri[2:], ab)
        else:
            (_, _, acc_r, acc_i), _ = jax.lax.scan(
                step, (phi_prev, phi_curr, acc_r, acc_i), coeffs_ri[2:]
            )
    return (acc_r.astype(sdt), acc_i.astype(sdt))


def chebyshev_time_evolve_kron(pair, pmv, dt, Ebounds, cheb_n: int = 100,
                               coeffs=None):
    """One e^{-iH dt} step on a BlockVec plane pair (cf.
    chebyshev_time_evolve_planes). Reuse ONE pmv closure across steps to
    avoid retraces."""
    from .chebyshev import chebyshev_coefficients

    if coeffs is None:
        coeffs = chebyshev_coefficients(dt, Ebounds[0], Ebounds[1], cheb_n)
    c, a, b = coeffs
    c_ri = jnp.asarray(np.stack([c.real, c.imag], axis=1), jnp.float32)
    ab = (jnp.float32(1.0 / a), jnp.float32(b))
    return _cheb_kron_scan(pmv, pair, c_ri, ab, cheb_n)


@partial(jax.jit, static_argnums=(0, 2))
def _krylov_kron_factorize(pmv, pair, m):
    nrm = jnp.sqrt(pair_norm2(pair))
    inv = 1.0 / jnp.maximum(nrm, jnp.finfo(jnp.float32).tiny)
    v1 = (pair[0] * inv, pair[1] * inv)

    def step(carry, _):
        v_prev, v_curr, beta_prev = carry
        hr, hi = pmv(v_curr)
        alpha, _ = pair_dot(v_curr, (hr, hi))
        w = (hr - v_curr[0] * alpha - v_prev[0] * beta_prev,
             hi - v_curr[1] * alpha - v_prev[1] * beta_prev)
        beta = jnp.sqrt(pair_norm2(w))
        inv = jnp.where(beta > 1e-12,
                        1.0 / jnp.maximum(beta, jnp.finfo(jnp.float32).tiny),
                        0.0)
        v_next = (w[0] * inv, w[1] * inv)
        beta_out = jnp.where(beta > 1e-12, beta, 0.0)
        return (v_curr, v_next, beta_out), (v_curr, alpha, beta_out)

    zero = (v1[0] * 0.0, v1[1] * 0.0)
    _, (V, alphas, betas) = jax.lax.scan(
        step, (zero, v1, jnp.float32(0.0)), None, length=m)
    return V, alphas, betas, nrm


def _krylov_reconstruct(V, y_r, y_i):
    """psi = sum_k (y_r + i y_i)_k V_k for scan-stacked BlockVec planes V."""
    def comb(y, plane):
        return jax.tree_util.tree_map(
            lambda leaf: jnp.tensordot(y.astype(leaf.dtype), leaf, axes=1),
            plane)

    out_r = comb(y_r, V[0]) - comb(y_i, V[1])
    out_i = comb(y_i, V[0]) + comb(y_r, V[1])
    return (out_r, out_i)


@partial(jax.jit, static_argnums=(0, 2, 4))
def _krylov_kron_evolve(pmv, pair, m, dt, renormalize):
    """e^{-iH dt} in an m-dim Krylov subspace on BlockVec planes (all-real;
    cf. planes._krylov_planes_evolve; ref src/TimeEvolution/Krylov.jl)."""
    V, alphas, betas, nrm = _krylov_kron_factorize(pmv, pair, m)
    T = jnp.diag(alphas)
    if m > 1:
        T = T + jnp.diag(betas[: m - 1], 1) + jnp.diag(betas[: m - 1], -1)
    D, Q = jnp.linalg.eigh(T)
    q0 = Q[0, :] * nrm
    y_r = Q @ (jnp.cos(D * dt) * q0)
    y_i = Q @ (-jnp.sin(D * dt) * q0)
    out = _krylov_reconstruct(V, y_r, y_i)
    if renormalize:
        n2 = jnp.sqrt(pair_norm2(out))
        inv = 1.0 / jnp.maximum(n2, jnp.finfo(jnp.float32).tiny)
        out = (out[0] * inv, out[1] * inv)
    return out


def krylov_time_evolve_kron(pair, pmv, dt, kry_m: int = 30,
                            renormalize: bool = True):
    return _krylov_kron_evolve(pmv, pair, kry_m, jnp.float32(dt), renormalize)


@partial(jax.jit, static_argnums=(0, 2, 4))
def _krylov_kron_expm_real(pmv, pair, m, tau, renormalize):
    V, alphas, betas, nrm = _krylov_kron_factorize(pmv, pair, m)
    T = jnp.diag(alphas)
    if m > 1:
        T = T + jnp.diag(betas[: m - 1], 1) + jnp.diag(betas[: m - 1], -1)
    D, Q = jnp.linalg.eigh(T)
    # shift-invariant: e^{-tau(D - Dmin)} avoids f32 overflow at large tau
    y = Q @ (jnp.exp(-tau * (D - D.min())) * (Q[0, :] * nrm))
    out = (jax.tree_util.tree_map(
        lambda leaf: jnp.tensordot(y.astype(leaf.dtype), leaf, axes=1), V[0]),
        jax.tree_util.tree_map(
        lambda leaf: jnp.tensordot(y.astype(leaf.dtype), leaf, axes=1), V[1]))
    if renormalize:
        n2 = jnp.sqrt(pair_norm2(out))
        inv = 1.0 / jnp.maximum(n2, jnp.finfo(jnp.float32).tiny)
        out = (out[0] * inv, out[1] * inv)
    return out


def krylov_imaginary_time_evolve_kron(pair, pmv, tau, kry_m: int = 30,
                                      renormalize: bool = False):
    """e^{-tau H}|pair> up to an overall scale (the spectrum is shifted by
    Emin inside for f32 range; thermal-state callers renormalize anyway).

    Stores a 2*kry_m-vector basis (scan-stacked leaves): at L=28 padded
    (0.2 GB/plane) kry_m=20 is ~8 GB and crashed the 16 GB relay worker —
    prefer chebyshev_imaginary_time_kron at large L (O(3 pairs) memory)."""
    return _krylov_kron_expm_real(pmv, pair, kry_m, jnp.float32(tau),
                                  renormalize)


@partial(jax.jit, static_argnums=(0, 3))
def _cheb_real_apply(mv, bv, coeffs, n, ab):
    """sum_k c_k T_k(H~) |bv> for REAL coefficients on one BlockVec."""
    a_inv, b = ab

    def mvr(v):
        return (mv(v) - b * v) * a_inv

    prev = bv
    acc = prev * coeffs[0]
    curr = mvr(prev)
    acc = acc + curr * coeffs[1]

    def step(carry, c):
        p, q, acc = carry
        nx = mvr(q) * 2.0 - p
        return (q, nx, acc + nx * c), None

    if n > 2:
        (_, _, acc), _ = jax.lax.scan(step, (prev, curr, acc), coeffs[2:])
    return acc


def chebyshev_imaginary_time_kron(pair, pmv, tau, Ebounds,
                                  cheb_n: int | None = None,
                                  renormalize: bool = True):
    """e^{-tau H}|pair> up to an overall positive scale via the Chebyshev
    expansion e^{-tau a x} = I_0 + 2 sum_k (-1)^k I_k(tau a) T_k(x) —
    memory O(3 plane pairs) regardless of tau (no stored Krylov basis; the
    thermal-state builder for L >= 28, where the Krylov variant's basis
    crashes the 16 GB worker). Coefficients use exponentially scaled Bessel
    I (scipy ive), so the overall e^{tau a - tau b} factor is dropped —
    exact after renormalization. cheb_n defaults to ~4*tau*a + 40 (the
    series converges superexponentially past k ~ tau*a)."""
    from scipy.special import ive

    lo, hi = Ebounds
    a = (hi - lo) / 2.0
    b = (hi + lo) / 2.0
    z = float(tau) * a
    if cheb_n is None:
        cheb_n = int(4 * z) + 40
    k = np.arange(cheb_n)
    c = (2.0 - (k == 0)) * ((-1.0) ** k) * ive(k, z)
    coeffs = jnp.asarray(c, jnp.float32)
    ab = (jnp.float32(1.0 / a), jnp.float32(b))
    mv = getattr(pmv, "mv", pmv)
    out = (_cheb_real_apply(mv, pair[0], coeffs, cheb_n, ab),
           _cheb_real_apply(mv, pair[1], coeffs, cheb_n, ab))
    if renormalize:
        inv = 1.0 / jnp.sqrt(jnp.maximum(pair_norm2(out),
                                         jnp.finfo(jnp.float32).tiny))
        out = (out[0] * inv, out[1] * inv)
    return out


def kron_energy_bounds(layout, pmv_or_mv, bounds_m: int = 40, safety=0.02,
                       key=None, v0=None):
    """(Emin, Emax) padded outward — Chebyshev diverges outside [-1, 1]
    (cf. lanczos.estimate_energy_bounds; ref src/Lanczos.jl:238-254).
    Pass `v0` when the matvec expects a non-default state form (e.g. the
    sharded BlockVec leaves)."""
    from .lanczos import lanczos_iteration, tridiag_eigh

    mv = getattr(pmv_or_mv, "mv", pmv_or_mv)
    if v0 is None:
        v0 = bv_random(layout,
                       key if key is not None else jax.random.PRNGKey(7),
                       jnp.float32)
    fac = lanczos_iteration(mv, v0, bounds_m)
    evals, _ = tridiag_eigh(fac.alphas, fac.betas, fac.m_eff)
    lo, hi = float(evals.min()), float(evals.max())
    pad = safety * 0.5 * (hi - lo) + 1e-6
    return (lo - pad, hi + pad)


def typicality_correlation_kron(
    model, beta: float, site_a: int, site_b: int, t_points,
    kry_m: int = 30, cheb_n: int = 60, Ebounds=None, key=None,
    fused: bool = True, r0=None, imag_method: str = "chebyshev",
    mesh=None, axis_name: str = "rows",
):
    """<Sz_a(t) Sz_b(0)>_beta by quantum typicality at kron BlockVec scale
    (VERDICT r3 next-7; completes BASELINE config #4 at the flagship layout).

    The kron mirror of typicality_correlation_function_planes: one random
    BlockVec plane pair -> thermal |psi_beta> via imaginary-time Krylov
    e^{-beta H/2} -> Chebyshev co-evolution of |phi> = Sz_b|psi_beta> and
    |xi> = |psi_beta> -> overlaps <xi(t)| Sz_a |phi(t)>. Sector-preserving
    observables only (Sz); zero complex dtypes. Returns complex [T] numpy.

    Pass `mesh` to run the WHOLE computation sharded (VERDICT r4 #4 — the
    fourth end-to-end sharded driver): the matvec is the fused shard_map
    kron apply, the random pair / thermal state / co-evolved states live as
    P(rows)-sharded leaves throughout, Sz_site applies are GSPMD-local
    broadcasts, and the overlaps psum. A given `r0` may be plain (it is
    shard-padded here, so mesh and no-mesh runs from the same r0 agree) or
    already in sharded form.

    Ref capability: src/TimeEvolution/QuantumTypicality.jl:33-211 (dead code
    in the reference — it cannot run at any size; SURVEY.md §2.1)."""
    from ..observables_kron import bv_apply_sz
    from ..ops.sector_kron import make_sector_kron_layout
    from .chebyshev import chebyshev_coefficients

    if model.kron_splits is None:
        raise ValueError("typicality_correlation_kron needs "
                         "layout='sector_kron'")
    lay = make_sector_kron_layout(model, model.kron_splits, model.kron_pads)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.sharded_kron_scaling import (
            shard_kron_blockvec, sharded_kron_scaling_bv_matvec_fn)

        smv, _, spec = sharded_kron_scaling_bv_matvec_fn(
            model, mesh, axis_name=axis_name, use_fused=fused)

        def pmv(pair):
            return (smv(pair[0]), smv(pair[1]))

        pmv.mv = smv
        sh = NamedSharding(mesh, P(axis_name))

        def _shard(bv):
            if any(l.shape[0] != spec.ch_pad[gi]
                   for gi, l in enumerate(bv.leaves)):
                bv = shard_kron_blockvec(bv, spec)  # pad hi axes to D*b
            return BlockVec([jax.device_put(l, sh) for l in bv.leaves])
    else:
        pmv = kron_planes_matvec_fn(lay, fused=fused)

        def _shard(bv):
            return bv
    if r0 is None:
        if key is None:
            key = jax.random.PRNGKey(0)
        kr, ki = jax.random.split(key)
        r0 = (bv_random(lay, kr, jnp.float32), bv_random(lay, ki, jnp.float32))
    r0 = (_shard(r0[0]), _shard(r0[1]))
    inv = 1.0 / jnp.sqrt(pair_norm2(r0))
    pair = (r0[0] * inv, r0[1] * inv)
    if Ebounds is None:
        v0b = _shard(bv_random(
            lay, key if key is not None else jax.random.PRNGKey(7),
            jnp.float32)) if mesh is not None else None
        Ebounds = kron_energy_bounds(lay, pmv, key=key, v0=v0b)
    if imag_method == "chebyshev":
        # O(3 pairs) memory — the large-L default (the Krylov basis at
        # L=28 padded is ~0.4 GB x kry_m and crashes the 16 GB worker)
        psi_b = chebyshev_imaginary_time_kron(pair, pmv, beta / 2.0, Ebounds,
                                              renormalize=True)
    elif imag_method == "krylov":
        psi_b = krylov_imaginary_time_evolve_kron(pair, pmv, beta / 2.0,
                                                  kry_m=kry_m,
                                                  renormalize=True)
    else:
        raise ValueError(f"unknown imag_method {imag_method!r}")
    phi = (bv_apply_sz(psi_b[0], lay, site_b),
           bv_apply_sz(psi_b[1], lay, site_b))
    xi = psi_b

    t_points = np.asarray(t_points, np.float64)
    out = np.zeros(t_points.shape[0], np.complex128)
    prev_t = 0.0
    for i, t in enumerate(t_points):
        dt = float(t - prev_t)
        if abs(dt) > 1e-15:
            coeffs = chebyshev_coefficients(dt, Ebounds[0], Ebounds[1],
                                            cheb_n)
            phi = chebyshev_time_evolve_kron(phi, pmv, dt, Ebounds,
                                             cheb_n=cheb_n, coeffs=coeffs)
            xi = chebyshev_time_evolve_kron(xi, pmv, dt, Ebounds,
                                            cheb_n=cheb_n, coeffs=coeffs)
        prev_t = float(t)
        a_phi = (bv_apply_sz(phi[0], lay, site_a),
                 bv_apply_sz(phi[1], lay, site_a))
        re, im = pair_dot(xi, a_phi)
        out[i] = float(re) + 1j * float(im)
    return out


def evolve_trajectory_kron(model, psi0, dt: float, n_steps: int,
                           cheb_n: int = 60, Ebounds=None, bounds_m: int = 40,
                           fused: bool = True, observe=None,
                           record_norm: bool = True, key=None, mesh=None,
                           axis_name: str = "rows", state_dtype=None):
    """Chebyshev trajectory on BlockVec planes with per-step observables.

    The kron-scale version of the reference's flagship demo
    (examples/example.jl:86-117): domain-wall (or given) start, n_steps of
    e^{-iH dt}, magnetization per site recorded each step. psi0 may be a
    BlockVec (real), a (re, im) BlockVec pair, or an int bitstring.
    Returns (pair, obs [n_steps, ...], info) — info carries the bounds and
    the norm drift trace (Chebyshev is not unitary at finite cheb_n; the
    reference hides this by renormalizing only in its Krylov path).

    Pass `mesh` to run the WHOLE trajectory sharded: the matvec is the
    fused shard_map kron apply (parallel/sharded_kron_scaling BlockVec
    form), the state lives as P(rows)-sharded leaves end to end, and the
    default observable is the sharded marginal magnetization (O(L^2)
    communication per measurement, no gather anywhere).

    state_dtype (VERDICT r4 #3): None resolves to model.dtype when that is
    f32/bf16 (else f32). bf16 halves the per-step HBM traffic — states
    stream bf16 through the fused kernel (measured 2x at the matvec level,
    PARITY 6i) while every recurrence combine and the coefficient
    accumulator stay f32 (_cheb_kron_scan). Accuracy class: one bf16
    rounding of the state per stored term (~4e-3 rel per apply), so expect
    observable errors ~1e-2 absolute and a norm drift bound of the same
    order over tens of steps — document per-use; pass explicit `Ebounds`
    at large L to skip the bounds solve."""
    from ..observables_kron import magnetization_per_site_kron
    from ..ops.sector_kron import make_sector_kron_layout
    from .chebyshev import chebyshev_coefficients

    if model.kron_splits is None:
        raise ValueError("evolve_trajectory_kron needs layout='sector_kron'")
    if state_dtype is None:
        state_dtype = jnp.dtype(model.dtype) if jnp.dtype(model.dtype) in (
            jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)) \
            else jnp.dtype(jnp.float32)
    sdt = jnp.dtype(state_dtype)
    if sdt == jnp.dtype(jnp.bfloat16) and mesh is not None \
            and jnp.dtype(model.dtype) != jnp.dtype(jnp.bfloat16):
        raise ValueError(
            "sharded bf16 evolution needs a model built with dtype=bfloat16 "
            "(the shard_map kernel dtype follows the model); unsharded "
            "accepts bf16 states on an f32 model")
    lay = make_sector_kron_layout(model, model.kron_splits, model.kron_pads)
    spec = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..observables_kron import szsz_matrix_kron_sharded
        from ..parallel.sharded_kron_scaling import (
            shard_kron_blockvec, sharded_kron_scaling_bv_matvec_fn)

        smv, _, spec = sharded_kron_scaling_bv_matvec_fn(
            model, mesh, axis_name=axis_name, use_fused=fused)

        def pmv(pair):
            return (smv(pair[0]), smv(pair[1]))

        pmv.mv = smv
        sh = NamedSharding(mesh, P(axis_name))

        def _shard(bv):
            return BlockVec([jax.device_put(l, sh)
                             for l in shard_kron_blockvec(bv, spec).leaves])
    else:
        pmv = kron_planes_matvec_fn(lay, fused=fused)

        def _shard(bv):
            return bv
    if isinstance(psi0, (int, np.integer)):
        psi0 = bv_basis_state(lay, int(psi0), sdt)
    if isinstance(psi0, BlockVec):
        psi0 = _shard(psi0.astype(sdt))
        zero = BlockVec([jnp.zeros_like(l) for l in psi0.leaves])
        pair = (psi0, zero)
    else:
        pair = (_shard(psi0[0].astype(sdt)), _shard(psi0[1].astype(sdt)))
    if Ebounds is None:
        v0b = None
        bf16 = sdt == jnp.dtype(jnp.bfloat16)
        if mesh is not None:
            # the shard_map kernel runs in the model dtype — the bounds
            # Lanczos must match it (bf16 dots upcast f32 in _inner_c)
            v0b = _shard(bv_random(
                lay, key if key is not None else jax.random.PRNGKey(7),
                sdt if bf16 else jnp.float32))
        # bf16 Ritz values carry ~1e-2 relative error: pad the interval
        # harder so no eigenvalue maps outside [-1, 1] (Chebyshev diverges)
        Ebounds = kron_energy_bounds(lay, pmv, bounds_m=bounds_m, key=key,
                                     v0=v0b, safety=0.05 if bf16 else 0.02)
    coeffs = chebyshev_coefficients(dt, Ebounds[0], Ebounds[1], cheb_n)
    c, a, b = coeffs
    c_ri = jnp.asarray(np.stack([c.real, c.imag], axis=1), jnp.float32)
    ab = (jnp.float32(1.0 / a), jnp.float32(b))

    if observe is None:
        if mesh is not None:
            def observe(pair, _lay):
                _, si = szsz_matrix_kron_sharded(pair, spec, mesh, axis_name)
                return si
        else:
            observe = magnetization_per_site_kron

    @jax.jit
    def obs_fn(pair):
        o = observe(pair, lay)
        return (o, pair_norm2(pair)) if record_norm else (o, jnp.float32(1.0))

    obs, norms = [], []
    for _ in range(n_steps):
        pair = _cheb_kron_scan(pmv, pair, c_ri, ab, cheb_n)
        o, n2 = obs_fn(pair)
        obs.append(np.asarray(o))
        norms.append(float(n2) ** 0.5)
    info = {"Ebounds": Ebounds, "norms": np.asarray(norms),
            "norm_drift": abs(norms[-1] - 1.0) if norms else 0.0}
    return pair, np.asarray(obs), info
