"""Compensated f32 inner products for long Krylov/Chebyshev recurrences.

TPU has no f64 (CLAUDE.md), so every dot/norm inside the Lanczos and KPM
scans rounds at f32 eps ~ 1.2e-7. XLA's reductions are tree-shaped, so the
*summation* error is only O(eps * log N); the dominant f32 error is the
per-element PRODUCT rounding plus cancellation in ill-conditioned dots
(e.g. alpha = <v|H v> after near-orthogonal subtraction). `dot2` removes the
product rounding with an error-free transform and recovers the lost low
parts, giving close to twofold (f32 x 2 ~ 48-bit) working precision at
2 extra elementwise passes (still HBM-bandwidth bound, like the naive dot).

Algorithm: Ogita-Rump-Oishi Dot2 (SIAM J. Sci. Comput. 26(6), 2005),
FMA-free form via Dekker splitting:

    (p, e) = TwoProd(x_i, y_i)   exactly: x_i * y_i = p + e
    result = sum(p) + sum(e)     with the partial sums tree-reduced by XLA

The reference needs no such machinery (Float64 CPU, src/Lanczos.jl uses
LinearAlgebra.dot); this is SURVEY.md §7 "hard part 3" — f32 numerics in
long recurrences — addressed at the dot level. Selective reorthogonalization
(the other half) lives in solvers/lanczos.py.

All functions are jit-safe and work under vmap; complex inputs are handled
as (real, imag) plane pairs so the relay backend never sees eager complex.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["two_sum", "two_prod", "dot2", "norm2", "vdot2"]

# Dekker split constant for f32: 2^ceil(24/2) + 1. Splits a into ah + al with
# ah carrying the top 12 mantissa bits, so products of halves are EXACT in f32.
_SPLIT_F32 = 4097.0


def two_sum(a, b):
    """Error-free transform: a + b = s + e exactly (Knuth TwoSum, branch-free)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _split(a):
    c = jnp.asarray(_SPLIT_F32, a.dtype) * a
    ah = c - (c - a)
    return ah, a - ah


def two_prod(a, b):
    """Error-free transform: a * b = p + e exactly (Dekker TwoProduct, no FMA)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def dot2(x, y):
    """Compensated real dot product: ~twofold f32 working precision.

    Error ~ eps^2 * cond versus the naive dot's eps * cond; for f64 inputs
    (CPU validation runs under x64) it simply adds a negligible correction.
    """
    x = jnp.ravel(x)
    y = jnp.ravel(y)
    p, e = two_prod(x, y)
    # Tree-reduce the high parts and the error parts separately; the final
    # combine orders the (small) error sum first for one fewer rounding.
    return jnp.sum(e) + jnp.sum(p)


def norm2(x):
    """Compensated 2-norm via dot2(x, x). The squares' low parts matter when
    ||x|| emerges from heavy cancellation (Lanczos beta after orthogonalization)."""
    if jnp.iscomplexobj(x):
        s = dot2(x.real, x.real) + dot2(x.imag, x.imag)
    else:
        s = dot2(x, x)
    return jnp.sqrt(jnp.maximum(s, 0))


def vdot2(x, y):
    """Compensated sesquilinear <x|y>. Complex handled as plane pairs (the
    relay backend cannot create complex intermediates eagerly; inside jit the
    lax.complex pack is fine)."""
    if jnp.iscomplexobj(x) or jnp.iscomplexobj(y):
        xr, xi = jnp.real(x), jnp.imag(x)
        yr, yi = jnp.real(y), jnp.imag(y)
        re = dot2(xr, yr) + dot2(xi, yi)
        im = dot2(xr, yi) - dot2(xi, yr)
        if jnp.iscomplexobj(x) and jnp.iscomplexobj(y):
            return jax.lax.complex(re, im)
        return jax.lax.complex(re, im)
    return dot2(x, y)
