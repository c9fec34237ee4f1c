"""Complex-array boundary helpers for backends with partial dtype support.

The axon-relayed TPU backend in this environment cannot create or transfer
complex (or bool/uint32) BUFFERS at the PJRT boundary, while complex arithmetic
INSIDE an XLA program is fine (it decomposes to real ops). These helpers keep
solver code written in natural complex form and adapt only the jit boundary:

  - planes <-> complex converters (host-side and in-graph)
  - `wrap_complex_io(fn)`: wraps a function whose complex array arguments /
    outputs are exchanged as f32 [2, ...] real/imag plane stacks across the
    jit boundary.
  - `to_host(x)`: robust device->host fetch (splits complex into planes,
    upcasts bool/uint32 to f32/int32 before the transfer).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "planes_from_complex",
    "complex_from_planes",
    "wrap_complex_io",
    "to_host",
]


def planes_from_complex(x):
    """complex array -> real [2, ...] plane stack (in-graph or host)."""
    x = jnp.asarray(x)
    if not jnp.iscomplexobj(x):
        return jnp.stack([x, jnp.zeros_like(x)])
    return jnp.stack([jnp.real(x), jnp.imag(x)])


def complex_from_planes(p, dtype=jnp.complex64):
    """real [2, ...] plane stack -> complex array (in-graph)."""
    return (p[0] + 1j * p[1]).astype(dtype)


def wrap_complex_io(fn, cdtype=jnp.complex64):
    """Wrap `fn(psi_complex, *args, **kw) -> psi_complex` so the wrapped
    version exchanges f32 [2, N] plane stacks instead. Compose with jax.jit to
    keep every complex buffer strictly inside the compiled program."""

    @functools.wraps(fn)
    def wrapped(planes, *args, **kwargs):
        psi = complex_from_planes(planes, cdtype)
        out = fn(psi, *args, **kwargs)
        return planes_from_complex(out)

    return wrapped


def to_host(x) -> np.ndarray:
    """Device->host fetch that survives backends without complex/bool/uint32
    buffer transfers."""
    x = jnp.asarray(x)
    if jnp.iscomplexobj(x):
        rd = jnp.float32 if x.dtype == jnp.complex64 else jnp.float64
        re = np.asarray(jnp.real(x).astype(rd))
        im = np.asarray(jnp.imag(x).astype(rd))
        return re + 1j * im
    if x.dtype == jnp.bool_:
        return np.asarray(x.astype(jnp.int32)) != 0
    if x.dtype in (jnp.dtype(jnp.uint32), jnp.dtype(jnp.uint16)):
        return np.asarray(x.astype(jnp.int64)).astype(np.uint32)
    return np.asarray(x)
