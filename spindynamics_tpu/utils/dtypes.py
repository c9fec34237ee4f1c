"""Dtype helpers."""

import numpy as np
import jax.numpy as jnp


def real_dtype(dtype):
    """Real counterpart of a (possibly complex) dtype WITHOUT creating a device
    array: zero-sized jnp.zeros hits UNIMPLEMENTED on some PJRT backends."""
    return np.empty(0, jnp.dtype(dtype)).real.dtype
