"""Matrix-free H|psi> — the hot kernel (capability parity with src/Hamiltonian.jl:119-212).

The reference kernel is a threaded scalar scatter loop with per-thread N-length
buffers (src/Hamiltonian.jl:128-181). On TPU the same operator is expressed as a
race-free GATHER: because H is symmetric and every hopping bond is an involution
(state XOR mask), row i receives `Jxy * psi[rank(state_i XOR mask_b)]` whenever
bits (i_b, j_b) of state_i differ. Three backends, all jit-compatible:

  - 'dense'  : explicit H @ psi (MXU matmul). Oracle for small L; also the
               CSR/COO-equivalent explicit path required by BASELINE.json.
  - 'ell'    : gather via the precomputed ELL neighbor table `model.nbr`
               (default for sector mode).
  - 'tensor' : full mode only — psi viewed as a (2,)*L tensor; `psi[idx XOR mask]`
               is a flip (reversal) of two length-2 axes, so the whole off-diagonal
               apply is elementwise VPU work with NO gathers at all.

All backends fuse the precomputed diagonal (model.diag) into the same jit region.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..model import SpinModel

__all__ = [
    "apply_H",
    "apply_rescaled_H",
    "build_dense_H",
    "apply_H_dense",
    "apply_H_ell",
    "apply_H_tensor",
    "matvec_fn",
]


def build_dense_H(model: SpinModel) -> np.ndarray:
    """Explicit dense H (host numpy, float64) — the validation oracle.

    Mirrors the column-by-column construction used by the reference examples
    (examples/example.jl:29-37) but built directly from the bond structure."""
    states = np.asarray(model.states)
    N = states.shape[0]
    H = np.zeros((N, N), dtype=np.float64)
    H[np.arange(N), np.arange(N)] = np.asarray(model.diag, dtype=np.float64)
    hop_i = np.asarray(model.hop_i)
    hop_j = np.asarray(model.hop_j)
    hop_J = np.asarray(model.hop_J, dtype=np.float64)
    for b in range(hop_i.shape[0]):
        mask = np.uint32((1 << int(hop_i[b])) | (1 << int(hop_j[b])))
        differ = (((states >> np.uint32(hop_i[b])) ^ (states >> np.uint32(hop_j[b]))) & 1).astype(bool)
        flipped = states ^ mask
        col = np.searchsorted(states, flipped)
        rows = np.arange(N)[differ]
        cols = col[differ]
        H[rows, cols] += hop_J[b]
    return H


def apply_H_dense(psi: jax.Array, H: jax.Array) -> jax.Array:
    """H @ psi on the MXU (explicit-matrix path)."""
    if jnp.iscomplexobj(psi):
        return (H @ psi.real + 1j * (H @ psi.imag)).astype(psi.dtype)
    return H @ psi


def apply_H_ell(psi: jax.Array, model: SpinModel) -> jax.Array:
    """Gather matvec over the ELL neighbor table.

    out[n] = diag[n]*psi[n] + sum_b Jxy_b * psi[nbr[n,b]]  (nbr=-1 -> no bond).
    Race-free gather formulation of ref src/Hamiltonian.jl:159-175."""
    if model.nbr is None:
        if model.n_bonds == 0:
            return psi * model.diag.astype(psi.dtype)
        raise ValueError("model has no ELL neighbor table (build_neighbor_table=True)")
    nbr = model.nbr
    valid = nbr >= 0
    safe = jnp.where(valid, nbr, 0)
    gathered = jnp.take(psi, safe, axis=0)  # [N, nb]
    vals = jnp.where(valid, gathered, 0)
    out = psi * model.diag.astype(psi.dtype)
    out = out + vals @ model.hop_J.astype(psi.dtype)
    return out


def _tensor_axis(L: int, bit: int) -> int:
    # psi.reshape((2,)*L) row-major: axis 0 is the MOST significant bit.
    return L - 1 - bit


def apply_H_tensor(psi: jax.Array, model: SpinModel) -> jax.Array:
    """Full-mode matvec with zero gathers: psi[idx ^ mask] == double axis-flip.

    For each hopping bond on bits (i < j), view psi as a 5-D tensor
    (hi, 2, mid, 2, lo) with the two singled-out axes at bit positions j and i;
    XOR-ing both bits of the index is `jnp.flip` over those two length-2 axes,
    and the bits-differ condition broadcasts from a (2, 2) pattern. Everything
    is reshape/flip/elementwise — VPU bandwidth work, no gathers, and the
    minimal-rank view keeps XLA happy (a rank-L view would not)."""
    if model.mode not in ("full", "embedded"):
        raise ValueError("tensor backend requires a full-space layout")
    L = model.L
    out = model.diag.astype(psi.dtype) * psi
    rdtype = psi.real.dtype
    mask22 = (
        jax.lax.broadcasted_iota(jnp.int32, (2, 1, 2), 0)
        != jax.lax.broadcasted_iota(jnp.int32, (2, 1, 2), 2)
    ).astype(rdtype)[None, :, :, :, None]
    for b, (si, sj) in enumerate(model.hop_sites):
        lo_bit = min(si, sj)
        hi_bit = max(si, sj)
        # index = hi * 2^{hi_bit+1} + bj * 2^{hi_bit} + mid * 2^{lo_bit+1} + bi * 2^{lo_bit} + lo
        lo = 1 << lo_bit
        mid = 1 << (hi_bit - lo_bit - 1)
        hi = 1 << (L - 1 - hi_bit)
        t = psi.reshape(hi, 2, mid, 2, lo)
        flipped = jnp.flip(jnp.flip(t, axis=1), axis=3)
        J_b = model.hop_J[b].astype(rdtype)  # traced scalar — jit-safe
        out = out + (J_b * (mask22 * flipped)).reshape(-1)
    return out


def apply_H(psi: jax.Array, model: SpinModel, backend: str | None = None,
            exact_J: bool | None = None) -> jax.Array:
    """H|psi> (ref: src/Hamiltonian.jl:119 `apply_H!`). Dispatches by mode/backend.

    exact_J is forwarded to the pallas backend (2-pass local dots for
    bf16-exact couplings — see ops/pallas_matvec.apply_H_pallas); other
    backends ignore it."""
    if backend is None:
        if model.mode == "embedded" or (model.mode == "full" and model.nbr is None):
            # fused Pallas kernel on accelerators; blocked XLA on CPU (where
            # the Pallas interpreter would be the slowest path)
            backend = "blocked" if jax.default_backend() == "cpu" else "pallas"
        elif model.kron_splits is not None:
            backend = "sector_kron"
        elif model.lo_bits is not None:
            backend = "sector_blocked"
        else:
            backend = "ell"
    if backend == "ell":
        return apply_H_ell(psi, model)
    if backend == "tensor":
        return apply_H_tensor(psi, model)
    if backend == "blocked":
        from .blocked import apply_H_blocked

        return apply_H_blocked(psi, model)
    if backend == "pallas":
        from .pallas_matvec import apply_H_pallas

        return apply_H_pallas(psi, model, exact_J=exact_J)
    if backend == "sector_blocked":
        from .sector_blocked import apply_H_sector_blocked, make_sector_blocked_layout

        lay = make_sector_blocked_layout(
            (model.L, model.nup, model.hop_sites,
             tuple(np.asarray(model.hop_J, np.float64).tolist())),
            model.lo_bits,
        )
        return apply_H_sector_blocked(psi, model.diag, lay)
    if backend == "sector_kron":
        from .sector_kron import apply_H_sector_kron, make_sector_kron_layout

        lay = make_sector_kron_layout(model, model.kron_splits)
        # diag=None: the layout's factored diagonal (per-part vectors) saves
        # an N-sized diag read per apply
        return apply_H_sector_kron(psi, None, lay)
    raise ValueError(f"unknown backend {backend!r}")


def apply_rescaled_H(
    psi: jax.Array, model: SpinModel, a, b, backend: str | None = None
) -> jax.Array:
    """(H psi - b psi) / a for Chebyshev methods (ref: src/Hamiltonian.jl:197-212)."""
    hpsi = apply_H(psi, model, backend=backend)
    inv_a = 1.0 / a
    return (hpsi - psi * jnp.asarray(b, hpsi.real.dtype)) * jnp.asarray(
        inv_a, hpsi.real.dtype
    )


def matvec_fn(model: SpinModel, backend: str | None = None):
    """Return a jit-friendly closure psi -> H psi for the solver layer."""
    return partial(apply_H, model=model, backend=backend)
