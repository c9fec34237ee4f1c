"""BlockVec: a state vector stored as per-group tensors (the TPU-fast form).

The sector_kron layout's flat vector forces group views of shape
[.., q, 128] with q = C_l_pad/128, usually < 8; TPU tiles pad the minor-2 dim
to 8, so every HBM pass over such views moves up to 2x the logical bytes
(measured: a copy pass over the flat L=32 state costs 22 ms against a 7.3 ms
roofline). Storing the state as a LIST of rank-3 group tensors
[C_h, C_m_pad, C_l_pad] gives full native (8, 128) tiles — every pass at true
bandwidth — and removes the per-apply concatenate entirely.

BlockVec wraps that list as a registered pytree with vector-space operators,
so the scan-based solvers (solvers/lanczos.py etc.) run on it unchanged
through their _inner_c/_norm_c/operator call sites. Scalars broadcast; all
ops are leaf-wise; jit/scan/donation work because it is a pytree.

The reference has no analog (flat Float64 Vectors, src/Lanczos.jl); this is
pure TPU-layout engineering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["BlockVec", "bv_zeros_like", "bv_random", "bv_where_mask",
           "bv_basis_state", "bv_matvec_fn"]


@jax.tree_util.register_pytree_node_class
class BlockVec:
    """List-of-arrays state with vector-space operators (leaf-wise)."""

    __slots__ = ("leaves",)

    def __init__(self, leaves):
        self.leaves = list(leaves)

    # -- pytree protocol ------------------------------------------------------
    def tree_flatten(self):
        return self.leaves, None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        del aux
        return cls(leaves)

    # -- properties -----------------------------------------------------------
    @property
    def dtype(self):
        return self.leaves[0].dtype

    @property
    def size(self):
        return sum(l.size for l in self.leaves)

    def astype(self, dtype):
        return BlockVec([l.astype(dtype) for l in self.leaves])

    # -- arithmetic -----------------------------------------------------------
    def _binop(self, other, f):
        if isinstance(other, BlockVec):
            return BlockVec([f(a, b) for a, b in zip(self.leaves, other.leaves)])
        return BlockVec([f(a, other) for a in self.leaves])

    def __add__(self, other):
        return self._binop(other, lambda a, b: a + b)

    def __radd__(self, other):
        return self._binop(other, lambda a, b: b + a)

    def __sub__(self, other):
        return self._binop(other, lambda a, b: a - b)

    def __rsub__(self, other):
        return self._binop(other, lambda a, b: b - a)

    def __mul__(self, other):
        return self._binop(other, lambda a, b: a * _cast(b, a.dtype))

    def __rmul__(self, other):
        return self.__mul__(other)

    def __truediv__(self, other):
        return self._binop(other, lambda a, b: a / _cast(b, a.dtype))

    def __neg__(self):
        return BlockVec([-a for a in self.leaves])

    @property
    def real(self):
        return BlockVec([a.real for a in self.leaves])

    @property
    def imag(self):
        return BlockVec([a.imag for a in self.leaves])

    def conj(self):
        return BlockVec([a.conj() for a in self.leaves])


def _cast(s, dtype):
    """Cast a scalar operand to the leaf dtype (mirrors x * s.astype(dtype))."""
    try:
        return s.astype(dtype)
    except AttributeError:
        return s


def bv_zeros_like(x):
    if isinstance(x, BlockVec):
        return BlockVec([jnp.zeros_like(l) for l in x.leaves])
    return jnp.zeros_like(x)


def bv_where_mask(mask, x):
    """x where mask (leaf-wise) else 0 — for valid-subspace masking."""
    if isinstance(x, BlockVec):
        return BlockVec([jnp.where(m, l, 0)
                         for m, l in zip(mask.leaves, x.leaves)])
    return jnp.where(mask, x, 0)


def bv_random(layout, key, dtype=jnp.float32, masked: bool = True):
    """Random BlockVec over a SectorKronLayout, zero in tile-pad slots.

    The pad slots are an invariant null subspace of the apply (zero operator
    rows/cols), so zeroing them once at the start keeps them exactly zero."""
    from ..ops.sector_kron import PAD_SENTINEL

    leaves = []
    keys = jax.random.split(key, len(layout.groups))
    for k, (k_h, k_m, k_l, ch, cm, cl, cmp, clp) in zip(keys, layout.groups):
        x = jax.random.normal(k, (ch, cmp, clp), dtype)
        if masked and (cmp != cm or clp != cl):
            x = x.at[:, cm:, :].set(0)
            x = x.at[:, :, cl:].set(0)
        leaves.append(x)
    del PAD_SENTINEL
    return BlockVec(leaves)


def bv_basis_state(layout, bitstring: int, dtype=jnp.float32) -> BlockVec:
    """One-hot |bitstring> as a BlockVec (kron analog of
    models.initial_states.basis_state_vector — ref src/InitialStates.jl)."""
    from .. import basis as basis_mod
    from ..ops.sector_kron import kron_part_perms

    L1, L2, L3 = layout.splits
    perms = kron_part_perms(layout.splits)

    def internal(sub, Lp, perm):
        v = 0
        for rel in range(Lp):
            v |= ((sub >> rel) & 1) << perm[rel]
        return v

    lo = internal(bitstring & ((1 << L1) - 1), L1, perms[0])
    mid = internal((bitstring >> L1) & ((1 << L2) - 1), L2, perms[1])
    hi = internal(bitstring >> (L1 + L2), L3, perms[2])
    k_h = bin(hi).count("1")
    k_m = bin(mid).count("1")
    k_l = bin(lo).count("1")
    if k_h + k_m + k_l != layout.nup:
        raise ValueError(
            f"state {bitstring:#x} has wrong magnetization for nup={layout.nup}")
    leaves = []
    for (gkh, gkm, gkl, ch, cm, cl, cmp, clp) in layout.groups:
        leaf = jnp.zeros((ch, cmp, clp), dtype)
        if (gkh, gkm) == (k_h, k_m):
            leaf = leaf.at[
                basis_mod.rank_state(hi, L3, k_h),
                basis_mod.rank_state(mid, L2, k_m),
                basis_mod.rank_state(lo, L1, k_l)].set(1)
        leaves.append(leaf)
    return BlockVec(leaves)


def bv_matvec_fn(layout, tables=None):
    """H-apply closure on BlockVec states over a SectorKronLayout."""
    from ..ops.sector_kron import apply_H_sector_kron, _device_tables

    if tables is None:
        tables = _device_tables(layout)

    def matvec(bv):
        return BlockVec(apply_H_sector_kron(bv.leaves, None, layout, tables))

    return matvec
