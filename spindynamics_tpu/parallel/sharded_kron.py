"""Multi-chip sector_kron matvec: row-sharded flat state over a 1-D mesh.

The kron layout (ops/sector_kron.py) was designed for this: group tensors are
(8, 128)-tile padded, so every group offset and every group size is a multiple
of 1024 and the flat state's [R, 128] row view splits into equal contiguous
per-device blocks for any n_devices <= 8 (and any power of two dividing
n_states/128). Each group's MAJOR axis in the row view is its hi axis, so a
flat row partition is (up to group-boundary straddle) a partition of every
group on the axis the layout reserves for sharding — the hi contraction
W_hi[C_h, C_h] and the hi-crossing one-hot factors are plain matmuls on that
axis, which GSPMD turns into all-gather/reduce-scatter collectives over ICI;
the mid/lo contractions and the factored diagonal are shard-local.

We therefore run the SAME apply under jit with row-sharded in/out specs and
let XLA SPMD place the collectives (the scaling-book recipe: pick a mesh,
annotate shardings, let XLA insert collectives). Tables are threaded as
explicit REPLICATED jit arguments — they are tiny (27 MB at L=32) and the
remote compiler serializes captured constants into its request (CLAUDE.md).

Reference parity: distributes apply_H! (src/Hamiltonian.jl:119-184) over
devices — the reference's only analog is Base.Threads over basis indices
(src/Hamiltonian.jl:132, SURVEY.md §2.3).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..model import SpinModel
from ..ops.sector_kron import (
    apply_H_sector_kron,
    make_sector_kron_layout,
    sector_kron_tables,
)
from .mesh import ROWS


def shardable_devices(layout, max_devices: int) -> int:
    """Largest n <= max_devices such that the flat row view splits evenly."""
    rows = layout.n_states // 128 if layout.pads[1] % 128 == 0 else layout.n_states
    n = max_devices
    while n > 1 and rows % n:
        n -= 1
    return n


def sharded_kron_matvec_fn(model: SpinModel, mesh, axis_name: str = ROWS):
    """Build a multi-device matvec over the model's kron layout.

    Returns (matvec, layout). `matvec(psi)` takes/returns the flat kron-order
    state (length layout.n_states) with sharding P(axis_name) on the row axis;
    unsharded inputs are accepted (jit reshards on entry).
    """
    if model.kron_splits is None:
        raise ValueError("model must be built with layout='sector_kron'")
    layout = make_sector_kron_layout(model, model.kron_splits, model.kron_pads)
    n_dev = 1
    for s in mesh.shape.values():
        n_dev *= s
    if shardable_devices(layout, n_dev) != n_dev:
        raise ValueError(
            f"n_states={layout.n_states} rows do not split over {n_dev} devices"
        )
    sh = NamedSharding(mesh, P(axis_name))
    rep = NamedSharding(mesh, P())
    tables = jax.device_put(
        jax.tree_util.tree_map(jnp.asarray, sector_kron_tables(layout)), rep
    )

    @partial(jax.jit, out_shardings=sh)
    def _mv(psi, tabs):
        psi = jax.lax.with_sharding_constraint(psi, sh)
        return apply_H_sector_kron(psi, None, layout, tabs)

    def matvec(psi):
        return _mv(psi, tables)

    return matvec, layout
