"""L=32 Sz=0 Heisenberg ground state on ONE chip via the sector_kron layout.

N = C(32,16) = 601,080,390 (padded 2.5 GB f32/vector) — a 3254x larger Hilbert
space than the reference's largest demo (L=20, examples/example_kpmSqw.jl:11).
Restarted two-pass Lanczos (O(3N) memory, solvers/lanczos.py) over the
all-matmul kron matvec (ops/sector_kron.py, ~199 ms/apply).

Run:  python scripts/l32_groundstate.py [lanc_m] [cycles]
"""

import sys
import time

import jax
import jax.numpy as jnp

import spindynamics_tpu as sd
from spindynamics_tpu.ops.sector_kron import (
    apply_H_sector_kron,
    make_sector_kron_layout,
    sector_kron_tables,
)

lanc_m = int(sys.argv[1]) if len(sys.argv) > 1 else 30
cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 3
L, nup = 32, 16

t0 = time.time()
model = sd.xxz_chain(L, Jxy=1.0, Jz=1.0, nup=nup, dtype=jnp.float32,
                     layout="sector_kron")
lay = make_sector_kron_layout(model, model.kron_splits)
tables = jax.tree_util.tree_map(jnp.asarray, sector_kron_tables(lay))
print(f"layout: n_basis={lay.n_basis:,} n_states(pad)={lay.n_states:,} "
      f"splits={lay.splits} build {time.time()-t0:.1f}s", flush=True)


def mv(v):
    return apply_H_sector_kron(v, None, lay, tables)


t0 = time.time()
E0, psi, info = sd.lanczos_groundstate_restarted(
    mv, lay.n_states, lanc_m=lanc_m, cycles=cycles, dtype=jnp.float32,
    mask=model.valid_mask(), target_residual=5e-3,
)
jax.block_until_ready(psi)
dt = time.time() - t0
print(f"E0 = {E0:.6f}  E0/L = {E0 / L:.6f}  residual = {info['residual']:.2e} "
      f"m_eff={info['m_eff']} cycles={info['cycles']}  solve {dt:.1f}s",
      flush=True)
