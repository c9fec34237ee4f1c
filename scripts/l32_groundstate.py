"""L=32 Sz=0 Heisenberg ground state on ONE chip via the sector_kron layout.

N = C(32,16) = 601,080,390 (padded 3.0 GB f32/vector) — a 3254x larger Hilbert
space than the reference's largest demo (L=20, examples/example_kpmSqw.jl:11).
Restarted two-pass Lanczos + Chebyshev-filter polish (O(3N) memory,
solvers/lanczos.py) over the BlockVec blocks state with the fused Pallas
hi-local kernel (ops/pallas_kron.py). Compensated f32 dots keep the measured
residual honest (utils/compensated).

Run:  python scripts/l32_groundstate.py [lanc_m] [cycles] [target_residual]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import spindynamics_tpu as sd

lanc_m = int(sys.argv[1]) if len(sys.argv) > 1 else 30
cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 4
target = float(sys.argv[3]) if len(sys.argv) > 3 else 1e-3
L, nup = 32, 16

t0 = time.time()
model = sd.xxz_chain(L, Jxy=1.0, Jz=1.0, nup=nup, dtype=jnp.float32,
                     layout="sector_kron")
E0, psi, info, lay = sd.groundstate_kron(
    model, lanc_m=lanc_m, cycles=cycles, target_residual=target,
    fused=os.environ.get("FUSED", "1") == "1",
)
jax.block_until_ready(psi.leaves[0])
dt = time.time() - t0
print(f"layout: n_basis={lay.n_basis:,} n_states(pad)={lay.n_states:,} "
      f"splits={lay.splits}")
print(f"E0 = {E0:.6f}  E0/L = {E0 / L:.6f}  residual = {info['residual']:.2e} "
      f"cycles={info['cycles']} polished={info.get('polished', 0)}  "
      f"total {dt:.1f}s", flush=True)
