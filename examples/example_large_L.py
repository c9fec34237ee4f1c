"""Large-L ground states via the sector_kron layout (beyond the reference).

The reference tops out at L=20 (N = 184,756; examples/example_kpmSqw.jl:11).
The 3-way Kronecker-factorized compact-sector layout (ops/sector_kron.py)
runs the same physics to L=32 (N = 601,080,390) on ONE TPU chip: all-matmul
apply, BlockVec per-group state, fused Pallas hi-local kernel, restarted
two-pass Lanczos + Chebyshev-filter polish at O(3N) memory with compensated
f32 dots.

    python examples/example_large_L.py            # L=24 (default)
    python examples/example_large_L.py 28         # ~minutes on a v5e
    python examples/example_large_L.py 32         # the north-star scale

Open-chain Heisenberg (Jxy=Jz=1, the reference convention with S+S-
coefficient 1): E0/L drifts toward the thermodynamic value with 1/L
boundary corrections; each L<=12 case is oracle-checked in tests.
"""

import sys
import time

import jax.numpy as jnp

import spindynamics_tpu as sd


def main(L=24):
    nup = L // 2
    t0 = time.time()
    model = sd.xxz_chain(L, Jxy=1.0, Jz=1.0, nup=nup, dtype=jnp.float32,
                         layout="sector_kron")
    E0, psi, info, lay = sd.groundstate_kron(
        model, lanc_m=30, cycles=4, target_residual=1e-3)
    print(f"L={L} Sz=0  N={lay.n_basis:,} (padded {lay.n_states:,}) "
          f"splits={lay.splits}")
    print(f"E0 = {E0:.6f}   E0/L = {E0 / L:.6f}   "
          f"residual = {info['residual']:.2e}  cycles={info['cycles']} "
          f"polished={info.get('polished', 0)}   total {time.time()-t0:.1f} s")
    return E0, info


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 24)
