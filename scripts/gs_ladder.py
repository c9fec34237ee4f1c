#!/usr/bin/env python
"""f32 residual ladder: Heisenberg-chain ground states at increasing L on one
chip (VERDICT r2 item 4 — prove the compensated-dot + restart + polish
machinery where it matters, not just at L=16).

For each L: XXZ chain Jxy=Jz=1, Sz=0, sector_kron layout, restarted two-pass
Lanczos + Chebyshev-filter polish to target residual (runners.groundstate_kron,
fused Pallas hi-local kernel). Prints ONE JSON line per L as it completes
(kill-safe, like bench.py), with E0, E0/L, residual, cycles, polish count and
wall seconds. Reference parity: lanczos_groundstate
(/root/reference/src/Lanczos.jl:78-165) at up to 3254x its largest demo size.

Usage: python scripts/gs_ladder.py [L ...]      (default: 16 24 28)
  env: LANC_M (default 40), CYCLES (default 8), TARGET (default 1e-3)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

cache_dir = os.environ.get("BENCH_CACHE_DIR", "/root/repo/.jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

import spindynamics_tpu as sd

Ls = [int(a) for a in sys.argv[1:]] or [16, 24, 28]
lanc_m = int(os.environ.get("LANC_M", "40"))
cycles = int(os.environ.get("CYCLES", "8"))
target = float(os.environ.get("TARGET", "1e-3"))

for L in Ls:
    t0 = time.time()
    model = sd.xxz_chain(L, Jxy=1.0, Jz=1.0, nup=L // 2, dtype=jnp.float32,
                         layout="sector_kron")
    E0, psi, info, lay = sd.groundstate_kron(
        model, lanc_m=lanc_m, cycles=cycles, target_residual=target)
    jax.block_until_ready(psi.leaves[0])
    print(json.dumps({
        "L": L, "n_basis": lay.n_basis, "E0": round(float(E0), 6),
        "E0_per_site": round(float(E0) / L, 6),
        "residual": float(f"{info['residual']:.3e}"),
        "cycles": info.get("cycles"), "polished": info.get("polished", 0),
        "lanc_m": lanc_m, "wall_s": round(time.time() - t0, 1),
    }), flush=True)
    del psi
