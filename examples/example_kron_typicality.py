#!/usr/bin/env python
"""Finite-T spin correlations at L=28 on ONE chip by quantum typicality.

BASELINE config #4 at the flagship kron layout: C(t) = <Sz_a(t) Sz_b(0)>_beta
from ONE random BlockVec plane pair — imaginary-time Krylov thermal state,
Chebyshev co-evolution, all matvecs the fused Pallas kron kernel
(solvers/kron_evolve.typicality_correlation_kron). The reference's
typicality module is dead code that cannot run at any size
(src/TimeEvolution/QuantumTypicality.jl; SURVEY.md §2.1).

Usage: python examples/example_kron_typicality.py [L] [beta] [n_t] [t_max]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

cache = os.environ.get("BENCH_CACHE_DIR", "/root/repo/.jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

import spindynamics_tpu as sd

L = int(sys.argv[1]) if len(sys.argv) > 1 else 28
beta = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
n_t = int(sys.argv[3]) if len(sys.argv) > 3 else 6
t_max = float(sys.argv[4]) if len(sys.argv) > 4 else 2.0

t0 = time.time()
model = sd.xxz_chain(L, Jxy=1.0, Jz=1.0, nup=L // 2, dtype=jnp.float32,
                     layout="sector_kron")
N_sector = int(sd.sector_dimension(L, L // 2))
print(json.dumps({"stage": "model", "L": L, "N": N_sector, "beta": beta,
                  "s": round(time.time() - t0, 1)}), flush=True)

t0 = time.time()
ts = np.linspace(0.0, t_max, n_t)
site = L // 2
# kry_m=14: the Krylov thermal state stores a (2 x kry_m)-vector basis —
# 20 vectors (~8 GB at L=28 padded) crashed the 16 GB worker; 14 fits with
# headroom and e^{-beta H/2} converges well below f32 at this tau*width
C = sd.typicality_correlation_kron(model, beta, site, site, ts,
                                   kry_m=14, cheb_n=30)
print(json.dumps({
    "stage": "typicality", "site": site, "t": [round(t, 3) for t in ts],
    "C_real": [round(float(c.real), 7) for c in C],
    "C_imag": [round(float(c.imag), 7) for c in C],
    "s": round(time.time() - t0, 1),
}), flush=True)
# C(0) = <Sz^2>_beta must be positive and <= 1/4; |C(t)| <= C(0)
assert 0.0 < C[0].real <= 0.2500001, C[0]
assert all(abs(c) <= C[0].real + 1e-6 for c in C), C
print(json.dumps({"stage": "checks", "ok": True}), flush=True)
