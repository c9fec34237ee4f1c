#!/usr/bin/env python
"""L=28 Sz=0 Heisenberg S(q, omega) on ONE chip via the kron BlockVec path.

The reference's largest S(q, omega) demo is L=20, N = 184,756
(examples/example_kpmSqw.jl:11-15,44). This runs the same physics at
N = C(28,14) = 40,116,600 — 217x larger — on one v5e: restarted two-pass
Lanczos ground state + per-plane Chebyshev moments through the fused Pallas
kernel (solvers/runners.kpm_sqw_kron). Zero complex dtypes anywhere.

Usage: python examples/example_kron_sqw.py [L] [kpm_m] [nq]
Writes examples/example_kron_sqw_L{L}.png + one JSON line per stage.
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
kpm_m = int(sys.argv[2]) if len(sys.argv) > 2 else 100
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
S, sinfo = sd.kpm_sqw_kron(model, qs, omega, kpm_m=kpm_m,
                           psi0=psi, E0=E0, info=info)
t_sqw = time.time() - t0
print(json.dumps({"stage": "sqw", "kpm_m": kpm_m, "nq": nq,
                  "S_max": round(float(S.max()), 4),
                  "bounds": [round(x, 3) for x in sinfo["bounds"]],
                  "wall_s": round(t_sqw, 1)}), flush=True)

try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    im = ax.pcolormesh(np.asarray(qs), omega, S.T, shading="auto",
                       cmap="inferno")
    ax.set_xlabel("q")
    ax.set_ylabel("omega")
    ax.set_title(f"KPM S(q, omega), L={L} Sz=0 Heisenberg, one chip "
                 f"(N={lay.n_basis:,})")
    fig.colorbar(im, ax=ax, label="S(q, omega)")
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"example_kron_sqw_L{L}.png")
    fig.savefig(out, dpi=120, bbox_inches="tight")
    print(json.dumps({"stage": "plot", "file": os.path.basename(out)}),
          flush=True)
except Exception as e:  # plotting is optional on headless minimal images
    print(json.dumps({"stage": "plot", "skipped": str(e)[:200]}), flush=True)
