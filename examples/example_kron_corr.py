#!/usr/bin/env python
"""L=24 Sz=0 T=0 site-pair correlation matrix C[i,j,omega] on ONE chip.

The reference's kpm_correlation_matrix (src/TimeEvolution/KPM.jl:214-235)
loops L^2 serial KPM recurrences over flat Float64 vectors at L <= 20; this
runs the kron BlockVec version (runners.kpm_correlation_matrix_kron) at
N = C(24,12) = 2,704,156: per B-site Chebyshev recurrences through the fused
Pallas kernel with moments against ALL A-sites in one state pass
(observables_kron.bv_site_moments marginal trick), then the spatial Fourier
transform S(q, omega) (kpm_structure_factor; ref `Sqw`, :239-248).

Usage: python examples/example_kron_corr.py [L] [n_moments] [n_sites]
Writes examples/example_kron_corr_L{L}.png + one JSON line per stage.
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

L = int(sys.argv[1]) if len(sys.argv) > 1 else 24
n = int(sys.argv[2]) if len(sys.argv) > 2 else 150
n_sites = int(sys.argv[3]) if len(sys.argv) > 3 else 6

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

# B-sites around the chain center; A runs over all L sites in one pass
sites = list(range(L // 2 - n_sites // 2, L // 2 + (n_sites + 1) // 2))
omega = np.linspace(float(E0) - 1.0, float(E0) + 5.0, 120)
t0 = time.time()
C, cinfo = sd.kpm_correlation_matrix_kron(model, omega, n=n, psi0=psi,
                                          E0=E0, info=info, sites=sites)
t_c = time.time() - t0
print(json.dumps({"stage": "corr_matrix", "n": n, "sites": sites,
                  "C_max": round(float(C.max()), 5),
                  "wall_s": round(t_c, 1)}), flush=True)

try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    j0 = sites.index(L // 2)
    im = axes[0].pcolormesh(np.arange(L), omega - float(E0), C[:, j0, :].T,
                            shading="auto", cmap="inferno")
    axes[0].set_xlabel("site i")
    axes[0].set_ylabel("omega - E0")
    axes[0].set_title(f"|S_ij(omega)|, j={L // 2}, L={L} "
                      f"(N={lay.n_basis:,})")
    fig.colorbar(im, ax=axes[0])
    axes[1].plot(omega - float(E0), C[L // 2, j0, :], label="i=j (local)")
    # i=j+2: odd separations carry NEGATIVE (staggered) SzSz weight, which
    # the reference's clamp-nonnegative convention zeroes
    # (src/TimeEvolution/KPM.jl evaluate_chebyshev_series; mirrored here) —
    # even separations show the genuine off-site spectrum
    axes[1].plot(omega - float(E0), C[L // 2 + 2, j0, :], label="i=j+2")
    axes[1].set_xlabel("omega - E0")
    axes[1].set_ylabel("|S_ij(omega)|")
    axes[1].legend()
    fig.tight_layout()
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"example_kron_corr_L{L}.png")
    fig.savefig(out, dpi=120, bbox_inches="tight")
    print(json.dumps({"stage": "plot", "file": os.path.basename(out)}),
          flush=True)
except Exception as e:  # plotting is optional on headless minimal images
    print(json.dumps({"stage": "plot", "skipped": str(e)[:200]}), flush=True)
