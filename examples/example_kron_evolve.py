#!/usr/bin/env python
"""L=28 Sz=14 domain-wall magnetization dynamics on ONE chip (BlockVec kron).

The reference's flagship demo — domain-wall melting, per-site magnetization
per step (examples/example.jl:86-117, artifact
magnetization_comparison_L14_nup12.png) — runs there at L=14, N=91. This is
the same physics at N = C(28,14) = 40,116,600 on one v5e: the state is a
(re, im) BlockVec plane pair, every matvec the fused Pallas kron kernel, each
step one Chebyshev-Bessel scan (solvers/kron_evolve). Zero complex dtypes.

Usage: python examples/example_kron_evolve.py [L] [n_steps] [dt] [cheb_n]
Writes examples/example_kron_evolve_L{L}.png + JSON lines per stage.
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
from spindynamics_tpu.models.initial_states import domain_wall_bitstring

L = int(sys.argv[1]) if len(sys.argv) > 1 else 28
n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 60
dt = float(sys.argv[3]) if len(sys.argv) > 3 else 0.1
cheb_n = int(sys.argv[4]) if len(sys.argv) > 4 else 30

t0 = time.time()
model = sd.xxz_chain(L, Jxy=1.0, Jz=1.0, nup=L // 2, dtype=jnp.float32,
                     layout="sector_kron")
N_sector = int(sd.sector_dimension(L, L // 2))
print(json.dumps({"stage": "model", "L": L, "nup": L // 2,
                  "N": N_sector, "n_states_padded": model.n_states,
                  "s": round(time.time() - t0, 1)}),
      flush=True)

t0 = time.time()
pair, obs, info = sd.evolve_trajectory_kron(
    model, domain_wall_bitstring(model), dt, n_steps, cheb_n=cheb_n)
sz_drift = float(np.abs(obs.sum(axis=1)).max())
print(json.dumps({
    "stage": "trajectory", "steps": n_steps, "dt": dt, "cheb_n": cheb_n,
    "s": round(time.time() - t0, 1),
    "steps_per_s": round(n_steps / (time.time() - t0), 3),
    "norm_drift_total": round(float(abs(info["norms"][-1] - 1.0)), 8),
    "sz_conservation_max_abs": sz_drift,
    "Ebounds": [round(b, 4) for b in info["Ebounds"]],
}), flush=True)

try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4.2), constrained_layout=True)
    t = (1 + np.arange(n_steps)) * dt
    im = ax.imshow(obs.T, aspect="auto", origin="lower", cmap="RdBu_r",
                   vmin=-0.5, vmax=0.5,
                   extent=[t[0], t[-1], -0.5, L - 0.5])
    ax.set_xlabel("t")
    ax.set_ylabel("site i")
    ax.set_title(
        f"domain-wall melting, L={L} Sz=0 Heisenberg "
        f"(N={N_sector:,}), one TPU chip")
    fig.colorbar(im, ax=ax, label=r"$\langle S^z_i \rangle$")
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"example_kron_evolve_L{L}.png")
    fig.savefig(out, dpi=130)
    print(json.dumps({"stage": "plot", "artifact": out}), flush=True)
    np.savez(out.replace(".png", ".npz"), magnetization=obs,
             norms=info["norms"])
except Exception as e:  # matplotlib optional
    print(json.dumps({"stage": "plot", "skipped": str(e)}), flush=True)
