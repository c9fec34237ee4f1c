#!/usr/bin/env python
"""Measure sector_kron matvec on the attached accelerator vs sector_blocked.

Usage: python scripts/bench_kron.py L [L ...]   (default: 24 26)
Env: KRON_ONLY=1 to skip the sector_blocked comparison; REPS=n.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import spindynamics_tpu as sd
from spindynamics_tpu.ops.sector_kron import (
    apply_H_sector_kron, make_sector_kron_layout, sector_kron_tables)
from spindynamics_tpu.ops.sector_blocked import (
    apply_H_sector_blocked, make_sector_blocked_layout, sector_blocked_tables)
from spindynamics_tpu.utils.profiling import slope_timer


def run(L, reps, kron_only):
    nup = L // 2
    t0 = time.time()
    splits = os.environ.get("SPLITS")
    kw = {}
    if splits:
        from spindynamics_tpu.ops import sector_kron as sk

        sk.default_kron_splits = lambda L, nup=None, _s=tuple(
            int(x) for x in splits.split(",")): _s
    model = sd.xxz_chain(L, Jxy=1.0, Jz=0.5, nup=nup, dtype=jnp.float32,
                         layout="sector_kron")
    N = model.n_states
    print(f"L={L} N={N:.3e} build {time.time()-t0:.1f}s "
          f"splits={model.kron_splits}", flush=True)
    lay = make_sector_kron_layout(model, model.kron_splits)
    tables = jax.tree_util.tree_map(jnp.asarray, sector_kron_tables(lay))

    @partial(jax.jit, static_argnums=(2,))
    def chain(psi, tables, rep):
        def body(v, _):
            w = apply_H_sector_kron(v, None, lay, tables)
            return w / jnp.linalg.norm(w), None
        v, _ = jax.lax.scan(body, psi, None, length=rep)
        return jnp.sum(v)

    key = jax.random.PRNGKey(0)
    psi = jax.random.normal(key, (N,), jnp.float32)
    psi = psi / jnp.linalg.norm(psi)
    tc = time.time()
    dt = slope_timer(chain, psi, tables, r0=2, r1=2 + reps)
    nnz = N * (1.0 + len(model.hop_sites) / 2.0)
    print(f"  kron: {dt*1e3:8.2f} ms/apply  {nnz/dt/1e9:7.2f} Gnnz/s  "
          f"(compile+measure {time.time()-tc:.0f}s)", flush=True)

    if not kron_only:
        del psi, tables
        mb = sd.xxz_chain(L, Jxy=1.0, Jz=0.5, nup=nup, dtype=jnp.float32,
                          layout="sector_blocked")
        layb = make_sector_blocked_layout(
            (L, nup, mb.hop_sites,
             tuple(np.asarray(mb.hop_J, np.float64).tolist())), mb.lo_bits)
        tablesb = jax.tree_util.tree_map(jnp.asarray, sector_blocked_tables(layb))

        @partial(jax.jit, static_argnums=(3,))
        def chainb(psi, diag, tables, rep):
            def body(v, _):
                w = apply_H_sector_blocked(v, diag, layb, tables)
                return w / jnp.linalg.norm(w), None
            v, _ = jax.lax.scan(body, psi, None, length=rep)
            return jnp.sum(v)

        psib = jax.random.normal(key, (mb.n_states,), jnp.float32)
        psib = psib / jnp.linalg.norm(psib)
        tc = time.time()
        dtb = slope_timer(chainb, psib, mb.diag, tablesb, r0=2, r1=2 + reps)
        print(f"  blocked: {dtb*1e3:8.2f} ms/apply  {nnz/dtb/1e9:7.2f} Gnnz/s  "
              f"(compile+measure {time.time()-tc:.0f}s)  kron speedup "
              f"{dtb/dt:.2f}x", flush=True)


if __name__ == "__main__":
    Ls = [int(a) for a in sys.argv[1:]] or [24, 26]
    reps = int(os.environ.get("REPS", "16"))
    kron_only = os.environ.get("KRON_ONLY", "0") == "1"
    for L in Ls:
        run(L, reps, kron_only)
