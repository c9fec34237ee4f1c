#!/usr/bin/env python
"""Per-round TPU evidence: scripted smoke of the real-chip paths.

Runs (on the default backend — the tunneled TPU under axon):
  1. CLI KPM S(q, omega) at L=20 Sz=0 WITHOUT precomputed bounds (exercises
     the backend-safe complex defaults end to end — VERDICT r1 item 6/8).
  2. sector_kron fused-vs-XLA matvec equivalence + slope timing at L=24.
  3. A small restarted ground state at L=24 (f32, blocks form).

Writes docs/TPU_SMOKE.json (committed) so TPU regressions — dtype limits,
relay quirks, Mosaic changes — surface mechanically instead of via hand-run
notes (VERDICT r1 weak-7).

Usage: python scripts/tpu_smoke.py [--skip-cli]
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "TPU_SMOKE.json")


def main():
    import jax

    cache = os.environ.get("BENCH_CACHE_DIR", "/root/repo/.jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    results = {"ts": time.time(), "backend": jax.default_backend(),
               "device": str(jax.devices()[0])}

    def flush():
        # incremental write: a crash mid-run (relay worker restarts happen)
        # keeps every completed stage on disk (same contract as bench.py)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    flush()

    # ---- 1. CLI KPM sqw without precomputed bounds -------------------------
    if "--skip-cli" not in sys.argv:
        t0 = time.time()
        cmd = [sys.executable, "-m", "spindynamics_tpu.cli", "sqw",
               "--method", "kpm", "--L", "20", "--sz0", "--kpm-m", "64",
               "--n-omega", "50", "--f32"]
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
        line = (r.stdout.strip().splitlines() or [""])[-1]
        try:
            payload = json.loads(line)
        except json.JSONDecodeError:
            payload = {"raw": line[-500:], "stderr": r.stderr[-500:]}
        results["cli_kpm_sqw_L20"] = {
            "rc": r.returncode, "wall_s": round(time.time() - t0, 1),
            **{k: payload.get(k) for k in ("E0", "S_max", "S_total", "sqw_s")
               if isinstance(payload, dict)},
        }
        print("cli:", results["cli_kpm_sqw_L20"], flush=True)
        flush()

    # ---- 2. fused matvec equivalence + slope timing at L=24 ----------------
    import jax.numpy as jnp

    import spindynamics_tpu as sd
    from spindynamics_tpu.ops.pallas_kron import apply_H_sector_kron_fused
    from spindynamics_tpu.ops.sector_kron import (
        apply_H_sector_kron, kron_apply_flops, make_sector_kron_layout,
        sector_kron_tables)
    from spindynamics_tpu.solvers.blockvec import BlockVec, bv_random

    L = 24
    model = sd.xxz_chain(L, Jxy=1.0, Jz=0.5, nup=L // 2, dtype=jnp.float32,
                         layout="sector_kron")
    lay = make_sector_kron_layout(model, model.kron_splits)
    tables = jax.tree_util.tree_map(jnp.asarray, sector_kron_tables(lay))
    v = bv_random(lay, jax.random.PRNGKey(0), jnp.float32)
    nrm = float(jnp.sqrt(sum(float(jnp.vdot(b, b).real) for b in v.leaves)))
    v = v * (1.0 / nrm)

    @jax.jit
    def both(leaves, tabs):
        a = apply_H_sector_kron_fused(leaves, lay, tabs)
        b = apply_H_sector_kron(leaves, None, lay, tabs)
        num = sum(jnp.sum((x - y) ** 2) for x, y in zip(a, b))
        den = sum(jnp.sum(y ** 2) for y in b)
        return jnp.sqrt(num / den)

    t0 = time.time()
    rel = float(both(v.leaves, tables))
    results["fused_vs_xla_L24_rel_l2"] = rel
    print(f"fused-vs-xla rel err {rel:.2e} ({time.time()-t0:.0f}s)",
          flush=True)
    flush()

    from functools import partial

    @partial(jax.jit, static_argnums=(2,))
    def chain(leaves, tabs, rep):
        def body(c, i):
            w = apply_H_sector_kron_fused(c, lay, tabs)
            return [x * jnp.float32(1.0 / 16.0) for x in w], None

        out, _ = jax.lax.scan(body, list(leaves), jnp.arange(rep))
        return sum(jnp.sum(x) for x in out)

    def t(rep):
        float(chain(v.leaves, tables, rep))
        t0 = time.time()
        float(chain(v.leaves, tables, rep))
        return time.time() - t0

    per_apply = max((t(10) - t(2)) / 8, 1e-9)
    nnz = lay.n_basis * (1.0 + len(model.hop_sites) / 2.0)
    results["fused_L24"] = {
        "ms_per_apply": round(per_apply * 1e3, 3),
        "gnnz_per_s": round(nnz / per_apply / 1e9, 1),
        "flops": kron_apply_flops(lay),
    }
    print("fused L24:", results["fused_L24"], flush=True)
    flush()

    # ---- 3. restarted ground state at L=24 (blocks form) -------------------
    t0 = time.time()
    E0, psi, info, _ = sd.groundstate_kron(model, lanc_m=30, cycles=3,
                                           target_residual=1e-3)
    results["groundstate_L24"] = {
        "E0_per_site": E0 / L, "residual": info["residual"],
        "cycles": info["cycles"], "polished": info.get("polished", 0),
        "wall_s": round(time.time() - t0, 1),
    }
    print("gs L24:", results["groundstate_L24"], flush=True)
    flush()

    flush()
    print("wrote", OUT)


if __name__ == "__main__":
    main()
