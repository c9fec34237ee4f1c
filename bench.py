#!/usr/bin/env python
"""Benchmark: matrix-free H|psi> throughput (the hot kernel under every solver).

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "nnz/s", "vs_baseline": ...}

- Workload: XXZ chain, Sz=0 sector run in the embedded full-space layout on the
  blocked backend (the TPU fast path), matvecs chained inside one lax.scan so
  dispatch latency cannot pollute the measurement (slope between two chain
  lengths).
- value: nonzeros of H processed per second (full-space operator:
  nnz = N_full * (1 + n_bonds / 2)).
- vs_baseline: fraction of the single-chip speed-of-light for this operator —
  an idealized fused kernel must move (3 + n_special) * N * 4 bytes per apply
  (read psi block + one partner block per block-space bond + diagonal, write
  out); baseline time = that traffic at the chip's HBM bandwidth. The reference
  package publishes no throughput numbers (BASELINE.md), so roofline fraction
  is the meaningful denominator.

Env knobs: BENCH_L (default 24), BENCH_BACKEND (blocked|tensor|pallas|ell),
BENCH_REPS (default 32).
"""

import json
import os
import sys
import time
from functools import partial


def main():
    import jax

    if os.environ.get("BENCH_PLATFORM"):
        # the ambient sitecustomize pins the TPU platform regardless of
        # JAX_PLATFORMS; an explicit in-process override is required for CPU runs
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    import jax.numpy as jnp
    import numpy as np

    import spindynamics_tpu as sd
    from spindynamics_tpu.ops.blocked import make_blocked_plan

    L = int(os.environ.get("BENCH_L", "24"))
    backend = os.environ.get("BENCH_BACKEND", "pallas")
    R1 = int(os.environ.get("BENCH_REPS", "32"))
    R0 = 4

    model = sd.xxz_chain(
        L, Jxy=1.0, Jz=0.5, nup=L // 2, dtype=jnp.float32, layout="embedded"
    )
    N = model.n_states
    nb = len(model.hop_sites)
    psi = sd.neel_state(model, dtype=jnp.float32)
    # spread amplitude so every block is nontrivial
    key = jax.random.PRNGKey(0)
    psi = psi + 0.01 * jax.random.normal(key, (N,), jnp.float32)
    psi = psi / jnp.linalg.norm(psi)

    @partial(jax.jit, static_argnums=(2,))
    def chain(psi, model, rep):
        def body(v, _):
            w = sd.apply_H(v, model, backend=backend)
            return w / jnp.linalg.norm(w), None

        v, _ = jax.lax.scan(body, psi, None, length=rep)
        return jnp.sum(v)

    float(chain(psi, model, R0))  # compile
    t0 = time.time()
    float(chain(psi, model, R0))
    tA = time.time() - t0
    float(chain(psi, model, R1))  # compile
    t0 = time.time()
    float(chain(psi, model, R1))
    tB = time.time() - t0
    per_apply = max((tB - tA) / (R1 - R0), 1e-12)

    nnz = N * (1.0 + nb / 2.0)
    nnz_per_s = nnz / per_apply

    plan = make_blocked_plan(model)
    n_special = len(plan.special)
    # speed-of-light: idealized fused kernel traffic at HBM bandwidth
    hbm_bw = float(os.environ.get("BENCH_HBM_BW", 819e9))  # v5e
    bytes_min = (3 + n_special) * N * 4
    t_light = bytes_min / hbm_bw
    vs_baseline = t_light / per_apply

    print(
        json.dumps(
            {
                "metric": f"spmv_nnz_per_s_L{L}_Sz0_embedded_{backend}",
                "value": round(nnz_per_s, 3),
                "unit": "nnz/s",
                "vs_baseline": round(vs_baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
