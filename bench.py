#!/usr/bin/env python
"""Benchmark: matrix-free H|psi> throughput (the hot kernel under every solver).

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "nnz/s", "vs_baseline": ...}

- Default workload (BASELINE.json headline): XXZ chain, L=28 Sz=0 sector on the
  `sector_kron` layout — the 3-way Kronecker-factorized compact-sector matvec
  (ops/sector_kron.py), the fastest path for L >= 24 and the only single-chip
  path at L >= 30. BENCH_BACKEND=pallas selects the embedded full-space fused
  kernel instead (the L < 24 fast path).
- Matvecs are chained inside one lax.scan and slope-timed between two chain
  lengths so the ~10-25 ms relay dispatch latency cannot pollute the result.
- value: nonzeros of H processed per second. For sector layouts
  nnz = C(L, nup) * (1 + n_bonds / 2); for the embedded full-space operator
  nnz = 2^L * (1 + n_bonds / 2).
- vs_baseline: fraction of the single-chip speed-of-light for the layout —
  an ideal fused kernel is bounded by max(HBM traffic, MXU flops):
  * sector_kron: traffic = 2 * N_pad * 4 bytes (read psi + write out; tables
    are VMEM-resident), flops = the layout's actual matmul flop count;
  * embedded pallas: traffic = (3 + n_special) * N * 4 bytes (see
    ops/pallas_matvec.py).
  The reference publishes no throughput numbers (BASELINE.md), so roofline
  fraction is the meaningful denominator.

Env knobs: BENCH_L (default 28), BENCH_BACKEND (sector_kron|blocked|tensor|
pallas|ell; default sector_kron), BENCH_REPS (default 16), BENCH_PLATFORM,
BENCH_HBM_BW (default v5e 819e9), BENCH_F32_TFLOPS (default v5e ~49e12).
"""

import json
import os
import time
from functools import partial


def _kron_flops(layout):
    """Actual matmul flops of one apply (2*m*n*k per contraction)."""
    fl = 0
    for gi, (k_h, k_m, k_l, ch, cm, cl, cmp, clp) in enumerate(layout.groups):
        size = ch * cmp * clp
        for p, k in ((0, k_l), (1, k_m), (2, k_h)):
            W = layout.W[p].get(k)
            if W is not None:
                fl += 2 * size * W.shape[1]
        for (g_src, pa, pb, ak, bk) in layout.cross_meta[gi]:
            A = layout.cross_pool[ak]
            B = layout.cross_pool[bk]
            (_, _, _, ch_s, _, _, cmp_s, clp_s) = layout.groups[g_src]
            ssz = ch_s * cmp_s * clp_s
            fl += 2 * ssz * A.shape[1] + 2 * ssz * B.shape[1]
    return fl


def main():
    import jax

    if os.environ.get("BENCH_PLATFORM"):
        # the ambient sitecustomize pins the TPU platform regardless of
        # JAX_PLATFORMS; an explicit in-process override is required for CPU runs
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    import jax.numpy as jnp

    import spindynamics_tpu as sd

    backend = os.environ.get("BENCH_BACKEND", "sector_kron")
    L = int(os.environ.get("BENCH_L", "28" if backend == "sector_kron" else "24"))
    R1 = int(os.environ.get("BENCH_REPS", "16"))
    R0 = 2
    hbm_bw = float(os.environ.get("BENCH_HBM_BW", 819e9))  # v5e
    f32_tflops = float(os.environ.get("BENCH_F32_TFLOPS", 49e12))

    key = jax.random.PRNGKey(0)

    if backend == "sector_kron":
        from spindynamics_tpu.ops.sector_kron import (
            apply_H_sector_kron, make_sector_kron_layout, sector_kron_tables)

        model = sd.xxz_chain(L, Jxy=1.0, Jz=0.5, nup=L // 2,
                             dtype=jnp.float32, layout="sector_kron")
        lay = make_sector_kron_layout(model, model.kron_splits)
        tables = jax.tree_util.tree_map(jnp.asarray, sector_kron_tables(lay))
        N_pad = lay.n_states
        nnz = lay.n_basis * (1.0 + len(model.hop_sites) / 2.0)

        @partial(jax.jit, static_argnums=(2,))
        def chain(psi, tables, rep):
            def body(v, _):
                w = apply_H_sector_kron(v, None, lay, tables)
                return w / jnp.linalg.norm(w), None

            v, _ = jax.lax.scan(body, psi, None, length=rep)
            return jnp.sum(v)

        psi = jax.random.normal(key, (N_pad,), jnp.float32)
        psi = psi / jnp.linalg.norm(psi)
        args = (psi, tables)
        t_light = max(2.0 * N_pad * 4 / hbm_bw, _kron_flops(lay) / f32_tflops)
        metric = f"spmv_nnz_per_s_L{L}_Sz0_sector_kron"
    else:
        from spindynamics_tpu.ops.blocked import make_blocked_plan

        model = sd.xxz_chain(
            L, Jxy=1.0, Jz=0.5, nup=L // 2, dtype=jnp.float32,
            layout="embedded",
        )
        N = model.n_states
        psi = sd.neel_state(model, dtype=jnp.float32)
        psi = psi + 0.01 * jax.random.normal(key, (N,), jnp.float32)
        psi = psi / jnp.linalg.norm(psi)

        @partial(jax.jit, static_argnums=(2,))
        def chain(psi, model, rep):
            def body(v, _):
                w = sd.apply_H(v, model, backend=backend)
                return w / jnp.linalg.norm(w), None

            v, _ = jax.lax.scan(body, psi, None, length=rep)
            return jnp.sum(v)

        args = (psi, model)
        nnz = N * (1.0 + len(model.hop_sites) / 2.0)
        n_special = len(make_blocked_plan(model).special)
        t_light = (3 + n_special) * N * 4 / hbm_bw
        metric = f"spmv_nnz_per_s_L{L}_Sz0_embedded_{backend}"

    float(chain(*args, R0))  # compile
    t0 = time.time()
    float(chain(*args, R0))
    tA = time.time() - t0
    float(chain(*args, R1))  # compile
    t0 = time.time()
    float(chain(*args, R1))
    tB = time.time() - t0
    per_apply = max((tB - tA) / (R1 - R0), 1e-12)

    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(nnz / per_apply, 3),
                "unit": "nnz/s",
                "vs_baseline": round(t_light / per_apply, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
