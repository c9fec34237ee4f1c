#!/usr/bin/env python
"""Per-term timing of the sector_kron apply: diag / Wlo / Wmid / Whi / cross.

Uses the REAL apply with its `terms` profiling hook, so numbers reflect the
production code path (pooled cross factors, rank-4 lane-tiled views, factored
diagonal).

Usage: python scripts/kron_profile.py [L] [reps]
  env: SPLITS=11,11,10  WHICH=diag,lo,mid,hi,cross,all  PLATFORM=cpu
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PLATFORM"])

import jax.numpy as jnp

from spindynamics_tpu.ops.sector_kron import (
    apply_H_sector_kron, kron_apply_flops, make_sector_kron_layout,
    sector_kron_tables, default_kron_splits)


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 28
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    nup = L // 2
    splits = (tuple(int(x) for x in os.environ["SPLITS"].split(","))
              if os.environ.get("SPLITS") else default_kron_splits(L))
    hop = tuple((i, i + 1) for i in range(L - 1))
    lay = make_sector_kron_layout((L, nup, hop, tuple(1.0 for _ in hop)),
                                  splits, field=None,
                                  zz_sites=hop, zz_J=tuple(0.5 for _ in hop))
    N = lay.n_states
    print(f"L={L} splits={splits} N_pad={N:.3e} groups={len(lay.groups)} "
          f"flops/apply={kron_apply_flops(lay):.3e}", flush=True)
    tables = jax.tree_util.tree_map(jnp.asarray, sector_kron_tables(lay))

    blocks = bool(int(os.environ.get("BLOCKS", "0")))

    @partial(jax.jit, static_argnums=(2, 3))
    def chain(psi, tables, which, rep):
        def body(v, _):
            w = apply_H_sector_kron(v, None, lay, tables, terms=which)
            if blocks:
                n = jnp.sqrt(sum(jnp.vdot(b, b).real for b in w))
                return [b / n.astype(b.dtype) for b in w], None
            return w / jnp.linalg.norm(w), None

        v, _ = jax.lax.scan(body, psi, None, length=rep)
        return (sum(jnp.sum(b) for b in v) if blocks else jnp.sum(v))

    psi = jax.random.normal(jax.random.PRNGKey(0), (N,), jnp.float32)
    psi = psi / jnp.linalg.norm(psi)
    if blocks:
        from spindynamics_tpu.ops.sector_kron import flat_to_blocks
        psi = jax.jit(lambda p: flat_to_blocks(p, lay))(psi)
        psi = [jax.block_until_ready(b) for b in psi]
    whichs = os.environ.get("WHICH", "diag;lo;mid;hi;cross;all").split(";")
    r0 = 2
    for which in whichs:
        t0 = time.time()
        float(chain(psi, tables, which, r0))
        t1 = time.time()
        float(chain(psi, tables, which, r0))
        tA = time.time() - t1
        float(chain(psi, tables, which, reps))
        t2 = time.time()
        float(chain(psi, tables, which, reps))
        tB = time.time() - t2
        dt = (tB - tA) / (reps - r0)
        print(f"  {which:16s} {dt*1e3:8.2f} ms/apply  "
              f"(compiles {t1-t0:.0f}s, wall {time.time()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
