#!/usr/bin/env python
"""Per-term timing of the sector_kron apply: diag / Wlo / Wmid / Whi / cross.

Usage: SPLITS=11,9,8 python scripts/kron_profile.py 28
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
    _contract, make_sector_kron_layout, sector_kron_tables)
from spindynamics_tpu.utils.profiling import slope_timer


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 28
    nup = L // 2
    splits = tuple(int(x) for x in os.environ.get("SPLITS", "11,9,8").split(","))
    lay = make_sector_kron_layout(
        (L, nup, tuple((i, i + 1) for i in range(L - 1)),
         tuple(1.0 for _ in range(L - 1))), splits)
    N = lay.n_states
    print(f"L={L} splits={splits} N={N:.3e} groups={len(lay.groups)}")
    tables = jax.tree_util.tree_map(jnp.asarray, sector_kron_tables(lay))

    def term_apply(psi, tables, which):
        if which == "diagflat":
            # no group reshapes at all — pure elementwise on the flat vector
            return psi * 1.000001
        if which == "diagslice":
            # slice + flat multiply + concat, no reshape
            outs = []
            for gi, (_, _, _, ch, _, _, cm, cl) in enumerate(lay.groups):
                o = lay.offsets[gi]
                outs.append(psi[o : o + ch * cm * cl] * 1.000001)
            return jnp.concatenate(outs)
        G = []
        for gi, (_, _, _, ch, _, _, cm, cl) in enumerate(lay.groups):
            o = lay.offsets[gi]
            G.append(psi[o : o + ch * cm * cl].reshape(ch, cm, cl))
        outs = []
        for gi, (k_h, k_m, k_l, ch, _, _, cm, cl) in enumerate(lay.groups):
            acc = G[gi] * 1.000001  # stand-in for the diag elementwise pass
            if which in ("all", "lo") and k_l in tables["W"][0]:
                acc = acc + _contract(G[gi], tables["W"][0][k_l], 0, jnp.float32)
            if which in ("all", "mid") and k_m in tables["W"][1]:
                acc = acc + _contract(G[gi], tables["W"][1][k_m], 1, jnp.float32)
            if which in ("all", "hi") and k_h in tables["W"][2]:
                acc = acc + _contract(G[gi], tables["W"][2][k_h], 2, jnp.float32)
            if which in ("all", "cross"):
                for (g_src, pa, pb), (A, B) in zip(lay.cross_meta[gi],
                                                   tables["cross"][gi]):
                    T = G[g_src]
                    ra = A.shape[1] / A.shape[0]
                    rb = B.shape[1] / B.shape[0]
                    if ra <= rb:
                        T = _contract(T, A, pa, jnp.float32)
                        T = _contract(T, B, pb, jnp.float32)
                    else:
                        T = _contract(T, B, pb, jnp.float32)
                        T = _contract(T, A, pa, jnp.float32)
                    acc = acc + T
            outs.append(acc.reshape(-1))
        return jnp.concatenate(outs)

    @partial(jax.jit, static_argnums=(2, 3))
    def chain(psi, tables, which, rep):
        def body(v, _):
            w = term_apply(v, tables, which)
            return w / jnp.linalg.norm(w), None
        v, _ = jax.lax.scan(body, psi, None, length=rep)
        return jnp.sum(v)

    psi = jax.random.normal(jax.random.PRNGKey(0), (N,), jnp.float32)
    psi = psi / jnp.linalg.norm(psi)
    whichs = os.environ.get(
        "WHICH", "diagonly,lo,mid,hi,cross,all").split(",")
    for which in whichs:
        t0 = time.time()
        dt = slope_timer(chain, psi, tables, which, r0=2, r1=10)
        print(f"  {which:8s} {dt*1e3:8.2f} ms  (wall {time.time()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
