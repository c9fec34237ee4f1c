"""On-chip (w, t) tile study for the fused embedded Pallas kernel.

The round-4 kernel upgrades (hold-elided partner DMAs + 2-pass exact dots)
moved the L=26 bottleneck from HBM to the MXU term: at the default
w=8, t=8 the per-block matmul work is 2N(W + T + 512) flops because the
lane/sublane straddle bond (7, 8) costs a T-dot AND a W-dot. Shrinking the
tile moves that bond into row space (w=7) and shrinks the dots — at the cost
of more (and more holdable) specials. This script slope-times the chain for
several (w, t) on the real chip.

Usage: python scripts/embedded_wt_study.py  [L=26 REPS=16 WT=8:8,7:8,7:7,8:7]
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("BENCH_CACHE_DIR", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import spindynamics_tpu as sd  # noqa: E402
from spindynamics_tpu.ops.blocked import make_blocked_plan  # noqa: E402
from spindynamics_tpu.ops.pallas_matvec import (  # noqa: E402
    apply_H_pallas, pallas_pass_count)


from spindynamics_tpu.utils.profiling import slope_timer  # noqa: E402


def slope_time(fn, args, r1, r2):
    # canonical warm-both-lengths slope timing (utils/profiling)
    return max(slope_timer(fn, *args, r0=r1, r1=r2), 1e-12)


def main():
    L = int(os.environ.get("L", "26"))
    reps = int(os.environ.get("REPS", "16"))
    hbm_bw = 819e9
    f32_tflops = 35.5e12
    wt_list = [tuple(int(v) for v in tok.split(":"))
               for tok in os.environ.get("WT", "8:8,7:8,7:7,8:7").split(",")]

    model = sd.xxz_chain(L, Jxy=1.0, Jz=0.5, nup=L // 2, dtype=jnp.float32,
                         layout="embedded")
    N = model.n_states
    psi = sd.neel_state(model, dtype=jnp.float32)
    psi = psi + 0.01 * jax.random.normal(jax.random.PRNGKey(0), (N,),
                                         jnp.float32)
    psi = psi / jnp.linalg.norm(psi)
    nnz = N * (1.0 + len(model.hop_sites) / 2.0)

    for (w, t) in wt_list:
        plan = make_blocked_plan(model, w=w, t=t)

        @partial(jax.jit, static_argnums=(2,))
        def chain(psi, model, rep, plan=plan):
            def body(v, _):
                out = apply_H_pallas(v, model, plan=plan, exact_J=True)
                return out * jnp.float32(1.0 / 30.0), None

            v, _ = jax.lax.scan(body, psi, None, length=rep)
            return jnp.sum(v)

        per = slope_time(chain, (psi, model), 2, reps)
        from bench import embedded_pallas_flops

        hbm = (pallas_pass_count(plan) + 2) * N * 4 / hbm_bw
        mxu = embedded_pallas_flops(plan, N) / f32_tflops
        print(json.dumps({
            "w": w, "t": t, "per_apply_ms": round(per * 1e3, 3),
            "gnnz_s": round(nnz / per / 1e9, 1),
            "hbm_ms": round(hbm * 1e3, 3), "mxu_ms": round(mxu * 1e3, 3),
            "vs_light": round(max(hbm, mxu) / per, 4),
        }), flush=True)


if __name__ == "__main__":
    import sys

    sys.path.insert(0, "/root/repo")
    main()
