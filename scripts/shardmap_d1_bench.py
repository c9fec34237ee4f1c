"""D=1 shard_map fused-kron apply on the real chip (VERDICT r3 #1 done-bar).

Measures parallel/sharded_kron_scaling's fused path on a ONE-device mesh at
the flagship size and compares with the direct fused-kernel rate: the D=1
variant runs the identical Mosaic modules (shifted-BlockSpec crossh) plus the
shard_map plumbing and trivial psum_scatters, so per-chip parity here means a
pod run pays only the genuine collective costs.

Usage: L=32 REPS=8 python scripts/shardmap_d1_bench.py
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("BENCH_CACHE_DIR", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

import spindynamics_tpu as sd  # noqa: E402
from spindynamics_tpu.parallel.sharded_kron_scaling import (  # noqa: E402
    shard_kron_blockvec, sharded_kron_scaling_bv_matvec_fn)
from spindynamics_tpu.solvers.blockvec import BlockVec, bv_random  # noqa: E402
from spindynamics_tpu.ops.sector_kron import (  # noqa: E402
    make_sector_kron_layout)


def main():
    L = int(os.environ.get("L", "32"))
    reps = int(os.environ.get("REPS", "8"))
    dtype = jnp.bfloat16 if os.environ.get("DTYPE") == "bf16" else jnp.float32
    m = sd.xxz_chain(L, Jxy=1.0, Jz=0.5, nup=L // 2, dtype=dtype,
                     layout="sector_kron")
    mesh = Mesh(np.array(jax.devices()[:1]), ("rows",))
    mv, lay, spec = sharded_kron_scaling_bv_matvec_fn(m, mesh, use_fused=True)
    v0 = bv_random(lay, jax.random.PRNGKey(0), jnp.float32)
    sh = NamedSharding(mesh, P("rows"))
    xs = tuple(jax.device_put(l.astype(dtype), sh)
               for l in shard_kron_blockvec(v0, spec).leaves)
    del v0
    tables = mv._tables

    @partial(jax.jit, static_argnums=(2,))
    def chain(leaves, tabs, rep):
        def body(v, _):
            out = mv._jitted(v, tabs)
            return tuple((o.astype(jnp.float32) * jnp.float32(1 / 30.0)
                          ).astype(o.dtype) for o in out), None

        v, _ = jax.lax.scan(body, leaves, None, length=rep)
        return sum(jnp.sum(o) for o in v)

    from spindynamics_tpu.utils.profiling import slope_timer

    def slope(fn, args, r1, r2):
        # canonical warm-both-lengths slope timing (utils/profiling)
        return max(slope_timer(fn, *args, r0=r1, r1=r2), 1e-12)

    with mesh:
        per = slope(chain, (xs, tables), 2, reps)
    nnz = lay.n_basis * (1.0 + len(m.hop_sites) / 2.0)
    print(json.dumps({
        "L": L, "D": 1, "dtype": str(jnp.dtype(dtype)),
        "per_apply_ms": round(per * 1e3, 3),
        "gnnz_s": round(nnz / per / 1e9, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
