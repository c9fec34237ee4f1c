"""Worker for the two-process jax.distributed smoke test (VERDICT r4 #7).

Launched twice by tests/test_distributed.py with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID in the environment. Each process owns 2
virtual CPU devices -> a 4-device global mesh across 2 OS processes: the
real multi-process init/topology path (coordination service + cross-process
CPU collectives), not the single-process 8-virtual-device emulation.

Asserts: initialize_distributed() actually initializes, mesh_from_topology
orders devices host-major, one sharded kron matvec's addressable shards
match the single-device oracle, and a psum'd inner product agrees across
processes. Prints DIST_OK on success (the parent greps for it).
"""

import os
import sys

# the ambient sitecustomize pins the TPU relay; 2 local devices per process
os.environ["XLA_FLAGS"] = ""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass  # older jax: cross-process CPU collectives on by default

import numpy as np

from spindynamics_tpu.parallel.distributed import (
    initialize_distributed,
    is_multiprocess,
    local_shard_info,
    mesh_from_topology,
)

assert initialize_distributed(), "env should request multi-process init"
assert jax.process_count() == 2, jax.process_count()
assert is_multiprocess()
assert len(jax.devices()) == 4, jax.devices()

mesh = mesh_from_topology()
info = local_shard_info(mesh)
assert info["n_shards"] == 4
# host-major: process p owns shards [2p, 2p+1]
assert info["local_shard_ids"] == [2 * info["process_index"],
                                   2 * info["process_index"] + 1], info

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import spindynamics_tpu as sd
from spindynamics_tpu.ops.sector_kron import (
    apply_H_sector_kron,
    make_sector_kron_layout,
)
from spindynamics_tpu.parallel.sharded_kron_scaling import (
    KronShardSpec,
    shard_kron_state,
    sharded_kron_scaling_matvec_fn,
    unshard_kron_state,
)

mk = sd.xxz_chain(10, Jxy=1.0, Jz=0.4, nup=5, dtype=jnp.float32,
                  layout="sector_kron")
mv, lay, spec = sharded_kron_scaling_matvec_fn(mk, mesh, use_fused=False)
assert spec.D == 4

rng = np.random.default_rng(0)  # same seed in both processes
x = rng.standard_normal(lay.n_states).astype(np.float32)
x = np.where(np.asarray(mk.valid_mask()), x, 0.0)
xs_host = np.asarray(shard_kron_state(jnp.asarray(x), spec))
sh = NamedSharding(mesh, P("rows"))
xs = jax.make_array_from_callback(xs_host.shape, sh,
                                  lambda idx: xs_host[idx])

ys = mv(xs)

# oracle: single-device apply, re-laid-out into the sharded order
y_ref = np.asarray(apply_H_sector_kron(
    jnp.asarray(x), None, make_sector_kron_layout(mk, mk.kron_splits)))
ys_ref = np.asarray(shard_kron_state(jnp.asarray(y_ref), spec))
for shard in ys.addressable_shards:
    got = np.asarray(shard.data)
    want = ys_ref[shard.index]
    err = float(np.max(np.abs(got - want)))
    assert err < 1e-4 * max(1.0, float(np.max(np.abs(y_ref)))), err

# cross-process reduction: <x|H|x> psum'd over both processes
e0 = float(jax.jit(lambda a, b: jnp.vdot(a, b))(xs, ys))
e_ref = float(np.dot(xs_host.astype(np.float64), ys_ref.astype(np.float64)))
assert abs(e0 - e_ref) < 1e-2 * max(1.0, abs(e_ref)), (e0, e_ref)

# end-to-end: a short Lanczos bounds solve ACROSS processes (BlockVec form,
# scan recurrence, every dot a cross-process psum) vs the local oracle
from spindynamics_tpu.ops.sector_kron import flat_to_blocks
from spindynamics_tpu.parallel.sharded_kron_scaling import (
    shard_kron_blockvec,
    sharded_kron_scaling_bv_matvec_fn,
)
from spindynamics_tpu.solvers.blockvec import BlockVec
from spindynamics_tpu.solvers.lanczos import lanczos_iteration, tridiag_eigh

bmv, blay, bspec = sharded_kron_scaling_bv_matvec_fn(mk, mesh,
                                                     use_fused=False)
bv_host = [np.asarray(l) for l in shard_kron_blockvec(
    BlockVec(flat_to_blocks(jnp.asarray(x), blay)), bspec).leaves]
bx = BlockVec([
    jax.make_array_from_callback(h.shape, NamedSharding(mesh, P("rows")),
                                 lambda idx, h=h: h[idx])
    for h in bv_host])
fac = lanczos_iteration(bmv, bx, 12)
evals, _ = tridiag_eigh(fac.alphas, fac.betas, fac.m_eff)
# oracle: same recurrence single-device on this process
mv1 = lambda b: BlockVec(apply_H_sector_kron(  # noqa: E731
    list(b.leaves), None, make_sector_kron_layout(mk, mk.kron_splits)))
fac1 = lanczos_iteration(mv1, BlockVec(flat_to_blocks(jnp.asarray(x), blay)),
                         12)
ev1, _ = tridiag_eigh(fac1.alphas, fac1.betas, fac1.m_eff)
assert abs(float(evals.min()) - float(ev1.min())) < 1e-3, (evals, ev1)

print(f"DIST_OK p{jax.process_index()} e0={e0:.6f} emin={evals.min():.6f}")
sys.exit(0)
