#!/usr/bin/env python
"""Benchmark: matrix-free H|psi> throughput (the hot kernel under every solver).

Timeout-immune output contract (VERDICT r2 item 1): every completed point is
printed IMMEDIATELY as its own flushed JSON line, HEADLINE FIRST, and the final
line (on a complete run) re-prints the headline with the full "matrix" of extra
points.  A consumer that takes the last parseable line gets the combined
headline on success and the most recent completed point if the process is
killed mid-run; a consumer that takes the first line always gets the headline.
A `BENCH_TIME_BUDGET` env (seconds, default 1200) skips remaining matrix
points once exceeded — the headline is always attempted.

Line shape:
  {"metric": ..., "value": ..., "unit": "nnz/s", "vs_baseline": ..., "matrix": [...]}

- Headline (BASELINE.json north star): XXZ chain, L=32 Sz=0 sector
  (N = C(32,16) = 601,080,390 — a 3254x larger Hilbert space than the
  reference's biggest demo, /root/reference/examples/example_kpmSqw.jl:11)
  on the `sector_kron` layout — the 3-way Kronecker-factorized compact-sector
  matvec (ops/sector_kron.py). "matrix" carries the other (L, layout) points
  measured in the same run (default adds L=28 sector_kron).
- Matvecs are chained inside one lax.scan and slope-timed between two chain
  lengths so the ~10-25 ms relay dispatch latency cannot pollute the result.
- value: nonzeros of H processed per second: nnz = C(L, nup) * (1 + n_bonds/2)
  for sector layouts, 2^L * (1 + n_bonds/2) for the embedded operator.
- vs_baseline: fraction of the single-chip speed-of-light for the layout —
  an ideal execution is bounded by max(HBM traffic, MXU flops):
  * sector_kron: traffic = 2 * N_pad * 4 bytes (read psi + write out; tables
    are VMEM-resident), flops = ops/sector_kron.kron_apply_flops — the EXACT
    per-contraction count including the A/B ordering decision (the r1 bench
    overcounted the second cross contraction; fixed per VERDICT r1);
  * embedded pallas: traffic = (3 + n_special) * N * 4 bytes (see
    ops/pallas_matvec.py).
  The reference publishes no throughput numbers (BASELINE.md), so roofline
  fraction is the meaningful denominator.

Env knobs: BENCH_L (headline L, default 32), BENCH_MATRIX (comma list of
extra points, each "L" for the headline backend, "backend:L", or "bf16:L"
for the sector_kron bf16 amplitude mode; default "28,pallas:26,bf16:32";
empty disables), BENCH_BACKEND (sector_kron|blocked|
tensor|pallas|ell; default sector_kron), BENCH_REPS (default 16),
BENCH_PLATFORM, BENCH_HBM_BW (default v5e 819e9), BENCH_F32_TFLOPS (default
35.5e12 = the MEASURED matmul rate at precision=high on this v5e for the
kron contraction shapes — scripts/mxu_calibrate.py. `high` (3-pass bf16, or
the equivalent in-kernel split-2) is the MINIMUM precision that meets the
physics tolerances: `default` truncates operands to bf16 (2.4e-3/term,
sinks L=32 residuals), so the f32-grade matmul speed-of-light — not the
nominal bf16 peak — is the honest roofline denominator).
"""

import json
import os
import time
from functools import partial


def _slope_time(chain, args, r0, r1):
    float(chain(*args, r0))  # compile
    t0 = time.time()
    float(chain(*args, r0))
    tA = time.time() - t0
    float(chain(*args, r1))  # compile
    t0 = time.time()
    float(chain(*args, r1))
    tB = time.time() - t0
    return max((tB - tA) / (r1 - r0), 1e-12)


def bench_sector_kron(L, reps, hbm_bw, f32_tflops, bf16=False):
    import jax
    import jax.numpy as jnp

    import spindynamics_tpu as sd
    from spindynamics_tpu.ops.sector_kron import (
        apply_H_sector_kron, kron_apply_flops, make_sector_kron_layout,
        sector_kron_tables)

    from spindynamics_tpu.solvers.blockvec import BlockVec, bv_random

    model = sd.xxz_chain(L, Jxy=1.0, Jz=0.5, nup=L // 2,
                         dtype=jnp.float32, layout="sector_kron")
    lay = make_sector_kron_layout(model, model.kron_splits)
    tables = jax.tree_util.tree_map(jnp.asarray, sector_kron_tables(lay))
    N_pad = lay.n_states
    nnz = lay.n_basis * (1.0 + len(model.hop_sites) / 2.0)
    # BENCH_DTYPE=bf16: the opt-in half-traffic amplitude mode (states stream
    # bf16, f32 in-kernel accumulation — ops/pallas_kron). The roofline
    # denominator uses the true 2-byte traffic; flops are unchanged.
    bf16 = bf16 or os.environ.get("BENCH_DTYPE") == "bf16"
    state_dtype = jnp.bfloat16 if bf16 else jnp.float32
    itemsize = jnp.dtype(state_dtype).itemsize
    if itemsize == 2:
        # single-pass bf16xbf16 matmuls: the honest speed-of-light is the
        # MEASURED bf16-operand rate at the kron shapes (70.0 TFLOP/s on this
        # v5e, scripts/mxu_calibrate.py --bf16), not the f32-grade 3-pass rate
        f32_tflops = float(os.environ.get("BENCH_BF16_TFLOPS", 70.0e12))

    # BlockVec (per-group rank-3) state: full native (8,128) tiles — the flat
    # view's q<8 sublane padding doubles every HBM pass (solvers/blockvec).
    # Normalization every 4th apply amortizes the norm+scale passes out of
    # the SpMV measurement (||H~|| growth over 4 steps is ~1e6, safe in f32).
    @partial(jax.jit, static_argnums=(2,))
    def chain(psi, tables, rep):
        # "0": XLA blocks path; "1": fused kernel, crossh in the XLA seed;
        # "2": fused-v2, crossh streamed through the kernel (default)
        fused = os.environ.get("BENCH_FUSED", "2")

        def body(v, _):
            if fused in ("1", "2"):
                from spindynamics_tpu.ops.pallas_kron import (
                    apply_H_sector_kron_fused)

                w = BlockVec(apply_H_sector_kron_fused(
                    v.leaves, lay, tables, fuse_crossh=fused == "2"))
            else:
                w = BlockVec(apply_H_sector_kron(v.leaves, None, lay, tables))
            # fixed rescale keeps |w| bounded over the chain without the
            # norm's extra read pass: the chain measures the PURE SpMV
            return w * jnp.float32(1.0 / 30.0), None

        v, _ = jax.lax.scan(body, psi, None, length=rep)
        return sum(jnp.sum(b.astype(jnp.float32)) for b in v.leaves)

    psi0 = bv_random(lay, jax.random.PRNGKey(0), jnp.float32)
    nrm0 = float(jnp.sqrt(sum(float(jnp.vdot(b, b).real) for b in psi0.leaves)))
    psi = (psi0 * (1.0 / nrm0)).astype(state_dtype)
    per_apply = _slope_time(chain, (psi, tables), 2, reps)
    t_light = max(2.0 * N_pad * itemsize / hbm_bw,
                  kron_apply_flops(lay) / f32_tflops)
    suffix = "_bf16" if itemsize == 2 else ""
    return {
        "metric": f"spmv_nnz_per_s_L{L}_Sz0_sector_kron{suffix}",
        "value": round(nnz / per_apply, 3),
        "unit": "nnz/s",
        "vs_baseline": round(t_light / per_apply, 4),
    }


def bench_shardmap_d1(L, reps, hbm_bw, f32_tflops):
    """The multi-chip fused path on a ONE-device mesh (BlockVec form,
    parallel/sharded_kron_scaling): per-chip-parity evidence — the same
    Mosaic modules as the direct kernel plus shard_map plumbing and trivial
    collectives. vs_baseline uses the direct-kernel roofline, so this row
    reads as 'fraction of single-chip light speed a pod member would run
    at before ICI costs'."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import spindynamics_tpu as sd
    from spindynamics_tpu.ops.sector_kron import (
        kron_apply_flops, make_sector_kron_layout)
    from spindynamics_tpu.parallel.sharded_kron_scaling import (
        shard_kron_blockvec, sharded_kron_scaling_bv_matvec_fn)
    from spindynamics_tpu.solvers.blockvec import bv_random

    model = sd.xxz_chain(L, Jxy=1.0, Jz=0.5, nup=L // 2, dtype=jnp.float32,
                         layout="sector_kron")
    mesh = Mesh(np.array(jax.devices()[:1]), ("rows",))
    mv, lay, spec = sharded_kron_scaling_bv_matvec_fn(model, mesh,
                                                      use_fused=True)
    sh = NamedSharding(mesh, P("rows"))
    xs = tuple(jax.device_put(l, sh) for l in shard_kron_blockvec(
        bv_random(lay, jax.random.PRNGKey(0), jnp.float32), spec).leaves)

    @partial(jax.jit, static_argnums=(2,))
    def chain(leaves, tabs, rep):
        def body(v, _):
            out = mv._jitted(v, tabs)
            return tuple(o * jnp.float32(1 / 30.0) for o in out), None

        v, _ = jax.lax.scan(body, leaves, None, length=rep)
        return sum(jnp.sum(o) for o in v)

    with mesh:
        per_apply = _slope_time(chain, (xs, mv._tables), 2, reps)
    nnz = lay.n_basis * (1.0 + len(model.hop_sites) / 2.0)
    N_pad = lay.n_states
    t_light = max(2.0 * N_pad * 4 / hbm_bw, kron_apply_flops(lay) / f32_tflops)
    return {
        "metric": f"spmv_nnz_per_s_L{L}_Sz0_shardmap_d1_kron",
        "value": round(nnz / per_apply, 3),
        "unit": "nnz/s",
        "vs_baseline": round(t_light / per_apply, 4),
    }


def bench_evolve_kron(L, reps, hbm_bw, f32_tflops, bf16=False):
    """One full Chebyshev time-evolution STEP on BlockVec plane pairs
    (solvers/kron_evolve._cheb_kron_scan through the fused kernel) — the
    trajectory driver's inner loop, f32 or bf16 states (VERDICT r4 #3).

    value = seconds per step (cheb_n = 40 terms); vs_baseline = fraction of
    the step's own speed-of-light: per term per plane the kernel moves 2
    state-dtype passes and the fused recurrence/accumulator combine moves
    read{h, p_curr, p_prev (state) + acc_re, acc_im (f32)} +
    write{p_next (state) + acc_re, acc_im (f32)} — 6 * itemsize + 16 bytes
    per element (40 B f32, 28 B bf16: the f32 accumulator is why bf16 buys
    ~1.4x on the step, not the 2x of the bare matvec). MXU term: 2 * cheb_n
    applies at the layout's exact contraction flops."""
    import jax
    import jax.numpy as jnp

    import spindynamics_tpu as sd
    from spindynamics_tpu.ops.sector_kron import (
        kron_apply_flops, make_sector_kron_layout)
    from spindynamics_tpu.solvers.blockvec import bv_random, bv_zeros_like
    from spindynamics_tpu.solvers.chebyshev import chebyshev_coefficients
    from spindynamics_tpu.solvers.kron_evolve import (
        _cheb_kron_scan, kron_planes_matvec_fn)

    import numpy as np

    cheb_n = int(os.environ.get("BENCH_EVOLVE_CHEB_N", "40"))
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    model = sd.xxz_chain(L, Jxy=1.0, Jz=0.5, nup=L // 2, dtype=jnp.float32,
                         layout="sector_kron")
    lay = make_sector_kron_layout(model, model.kron_splits, model.kron_pads)
    pmv = kron_planes_matvec_fn(lay, fused=True)
    re = bv_random(lay, jax.random.PRNGKey(0), jnp.float32)
    nrm = float(np.sqrt(sum(float(jnp.vdot(x, x)) for x in re.leaves)))
    pair = ((re * (1.0 / nrm)).astype(dtype), bv_zeros_like(re).astype(dtype))
    # generous static bounds (spectrum of the open XXZ chain is well inside);
    # avoids a bounds solve that would add compiles to the bench
    Eb = (-0.8 * L, 0.8 * L)
    c, a, b = chebyshev_coefficients(0.05, Eb[0], Eb[1], cheb_n)
    c_ri = jnp.asarray(np.stack([c.real, c.imag], axis=1), jnp.float32)
    ab = (jnp.float32(1.0 / a), jnp.float32(b))

    def chain(pair, c_ri, rep):
        for _ in range(rep):
            pair = _cheb_kron_scan(pmv, pair, c_ri, ab, cheb_n)
        s = sum(jnp.sum(x.astype(jnp.float32)) for x in pair[0].leaves)
        jax.block_until_ready(s)
        return s

    per_step = _slope_time(chain, (pair, c_ri), 1, 2)
    N_pad = lay.n_states
    itemsize = 2 if bf16 else 4
    traffic = cheb_n * 2 * N_pad * (6 * itemsize + 16)
    rate = float(os.environ.get("BENCH_BF16_TFLOPS", 70.0e12)) if bf16 \
        else f32_tflops
    t_light = max(traffic / hbm_bw, cheb_n * 2 * kron_apply_flops(lay) / rate)
    return {
        "metric": f"evolve_step_s_L{L}_Sz0_kron" + ("_bf16" if bf16 else ""),
        "value": round(per_step, 4),
        "unit": "s/step",
        "vs_baseline": round(t_light / per_step, 4),
    }


def embedded_pallas_flops(plan, N):
    """Logical MXU flops of one fused embedded apply (ops/pallas_matvec).

    The kernel's bit-flips ride one-hot permutation matmuls — the TPU-native
    idiom (per-element gathers ~1 GB/s, lane flips ~16 GB/s, matmuls ~ memory
    bandwidth) — so the speed-of-light must include the MXU term, same
    convention as the sector_kron roofline (logical flops at the f32-grade
    measured rate). Per block [T, W]: M_cols [T,W]@[W,W], M_rows [T,T]@[T,W],
    and one T- or W-matmul per special with m_row / m_col set."""
    T, W = plan.T, plan.W
    k = W + T  # M_cols + M_rows (always contracted, even if zero)
    for (_b, m_col, m_row, _m_blk, _i, _j) in plan.special:
        if m_row:
            k += T
        if m_col:
            k += W
    return 2.0 * N * k


def bench_embedded(L, backend, reps, hbm_bw, f32_tflops):
    import jax
    import jax.numpy as jnp

    import spindynamics_tpu as sd
    from spindynamics_tpu.ops.blocked import make_blocked_plan

    model = sd.xxz_chain(L, Jxy=1.0, Jz=0.5, nup=L // 2, dtype=jnp.float32,
                         layout="embedded")
    N = model.n_states
    psi = sd.neel_state(model, dtype=jnp.float32)
    psi = psi + 0.01 * jax.random.normal(jax.random.PRNGKey(0), (N,), jnp.float32)
    psi = psi / jnp.linalg.norm(psi)

    # couplings are J = 1.0 here (bf16-exact) — the kernel runs 2-pass local
    # dots; the flag is passed explicitly because model rides through jit as
    # an ARGUMENT (hop_J traced; const-capture would hit the relay's HTTP
    # limit at scale — CLAUDE.md)
    from spindynamics_tpu.ops.pallas_matvec import (
        _concrete_exact_J, pallas_pass_count)

    exact_J = _concrete_exact_J(model.hop_J)

    @partial(jax.jit, static_argnums=(2,))
    def chain(psi, model, rep):
        def body(v, _):
            w = sd.apply_H(v, model, backend=backend, exact_J=exact_J)
            # constant rescale (no norm passes): the chain measures the PURE
            # apply, same idiom as the sector_kron chain above
            return w * jnp.float32(1.0 / 30.0), None

        v, _ = jax.lax.scan(body, psi, None, length=rep)
        return jnp.sum(v)

    per_apply = _slope_time(chain, (psi, model), 2, reps)
    nnz = N * (1.0 + len(model.hop_sites) / 2.0)
    if backend == "pallas":
        from spindynamics_tpu.ops.pallas_matvec import pallas_default_plan

        plan = pallas_default_plan(model)  # must match the apply's plan
    else:
        plan = make_blocked_plan(model)
    n_special = len(plan.special)
    if backend == "pallas":
        # fused kernel roofline: pallas_pass_count effective N-passes (own +
        # write + partner reads, HALVED for hold-elided specials) + the
        # chain's rescale read+write; MXU = the one-hot flip matmuls
        # (same max(HBM, flops/f32-grade-rate) convention as sector_kron)
        t_light = max((pallas_pass_count(plan) + 2) * N * 4 / hbm_bw,
                      embedded_pallas_flops(plan, N) / f32_tflops)
    else:
        t_light = (3 + n_special) * N * 4 / hbm_bw
    return {
        "metric": f"spmv_nnz_per_s_L{L}_Sz0_embedded_{backend}",
        "value": round(nnz / per_apply, 3),
        "unit": "nnz/s",
        "vs_baseline": round(t_light / per_apply, 4),
    }


def main():
    import jax

    # persistent compilation cache: the relay compile is minutes per variant;
    # cached executables make re-runs (and the driver's end-of-round bench)
    # start in seconds. Harmless no-op if the backend can't serialize.
    cache_dir = os.environ.get("BENCH_CACHE_DIR", "/root/repo/.jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    if os.environ.get("BENCH_PLATFORM"):
        # the ambient sitecustomize pins the TPU platform regardless of
        # JAX_PLATFORMS; an explicit in-process override is required for CPU runs
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    backend = os.environ.get("BENCH_BACKEND", "sector_kron")
    default_L = "32" if backend == "sector_kron" else "24"
    L = int(os.environ.get("BENCH_L", default_L))
    # matrix tokens: "28" (same backend) or "pallas:26" (explicit backend)
    extra = os.environ.get(
        "BENCH_MATRIX",
        "28,pallas:26,bf16:32,shardmap:32,evolve:28,evolvebf16:28"
        if backend == "sector_kron" else "")
    reps = int(os.environ.get("BENCH_REPS", "16"))
    hbm_bw = float(os.environ.get("BENCH_HBM_BW", 819e9))  # v5e
    f32_tflops = float(os.environ.get("BENCH_F32_TFLOPS", 35.5e12))

    budget = float(os.environ.get("BENCH_TIME_BUDGET", "1200"))
    t_start = time.time()

    def run_one(tok):
        be, _, l = str(tok).rpartition(":")
        be = be or backend
        # "bf16:32": the sector_kron bf16 amplitude mode (half HBM traffic,
        # f32 in-kernel accumulation — ops/pallas_kron) as its own matrix point
        if be in ("sector_kron", "bf16"):
            return bench_sector_kron(int(l), reps, hbm_bw, f32_tflops,
                                     bf16=be == "bf16")
        if be == "shardmap":
            return bench_shardmap_d1(int(l), reps, hbm_bw, f32_tflops)
        if be in ("evolve", "evolvebf16"):
            # full Chebyshev evolution step (trajectory driver inner loop),
            # f32 or bf16 BlockVec states (VERDICT r4 #3)
            return bench_evolve_kron(int(l), reps, hbm_bw, f32_tflops,
                                     bf16=be == "evolvebf16")
        return bench_embedded(int(l), be, reps, hbm_bw, f32_tflops)

    # Headline FIRST, printed the moment it exists — a later timeout cannot
    # lose it (BENCH_r02 lost everything by printing once at the very end).
    head = run_one(L)
    print(json.dumps(head), flush=True)

    matrix = []
    for tok in [t for t in extra.split(",") if t.strip()]:
        if time.time() - t_start > budget:
            print(json.dumps({"skipped": f"L={tok}",
                              "reason": "BENCH_TIME_BUDGET exceeded",
                              **head}), flush=True)
            continue
        matrix.append(run_one(tok.strip()))
        # each completed extra point is itself a full valid headline-shaped
        # line (metric/value/unit/vs_baseline), so a kill between points
        # still leaves the last line parseable.
        print(json.dumps(matrix[-1]), flush=True)
    if matrix:
        head = dict(head, matrix=matrix)
    # final line: the combined headline (last-line consumers see this).
    print(json.dumps(head), flush=True)


if __name__ == "__main__":
    main()
