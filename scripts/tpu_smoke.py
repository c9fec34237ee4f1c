#!/usr/bin/env python
"""Per-round TPU evidence: scripted smoke of the real-chip paths.

Runs (on the default backend — the tunneled TPU under axon):
  cli    — CLI KPM S(q, omega) at L=20 Sz=0 WITHOUT precomputed bounds
           (exercises the backend-safe complex defaults end to end).
  equiv  — sector_kron fused-vs-XLA matvec equivalence at L=24.
  timing — fused-kernel slope timing at L=28 (the bench-verified geometry;
           shares bench.py's compile cache entries).
  gs     — a small restarted ground state at L=24 (f32, blocks form).

Writes docs/TPU_SMOKE.json (committed) so TPU regressions — dtype limits,
relay quirks, Mosaic changes — surface mechanically instead of via hand-run
notes (VERDICT r1 weak-7).

Crash isolation: the axon relay's TPU worker can crash/restart mid-run
(observed repeatedly on long chained dispatches). Each stage therefore runs
in its OWN subprocess (`--stage NAME`), resumes past already-recorded keys,
and flushes incrementally — a dead worker costs one stage one retry, never
the whole run. Failures are recorded under "errors" instead of aborting.

Usage: python scripts/tpu_smoke.py [--fresh] [--skip-cli]
       python scripts/tpu_smoke.py --stage {cli,equiv,timing,gs,evolve,shardmap,lanczos_sqw,evolve_bf16}
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "TPU_SMOKE.json")


def _load():
    if os.path.exists(OUT):
        try:
            with open(OUT) as f:
                return json.load(f)
        except Exception:
            pass
    return {}


def _save(results):
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


def _jax_setup():
    import jax

    cache = os.environ.get("BENCH_CACHE_DIR", "/root/repo/.jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    return jax


def _kron_setup(L):
    import jax
    import jax.numpy as jnp

    import spindynamics_tpu as sd
    from spindynamics_tpu.ops.sector_kron import (
        make_sector_kron_layout, sector_kron_tables)
    from spindynamics_tpu.solvers.blockvec import bv_random

    model = sd.xxz_chain(L, Jxy=1.0, Jz=0.5, nup=L // 2, dtype=jnp.float32,
                         layout="sector_kron")
    lay = make_sector_kron_layout(model, model.kron_splits)
    tables = jax.tree_util.tree_map(jnp.asarray, sector_kron_tables(lay))
    v = bv_random(lay, jax.random.PRNGKey(0), jnp.float32)
    nrm = float(jnp.sqrt(sum(float(jnp.vdot(b, b).real) for b in v.leaves)))
    return model, lay, tables, v * (1.0 / nrm)


def stage_cli(results):
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


def stage_equiv(results):
    import jax
    import jax.numpy as jnp

    from spindynamics_tpu.ops.pallas_kron import apply_H_sector_kron_fused
    from spindynamics_tpu.ops.sector_kron import apply_H_sector_kron

    _model, lay, tables, v = _kron_setup(24)

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


def stage_timing(results):
    from functools import partial

    import jax
    import jax.numpy as jnp

    from spindynamics_tpu.ops.pallas_kron import apply_H_sector_kron_fused
    from spindynamics_tpu.ops.sector_kron import kron_apply_flops
    from spindynamics_tpu.solvers.blockvec import BlockVec

    L = 28
    model, lay, tables, v = _kron_setup(L)

    # identical chain shape to bench.bench_sector_kron (BENCH_FUSED=2 path):
    # same jaxpr -> same persistent-cache entry as the bench L=28 matrix point
    @partial(jax.jit, static_argnums=(2,))
    def chain(psi, tabs, rep):
        def body(b, _):
            w = BlockVec(apply_H_sector_kron_fused(b.leaves, lay, tabs,
                                                   fuse_crossh=True))
            return w * jnp.float32(1.0 / 30.0), None

        out, _ = jax.lax.scan(body, psi, None, length=rep)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in out.leaves)

    def t(rep):
        float(chain(v, tables, rep))
        t0 = time.time()
        float(chain(v, tables, rep))
        return time.time() - t0

    tA, tB = t(2), t(16)
    per_apply = max((tB - tA) / 14, 1e-9)
    nnz = lay.n_basis * (1.0 + len(model.hop_sites) / 2.0)
    results[f"fused_L{L}"] = {
        "ms_per_apply": round(per_apply * 1e3, 3),
        "gnnz_per_s": round(nnz / per_apply / 1e9, 1),
        "flops": kron_apply_flops(lay),
    }
    print(f"fused L{L}:", results[f"fused_L{L}"], flush=True)


def stage_gs(results):
    import spindynamics_tpu as sd

    L = 24
    model, _lay, _tables, _v = _kron_setup(L)
    t0 = time.time()
    E0, _psi, info, _ = sd.groundstate_kron(model, lanc_m=30, cycles=3,
                                            target_residual=1e-3)
    results["groundstate_L24"] = {
        "E0_per_site": E0 / L, "residual": info["residual"],
        "cycles": info["cycles"], "polished": info.get("polished", 0),
        "wall_s": round(time.time() - t0, 1),
    }
    print("gs L24:", results["groundstate_L24"], flush=True)


def stage_evolve(results):
    """Round-4: BlockVec Chebyshev dynamics on chip (solvers/kron_evolve)."""
    import numpy as np

    import spindynamics_tpu as sd
    from spindynamics_tpu.models.initial_states import domain_wall_bitstring

    L = 24
    model, _lay, _t, _v = _kron_setup(L)
    t0 = time.time()
    _pair, obs, info = sd.evolve_trajectory_kron(
        model, domain_wall_bitstring(model), 0.1, 5, cheb_n=24)
    results["kron_evolve_L24"] = {
        "norm_drift": float(abs(info["norms"][-1] - 1.0)),
        "sz_max_abs": float(np.abs(obs.sum(axis=1)).max()),
        "wall_s": round(time.time() - t0, 1),
    }
    print("evolve L24:", results["kron_evolve_L24"], flush=True)


def stage_shardmap(results):
    """Round-4: the multi-chip fused path on a 1-device mesh vs the direct
    kernel (parallel/sharded_kron_scaling BlockVec form)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from spindynamics_tpu.ops.pallas_kron import apply_H_sector_kron_fused
    from spindynamics_tpu.parallel.sharded_kron_scaling import (
        shard_kron_blockvec, sharded_kron_scaling_bv_matvec_fn,
        unshard_kron_blockvec)
    from spindynamics_tpu.solvers.blockvec import BlockVec

    L = 24
    model, lay, tables, v = _kron_setup(L)
    mesh = Mesh(np.array(jax.devices()[:1]), ("rows",))
    mv, _, spec = sharded_kron_scaling_bv_matvec_fn(model, mesh)
    sh = NamedSharding(mesh, P("rows"))
    xs = BlockVec([jax.device_put(l, sh)
                   for l in shard_kron_blockvec(v, spec).leaves])
    t0 = time.time()
    with mesh:
        y = unshard_kron_blockvec(mv(xs), spec)
    y_ref = apply_H_sector_kron_fused(list(v.leaves), lay, tables)
    num = sum(float(jnp.sum((a - b) ** 2))
              for a, b in zip(y.leaves, y_ref))
    den = sum(float(jnp.sum(b ** 2)) for b in y_ref)
    results["shardmap_d1_L24_rel_l2"] = (num / max(den, 1e-30)) ** 0.5
    print(f"shardmap d1 rel err {results['shardmap_d1_L24_rel_l2']:.2e} "
          f"({time.time()-t0:.0f}s)", flush=True)


def stage_lanczos_sqw(results):
    """Round-5: the LANCZOS spectral path at kron scale on chip
    (plane-split tridiagonalizations; runners.lanczos_sqw_kron)."""
    import numpy as np

    import spindynamics_tpu as sd

    L = 24
    model, _lay, _t, _v = _kron_setup(L)
    t0 = time.time()
    E0, psi, info, lay = sd.groundstate_kron(model, lanc_m=40, cycles=3,
                                             target_residual=1e-3)
    omega = np.linspace(0.0, 4.0, 50)
    S, sinfo = sd.lanczos_sqw_kron(model, [np.pi / 2, np.pi], omega,
                                   lanc_m=60, psi0=psi, E0=E0, info=info)
    results["lanczos_sqw_kron_L24"] = {
        "plane_mode": sinfo["plane_mode"],
        "S_max": float(S.max()),
        "finite": bool(np.isfinite(S).all()),
        "wall_s": round(time.time() - t0, 1),
    }
    print("lanczos_sqw L24:", results["lanczos_sqw_kron_L24"], flush=True)


def stage_evolve_bf16(results):
    """Round-5: bf16 BlockVec Chebyshev dynamics on chip
    (evolve_trajectory_kron(state_dtype=bfloat16))."""
    import jax.numpy as jnp
    import numpy as np

    import spindynamics_tpu as sd
    from spindynamics_tpu.models.initial_states import domain_wall_bitstring

    L = 24
    model, _lay, _t, _v = _kron_setup(L)
    t0 = time.time()
    pair, obs, info = sd.evolve_trajectory_kron(
        model, domain_wall_bitstring(model), 0.1, 3, cheb_n=24,
        state_dtype=jnp.bfloat16)
    results["kron_evolve_bf16_L24"] = {
        "dtype": str(pair[0].leaves[0].dtype),
        "norm_drift": float(abs(info["norms"][-1] - 1.0)),
        "sz_max_abs": float(np.abs(obs.sum(axis=1)).max()),
        "wall_s": round(time.time() - t0, 1),
    }
    print("evolve bf16 L24:", results["kron_evolve_bf16_L24"], flush=True)


def stage_cheb_fused(results):
    """Round-5: the fused Chebyshev-term kernel (ops/pallas_cheb) vs the XLA
    scan path ON CHIP — the equivalence the CPU tests prove in interpret
    mode, re-proven against the real Mosaic lowering."""
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from spindynamics_tpu.solvers.blockvec import bv_random, bv_zeros_like
    from spindynamics_tpu.solvers.chebyshev import chebyshev_coefficients
    from spindynamics_tpu.solvers.kron_evolve import (
        _cheb_kron_scan, kron_planes_matvec_fn)

    L, cheb_n = 20, 12
    _model, lay, _t, _v = _kron_setup(L)
    re = bv_random(lay, jax.random.PRNGKey(0), jnp.float32)
    nrm = float(np.sqrt(sum(float(jnp.vdot(x, x)) for x in re.leaves)))
    pair = (re * (1.0 / nrm), bv_zeros_like(re))
    c, a, b = chebyshev_coefficients(0.15, -0.8 * L, 0.8 * L, cheb_n)
    c_ri = jnp.asarray(np.stack([c.real, c.imag], axis=1), jnp.float32)
    ab = (jnp.float32(1.0 / a), jnp.float32(b))
    t0 = time.time()
    outs = {}
    for mode, env in (("fused", "1"), ("xla", "0")):
        os.environ["SDTPU_CHEB_FUSED"] = env
        pmv = kron_planes_matvec_fn(lay, fused=True)
        out = _cheb_kron_scan(pmv, pair, c_ri, ab, cheb_n)
        outs[mode] = [np.asarray(l, np.float64)
                      for p in out for l in p.leaves]
    os.environ.pop("SDTPU_CHEB_FUSED", None)
    num = sum(float(np.sum((x - y) ** 2))
              for x, y in zip(outs["xla"], outs["fused"]))
    den = sum(float(np.sum(x ** 2)) for x in outs["xla"])
    rel = (num / max(den, 1e-300)) ** 0.5
    results["cheb_fused_vs_xla_L20_rel_l2"] = rel
    results["cheb_fused_wall_s"] = round(time.time() - t0, 1)
    assert rel < 5e-6, rel
    print("cheb fused vs xla rel l2:", rel, flush=True)


STAGES = [
    ("cli", "cli_kpm_sqw_L20", stage_cli),
    ("cheb_fused", "cheb_fused_vs_xla_L20_rel_l2", stage_cheb_fused),
    ("equiv", "fused_vs_xla_L24_rel_l2", stage_equiv),
    ("timing", "fused_L28", stage_timing),
    ("gs", "groundstate_L24", stage_gs),
    ("evolve", "kron_evolve_L24", stage_evolve),
    ("shardmap", "shardmap_d1_L24_rel_l2", stage_shardmap),
    ("lanczos_sqw", "lanczos_sqw_kron_L24", stage_lanczos_sqw),
    ("evolve_bf16", "kron_evolve_bf16_L24", stage_evolve_bf16),
]


def run_stage(name):
    jax = _jax_setup()
    results = _load()
    results.update({"ts": time.time(), "backend": jax.default_backend(),
                    "device": str(jax.devices()[0])})
    for nm, key, fn in STAGES:
        if nm == name:
            fn(results)
            _save(results)
            return
    raise SystemExit(f"unknown stage {name!r}")


def orchestrate():
    if "--fresh" in sys.argv:
        _save({})
    for name, key, _fn in STAGES:
        if name == "cli" and "--skip-cli" in sys.argv:
            continue
        if key in _load():
            continue
        for attempt in (1, 2):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--stage", name],
                timeout=7200)
            if key in _load():
                break
            print(f"stage {name} attempt {attempt} failed (rc={r.returncode})",
                  flush=True)
        else:
            results = _load()
            results.setdefault("errors", {})[name] = {
                "rc": r.returncode, "attempts": 2}
            _save(results)
    print("wrote", OUT)


if __name__ == "__main__":
    if "--stage" in sys.argv:
        run_stage(sys.argv[sys.argv.index("--stage") + 1])
    else:
        orchestrate()
