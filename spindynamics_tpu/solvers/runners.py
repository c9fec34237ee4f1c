"""High-level one-call wrappers (parity with the reference's run_* functions).

The reference ships `run_chebyshev` (src/TimeEvolution/Chebyshev.jl:137-157),
`run_krylov` (src/TimeEvolution/Krylov.jl:204-217 — broken: calls nonexistent
*_sector observables, SURVEY.md §2.4-1) and `run_kpm_dynamical`
(src/TimeEvolution/KPM.jl:254-267 — broken: nonexistent apply_H_sector!).
These are the working equivalents: domain-wall start, one time step (or a
trajectory), observables out.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..model import SpinModel
from ..models.initial_states import domain_wall_state
from ..observables import magnetization_per_site, structure_factor_Sq
from ..ops.apply import matvec_fn
from functools import partial

from .chebyshev import chebyshev_coefficients, chebyshev_time_evolve
from .krylov import krylov_time_evolve
from .lanczos import estimate_energy_bounds

__all__ = ["run_chebyshev", "run_krylov", "evolve_trajectory",
           "evolve_trajectory_planes", "lanczos_groundstate_checkpointed",
           "groundstate_kron", "kpm_sqw_kron", "lanczos_sqw_kron",
           "kpm_correlation_matrix_kron"]


def evolve_trajectory_planes(model: SpinModel, psi0, dt: float, n_steps: int,
                             Ebounds=None, cheb_n: int = 30,
                             backend: str | None = None, lanc_m: int = 60,
                             observe=magnetization_per_site,
                             observe_planes=None,
                             checkpoint_dir: str | None = None,
                             checkpoint_every: int = 0,
                             resume: bool = False):
    """Chebyshev trajectory with ZERO complex dtypes anywhere.

    The state lives as an f32 [2, N] real/imag plane stack between steps and
    each step runs the hand-rolled plane recurrence (solvers/planes.py). Needed
    on PJRT backends without complex support (see utils/complex_io); also a
    fine default anywhere. Returns (planes, obs).

    Checkpoint/resume (the reference has none — SURVEY.md §5): with
    `checkpoint_dir` set, the (planes, observables, step) state is persisted
    every `checkpoint_every` steps (and at the end); `resume=True` continues a
    previous run from the saved step — the resumed trajectory is bit-identical
    to an uninterrupted one (same coefficients, same recurrence)."""
    import jax

    from .planes import chebyshev_time_evolve_planes, planes_matvec_fn

    _resume_state = None
    if resume:
        if not checkpoint_dir:
            raise ValueError("resume=True requires checkpoint_dir")
        from ..utils.checkpoint import load_checkpoint

        _resume_state = load_checkpoint(checkpoint_dir)
        if Ebounds is None:
            # reuse the saved bounds so the resumed coefficients (and hence the
            # trajectory) are bit-identical to the uninterrupted run
            Ebounds = tuple(_resume_state[1]["Ebounds"])

    mv = matvec_fn(model, backend)
    if Ebounds is None:
        Ebounds = estimate_energy_bounds(mv, model.n_states, lanc_m=lanc_m,
                                         dtype=jnp.float32,
                                         mask=model.valid_mask())
    coeffs = chebyshev_coefficients(dt, Ebounds[0], Ebounds[1], cheb_n)
    pmv = planes_matvec_fn(model, backend)

    def step(planes):
        return chebyshev_time_evolve_planes(planes, pmv, dt, Ebounds,
                                            cheb_n=cheb_n, coeffs=coeffs)

    if observe_planes is not None:
        # phase-sensitive observables: a callable taking the [2, N] plane
        # stack (and the model) directly
        obs_fn = jax.jit(lambda planes: observe_planes(planes, model))
    else:
        if not getattr(observe, "diagonal_in_z", False):
            raise ValueError(
                "observe must be diagonal in the Sz basis (a function of "
                "|psi|^2 only): the plane driver evaluates it on an f32 |psi| "
                "reconstruction, which silently drops phases for any other "
                "observable. Built-ins in spindynamics_tpu.observables carry "
                "`.diagonal_in_z = True`; set that attribute on a custom "
                "diagonal observable, or pass a phase-aware "
                "`observe_planes(planes, model)` instead."
            )

        def _observe_diag(planes):
            # |psi|^2-type observables from planes without complex buffers
            p2 = planes[0] ** 2 + planes[1] ** 2
            return observe(jnp.sqrt(p2), model)  # uses |psi| only

        obs_fn = jax.jit(_observe_diag)

    psi0 = jnp.asarray(psi0)
    if psi0.ndim == 1:
        if jnp.iscomplexobj(psi0):
            from ..utils.complex_io import planes_from_complex

            planes = planes_from_complex(psi0)
        else:
            planes = jnp.stack([psi0, jnp.zeros_like(psi0)])
    else:
        planes = psi0
    planes = jnp.asarray(planes, jnp.float32)
    obs = []
    start = 0
    if _resume_state is not None:
        saved, meta, extra = _resume_state
        planes = jnp.asarray(saved, jnp.float32)
        start = int(meta["step"])
        obs = [np.asarray(o) for o in extra["obs"]] if start else []

    def _save(step_idx):
        from ..utils.checkpoint import save_checkpoint

        save_checkpoint(
            checkpoint_dir, planes,
            meta={"step": step_idx, "dt": float(dt), "cheb_n": int(cheb_n),
                  "Ebounds": [float(Ebounds[0]), float(Ebounds[1])]},
            extra_arrays={"obs": np.asarray(obs) if obs
                          else np.zeros((0,), np.float32)},
        )

    for i in range(start, n_steps):
        planes = step(planes)
        obs.append(np.asarray(obs_fn(planes)))
        if checkpoint_dir and checkpoint_every and (i + 1) % checkpoint_every == 0:
            _save(i + 1)
    if checkpoint_dir and start < n_steps:
        _save(n_steps)
    return planes, np.asarray(obs)


def run_chebyshev(model: SpinModel, dt: float, cheb_n: int = 50, lanc_m: int = 80,
                  backend: str | None = None):
    """Domain-wall start -> bounds -> one Chebyshev step -> magnetization + S(q)
    (ref: src/TimeEvolution/Chebyshev.jl:137-157). Returns (mags, (q, Sq), bounds)."""
    mv = matvec_fn(model, backend)
    psi0 = domain_wall_state(model, dtype=jnp.complex64)
    psi0 = psi0 / jnp.linalg.norm(psi0).astype(psi0.dtype)
    bounds = estimate_energy_bounds(mv, model.n_states, lanc_m=lanc_m,
                                    mask=model.valid_mask())
    psi_t = chebyshev_time_evolve(psi0, mv, dt, bounds, cheb_n=cheb_n)
    mags = magnetization_per_site(psi_t, model)
    q, Sq = structure_factor_Sq(psi_t, model)
    return mags, (q, Sq), bounds


def run_krylov(model: SpinModel, dt: float, kry_m: int = 30,
               backend: str | None = None):
    """Working version of the reference's broken wrapper
    (src/TimeEvolution/Krylov.jl:204-217). Returns (mags, (q, Sq))."""
    mv = matvec_fn(model, backend)
    psi0 = domain_wall_state(model, dtype=jnp.complex64)
    psi0 = psi0 / jnp.linalg.norm(psi0).astype(psi0.dtype)
    psi_t = krylov_time_evolve(psi0, mv, dt, kry_m=kry_m)
    mags = magnetization_per_site(psi_t, model)
    q, Sq = structure_factor_Sq(psi_t, model)
    return mags, (q, Sq)


def evolve_trajectory(model: SpinModel, psi0, dt: float, n_steps: int,
                      method: str = "chebyshev", cheb_n: int = 30, kry_m: int = 30,
                      Ebounds=None, backend: str | None = None,
                      observe=magnetization_per_site):
    """Evolve n_steps of size dt, recording `observe(psi, model)` per step.

    The trajectory pattern of examples/example.jl:86-105, with the coefficient
    precompute hoisted out of the step loop. Returns (psi_final, obs [n_steps, ...])."""
    mv = matvec_fn(model, backend)
    psi = jnp.asarray(psi0, jnp.result_type(jnp.asarray(psi0).dtype, jnp.complex64))
    coeffs = None
    if method == "chebyshev":
        if Ebounds is None:
            Ebounds = estimate_energy_bounds(mv, model.n_states,
                                             mask=model.valid_mask())
        coeffs = chebyshev_coefficients(dt, Ebounds[0], Ebounds[1], cheb_n)
    obs = []
    for _ in range(n_steps):
        if method == "chebyshev":
            psi = chebyshev_time_evolve(psi, mv, dt, Ebounds, cheb_n=cheb_n,
                                        coeffs=coeffs)
        elif method == "krylov":
            psi = krylov_time_evolve(psi, mv, dt, kry_m=kry_m)
        else:
            raise ValueError(f"unknown method {method!r}")
        obs.append(np.asarray(observe(psi, model)))
    return psi, np.asarray(obs)


def lanczos_groundstate_checkpointed(
    matvec,
    N: int | None,
    checkpoint_dir: str,
    lanc_m: int = 40,
    cycles: int = 6,
    tol: float = 1e-12,
    dtype=None,
    key=None,
    mask=None,
    target_residual: float | None = None,
    v0=None,
    sharding=None,
    save_every: int = 1,
):
    """Restarted two-pass ground state with per-cycle checkpoint/resume.

    Addresses SURVEY.md §5 checkpoint row for LONG solves (the reference
    recomputes everything on every run): after each restart cycle the Ritz
    vector + (E0, residual, cycle, alpha/beta history) are persisted via
    utils/checkpoint (orbax for sharded states — each host writes its own
    shards; npz fallback single-process). On start, an existing checkpoint in
    `checkpoint_dir` is resumed; because each cycle is a deterministic
    function of psi (solvers/lanczos.restart_cycle), a killed-and-resumed run
    reproduces the uninterrupted trajectory BIT-FOR-BIT (tested in
    tests/test_distributed.py). Pass `sharding` to restore the state onto a
    mesh (e.g. parallel/sharded_kron_scaling's P(rows))."""
    import jax.numpy as jnp

    from ..utils.checkpoint import load_checkpoint, save_checkpoint
    from .lanczos import _random_start, restart_cycle

    if dtype is None:
        dtype = jnp.float32 if v0 is None else v0.dtype
    start_cycle = 0
    info = {}
    E0 = None
    psi = None
    meta_path = os.path.join(checkpoint_dir, "meta.json")
    if os.path.exists(meta_path):
        psi, meta, _extra = load_checkpoint(checkpoint_dir, sharding=sharding)
        psi = psi.astype(dtype)
        start_cycle = int(meta["cycle"])
        E0 = meta.get("E0")
        info = {"residual": meta.get("residual"), "resumed_at": start_cycle}
        if target_residual is not None and meta.get("residual") is not None \
                and meta["residual"] < target_residual:
            return E0, psi, dict(info, cycles=start_cycle)
    if psi is None:
        psi = v0 if v0 is not None else _random_start(N, dtype, key, mask)
        if sharding is not None:
            psi = jax.device_put(psi, sharding)
    for c in range(start_cycle, cycles):
        holder = [psi]
        psi = None  # ownership transfer (see restart_cycle docstring)
        E0, psi, cinfo = restart_cycle(matvec, holder, lanc_m, tol=tol,
                                       dtype=dtype)
        info = dict(cinfo, cycles=c + 1, resumed_at=start_cycle or None)
        if (c + 1) % save_every == 0 or c + 1 == cycles:
            save_checkpoint(
                checkpoint_dir, psi,
                meta={"cycle": c + 1, "E0": E0,
                      "residual": cinfo["residual"], "lanc_m": lanc_m},
                extra_arrays={"evals": cinfo["evals"]},
            )
        if target_residual is not None and cinfo["residual"] < target_residual:
            break
    return E0, psi, info


def groundstate_kron(model, lanc_m: int = 40, cycles: int = 6,
                     target_residual: float | None = 1e-3, key=None,
                     fused: bool = True, dtype=None, mesh=None,
                     axis_name: str = "rows", reorth=None):
    """Ground state of a sector_kron model in BLOCKS form (the TPU fast path).

    Runs the restarted two-pass Lanczos (+ Chebyshev-filter polish) on a
    BlockVec state with the fused Pallas hi-local kernel (ops/pallas_kron)
    when `fused` and the dtype is f32. Returns (E0, psi_blockvec, info,
    layout); use ops.sector_kron.blocks_to_flat for a flat vector.

    This is the path that executes L=32 Sz=0 (N = 6.0e8) on ONE chip — the
    reference tops out at L=20 (examples/example_kpmSqw.jl:11).

    Pass `mesh` to run the whole solve SHARDED: the matvec is the fused
    shard_map kron apply (parallel/sharded_kron_scaling BlockVec form) and
    the returned Ritz vector's leaves stay P(rows)-sharded — the multi-host
    L >= 32 route (per-device memory ~ N/D).

    reorth = "selective" | "full" (VERDICT r4 #8): run ONE stored-basis
    Lanczos cycle with (omega-triggered or every-step) reorthogonalization
    instead of the restarted two-pass — the anti-orthogonality-loss tool on
    the layout where f32 loss actually bites. Memory O(lanc_m * N): use
    only where the basis fits (L <= ~26 on one 16 GB chip at lanc_m = 100);
    `cycles`/`target_residual` are ignored in this mode."""
    import jax

    from ..ops.sector_kron import make_sector_kron_layout, sector_kron_tables
    from .blockvec import BlockVec, bv_random
    from .lanczos import lanczos_groundstate, lanczos_groundstate_restarted

    if model.kron_splits is None:
        raise ValueError("groundstate_kron needs layout='sector_kron'")
    if dtype is None:
        dtype = model.dtype
    lay = make_sector_kron_layout(model, model.kron_splits, model.kron_pads)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.sharded_kron_scaling import (
            shard_kron_blockvec, sharded_kron_scaling_bv_matvec_fn)

        mv, _, spec = sharded_kron_scaling_bv_matvec_fn(
            model, mesh, axis_name=axis_name,
            use_fused=fused and jnp.dtype(dtype) == jnp.float32)
        sh = NamedSharding(mesh, P(axis_name))
        v0 = BlockVec([
            jax.device_put(l, sh) for l in shard_kron_blockvec(
                bv_random(lay, key if key is not None
                          else jax.random.PRNGKey(0), jnp.dtype(dtype)),
                spec).leaves])
        if reorth:
            E0, psi, info = lanczos_groundstate(
                mv, None, lanc_m=lanc_m, dtype=dtype, reorth=reorth, v0=v0)
            return E0, psi, info, lay
        # default _ritz_finalize: one full H|psi> alongside psi — per-device
        # that is ~2 N/D vectors, fine wherever the solve itself fits
        E0, psi, info = lanczos_groundstate_restarted(
            mv, None, lanc_m=lanc_m, cycles=cycles, dtype=dtype,
            target_residual=target_residual, v0=v0)
        return E0, psi, info, lay
    tables = jax.tree_util.tree_map(jnp.asarray, sector_kron_tables(lay))
    use_fused = fused and jnp.dtype(dtype) == jnp.float32

    if use_fused:
        from ..ops.pallas_kron import apply_H_sector_kron_fused

        def mv(bv, s=None, bv0=None):
            axpy = None if s is None else (s, list(bv0.leaves))
            return BlockVec(apply_H_sector_kron_fused(bv.leaves, lay, tables,
                                                      axpy=axpy))

        # Lanczos folds -beta*v_prev into the kernel seed: peak live vectors
        # 4 -> ~3, the margin that fits L=32 (3 GB/vector) on a 16 GB chip
        mv.supports_axpy = True
    else:
        from ..ops.sector_kron import apply_H_sector_kron

        def mv(bv):
            return BlockVec(apply_H_sector_kron(bv.leaves, None, lay, tables))

    v0 = bv_random(lay, key if key is not None else jax.random.PRNGKey(0),
                   jnp.dtype(dtype))
    if reorth:
        E0, psi, info = lanczos_groundstate(
            mv, None, lanc_m=lanc_m, dtype=dtype, reorth=reorth, v0=v0)
        return E0, psi, info, lay
    finalize = _make_bucketed_finalize(lay, tables)
    E0, psi, info = lanczos_groundstate_restarted(
        mv, None, lanc_m=lanc_m, cycles=cycles, dtype=dtype,
        target_residual=target_residual, v0=v0, finalize=finalize)
    return E0, psi, info, lay


@jax.jit
def _phi_planes(leaves, weights):
    """phi = S^z_q psi planes + per-plane ||.||^2 in ONE dispatch, directly
    on BlockVec leaves (no flat round trip — the r3 version paid 2 relayout
    passes per q-point); `weights` is an argument so one trace serves
    every q. Works unchanged on sharded-form leaves (per-axis weights
    broadcast GSPMD-locally). Shared by kpm_sqw_kron and lanczos_sqw_kron."""
    from ..observables_kron import bv_sz_q_apply
    from .blockvec import BlockVec

    pr, pi = bv_sz_q_apply(BlockVec(list(leaves)), weights)
    n2r = sum(jnp.vdot(x, x) for x in pr.leaves)
    n2i = sum(jnp.vdot(x, x) for x in pi.leaves)
    return pr.leaves, pi.leaves, n2r, n2i


def _kron_matvec_for(model, lay, fused: bool, mesh, axis_name: str):
    """One BlockVec H-apply closure for the kron drivers: the shard_map fused
    apply when `mesh` is given, else the fused Pallas kernel (f32) or the XLA
    blocks path. Returns (mv, spec_or_None)."""
    from .blockvec import BlockVec

    if mesh is not None:
        from ..parallel.sharded_kron_scaling import (
            sharded_kron_scaling_bv_matvec_fn)

        mv, _, spec = sharded_kron_scaling_bv_matvec_fn(
            model, mesh, axis_name=axis_name, use_fused=fused)
        return mv, spec
    if fused:
        from ..ops.pallas_kron import apply_H_sector_kron_fused
        from ..ops.sector_kron import _device_tables

        tables = jax.tree_util.tree_map(jnp.asarray, _device_tables(lay))

        def mv(bv):
            return BlockVec(apply_H_sector_kron_fused(bv.leaves, lay, tables))

        return mv, None
    from .blockvec import bv_matvec_fn

    return bv_matvec_fn(lay), None


def lanczos_sqw_kron(model, q_list, omega, lanc_m: int = 100,
                     eta: float = 0.05, broaden: str = "lorentz",
                     gs_lanc_m: int = 40, cycles: int = 6,
                     target_residual: float | None = 1e-3, key=None,
                     fused: bool = True, psi0=None, E0=None, info=None,
                     tol: float = 1e-12, mesh=None,
                     axis_name: str = "rows", plane_mode: str | None = None):
    """T=0 dynamic structure factor S(q, omega) via LANCZOS at kron BlockVec
    scale — the second spectral path at the flagship layout (VERDICT r4 #2;
    kpm_sqw_kron is the KPM path; ref src/LanczosSqw.jl:49-76 whose largest
    committed artifact is L=20).

    Ground state via groundstate_kron (restarted two-pass Lanczos), then per
    q-point: phi_q = S^z_q |psi0> held as an (re, im) REAL plane BlockVec
    pair (zero complex dtypes — relay-safe), basis-free pair Lanczos
    tridiagonalization through the fused Pallas kernel
    (solvers/kron_evolve.lanczos_tridiag_pair), and host-side pole
    broadening (spectral_from_tridiagonal_batched) with weights
    |Q[0, :]|^2 ||phi||^2 at omega = theta - E0.

    Memory: q-points run serially — peak is the GS copy + 3 plane pairs
    regardless of len(q_list). Pass `mesh` to run the ground state AND every
    tridiagonalization on P(rows)-sharded leaves (the shard_map fused apply;
    phi construction is GSPMD-local, dots psum — no gather anywhere).

    plane_mode: "pair" (reference-faithful complex recurrence on the plane
    pair; CPU default) | "split" (accelerator default: S_phi = S_re + S_im,
    exact for real H and real psi0, via two independent real-plane
    tridiagonalizations — the pair-scan program reproducibly faults the
    relay TPU worker, see the in-function comment) | None (auto).

    Returns (S [nq, n_omega] numpy, info dict with E0/residual/plane_mode)."""
    from ..observables_kron import bv_sz_q_weights
    from .blockvec import BlockVec
    from .kron_evolve import lanczos_tridiag_pair
    from .lanczos_sqw import spectral_from_tridiagonal_batched

    if psi0 is None or E0 is None:
        E0, psi0, info, lay = groundstate_kron(
            model, lanc_m=gs_lanc_m, cycles=cycles,
            target_residual=target_residual, key=key, fused=fused,
            mesh=mesh, axis_name=axis_name)
    else:
        from ..ops.sector_kron import make_sector_kron_layout

        lay = make_sector_kron_layout(model, model.kron_splits,
                                      model.kron_pads)
    info = dict(info or {})
    mv, _spec = _kron_matvec_for(model, lay, fused, mesh, axis_name)

    def pmv(pair):
        return (mv(pair[0]), mv(pair[1]))

    # preserve an f64 state for x64 validation; everything else runs f32
    rdt = jnp.dtype(model.dtype) if jnp.dtype(model.dtype) in (
        jnp.dtype(jnp.float32), jnp.dtype(jnp.float64)) else jnp.float32
    psi0 = psi0.astype(rdt)
    hi_lens = [l.shape[0] for l in psi0.leaves]

    if plane_mode is None:
        # "pair" is the reference-faithful complex recurrence
        # (src/Lanczos.jl:180-229 from a complex start). On the relay
        # backend the two-applies-plus-dots scan body reproducibly faults
        # the TPU worker (round-5 finding; the single-BlockVec scan and the
        # two-applies evolve scan each run fine), so accelerators default
        # to "split": S_phi = S_re + S_im — EXACT for real H and real psi0
        # (|<n|phi>|^2 = <n|re>^2 + <n|im>^2, |n> real), evaluated as two
        # independent real-plane tridiagonalizations through the proven
        # _lanczos_scan. Same total matvec count; the finite-m truncation
        # estimator differs (both converge to the same spectrum).
        plane_mode = "pair" if jax.default_backend() == "cpu" else "split"
    # entries: (q_index, alphas, betas, norm); spectra accumulate per q
    entries = []
    for iq, q in enumerate(q_list):
        phi_r, phi_i, n2r, n2i = _phi_planes(
            tuple(psi0.leaves),
            bv_sz_q_weights(lay, float(q), hi_lens, dtype=rdt))
        n2r, n2i = float(n2r), float(n2i)
        if n2r + n2i <= 0.0:
            # zero-norm phi (e.g. q = 0 at Sz = 0): zero spectral row, and
            # the guard runs BEFORE any division (fixes SURVEY.md §2.4-6)
            continue
        if plane_mode == "pair":
            al, be, nrm = lanczos_tridiag_pair(
                pmv, (BlockVec(phi_r), BlockVec(phi_i)), lanc_m=lanc_m,
                tol=tol)
            entries.append((iq, np.asarray(al), np.asarray(be), float(nrm)))
        elif plane_mode == "split":
            from .lanczos import lanczos_iteration

            tot = n2r + n2i
            for leaves, n2 in ((phi_r, n2r), (phi_i, n2i)):
                if n2 <= 1e-12 * tot:
                    continue  # e.g. the sin plane at q = pi (integer sites)
                fac = lanczos_iteration(mv, BlockVec(leaves), lanc_m,
                                        tol=tol)
                entries.append((iq, np.asarray(fac.alphas),
                                np.asarray(fac.betas)[: lanc_m - 1],
                                float(fac.v0_norm)))
        else:
            raise ValueError(f"unknown plane_mode {plane_mode!r}")
    S = np.zeros((len(q_list), len(np.atleast_1d(omega))))
    if entries:
        rows = spectral_from_tridiagonal_batched(
            np.stack([e[1] for e in entries]),
            np.stack([e[2] for e in entries]),
            np.asarray([e[3] for e in entries]),
            float(E0), omega, eta=eta, broaden=broaden)
        for (iq, *_rest), row in zip(entries, rows):
            S[iq] += row
    info.update(E0=float(E0), plane_mode=plane_mode)
    return S, info


def kpm_sqw_kron(model, q_list, omega, kpm_m: int = 100, lanc_m: int = 40,
                 cycles: int = 6, target_residual: float | None = 1e-3,
                 kernel: str = "jackson", key=None, bounds_m: int = 40,
                 doubling_trick: bool = True, fused: bool = True,
                 psi0=None, E0=None, info=None, safety: float = 0.01,
                 bounds=None, mesh=None, axis_name: str = "rows"):
    """T=0 dynamic structure factor S(q, omega) at kron BlockVec scale.

    The reference's largest S(q, omega) demo is L=20
    (examples/example_kpmSqw.jl:11-15,44; kpm_sqw at src/KPM_Sqw.jl:172); this
    runs L=28-30 sectors on ONE chip: ground state via groundstate_kron
    (restarted two-pass Lanczos), phi_q = S^z_q |psi0> held as (re, im) REAL
    plane BlockVecs (zero complex dtypes anywhere — relay-safe), and diagonal
    Chebyshev moments per plane through the fused Pallas kernel. T_n(H~) is
    real symmetric, so <phi|T_n|phi> = <re|T_n re> + <im|T_n im> — the plane
    moments just add. Normalization mirrors kpm_sqw/kpm_sqw_planes (phi
    normalized; rows with ||phi|| = 0 zeroed). Evaluated at EXCITATION
    energies via the E0 shift (see solvers/kpm.kpm_sqw docstring).

    Memory: one flat copy of psi0 plus 2 plane BlockVecs + the scan's 3
    live vectors — q-points run serially, so peak is ~6 vectors regardless
    of len(q_list) (vmapping q at L=30 would OOM the chip).

    Returns (S [nq, n_omega] numpy, info dict with E0/residual/bounds)."""
    from ..ops.sector_kron import blocks_to_flat, flat_to_blocks
    from .blockvec import BlockVec
    from .chebyshev import chebyshev_moments, kpm_reconstruct
    from .lanczos import lanczos_iteration, tridiag_eigh

    if psi0 is None or E0 is None:
        E0, psi0, info, lay = groundstate_kron(
            model, lanc_m=lanc_m, cycles=cycles,
            target_residual=target_residual, key=key, fused=fused,
            mesh=mesh, axis_name=axis_name)
    else:
        from ..ops.sector_kron import make_sector_kron_layout

        lay = make_sector_kron_layout(model, model.kron_splits,
                                      model.kron_pads)
    info = dict(info or {})
    # sharded S(q, omega) when mesh is given: the shard_map fused matvec;
    # psi0 and every moment recurrence stay P(rows)-sharded (phi construction
    # is the per-axis-weight elementwise op — GSPMD-local, no gather)
    mv, _spec = _kron_matvec_for(model, lay, fused, mesh, axis_name)

    # spectral bounds: Emin = E0 (exact to the GS residual); Emax from one
    # basis-free Lanczos run on the SAME BlockVec matvec, expanded outward
    # (estimate_energy_bounds rationale — Chebyshev diverges outside [-1,1])
    from .blockvec import bv_random

    if bounds is None:
        v0b = bv_random(lay, jax.random.PRNGKey(7), jnp.float32)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.sharded_kron_scaling import shard_kron_blockvec

            sh = NamedSharding(mesh, P(axis_name))
            v0b = BlockVec([jax.device_put(l, sh)
                            for l in shard_kron_blockvec(v0b, _spec).leaves])
        fac = lanczos_iteration(mv, v0b, bounds_m)
        evals, _ = tridiag_eigh(fac.alphas, fac.betas, fac.m_eff)
        lo, hi = min(float(evals.min()), float(E0)), float(evals.max())
        pad = safety * 0.5 * (hi - lo) + 1e-6
    else:
        (lo, hi), pad = bounds, 0.0
    a = (hi - lo + 2 * pad) / 2.0
    b = (hi + lo) / 2.0
    a_inv = jnp.float32(1.0 / a)
    bb = jnp.float32(b)

    def mvr(bv):
        return (mv(bv) - bb * bv) * a_inv

    from ..observables_kron import bv_sz_q_weights

    psi0 = psi0.astype(jnp.float32)
    hi_lens = [l.shape[0] for l in psi0.leaves]

    S_rows, n2s = [], []
    for q in q_list:
        phi_r, phi_i, n2r, n2i = _phi_planes(
            tuple(psi0.leaves), bv_sz_q_weights(lay, float(q), hi_lens))
        n2 = float(n2r) + float(n2i)
        n2s.append(n2)
        if n2 <= 0.0:
            S_rows.append(np.zeros(kpm_m, np.float32))  # placeholder row
            continue
        inv = jnp.float32(1.0 / np.sqrt(n2))
        mu = (chebyshev_moments(mvr, BlockVec(phi_r) * inv, kpm_m,
                                doubling_trick=doubling_trick)
              + chebyshev_moments(mvr, BlockVec(phi_i) * inv, kpm_m,
                                  doubling_trick=doubling_trick))
        S_rows.append(np.asarray(mu, np.float32))

    om = np.asarray(omega, np.float64) + float(E0)
    S = np.zeros((len(q_list), len(np.atleast_1d(omega))), np.float32)
    for i, (mu_row, n2) in enumerate(zip(S_rows, n2s)):
        if n2 <= 0.0:
            continue
        S[i] = np.asarray(kpm_reconstruct(
            jnp.asarray(mu_row), jnp.asarray(om), a, b, kernel=kernel,
            doubling=True, density_2_over_a=False))
    info.update(E0=float(E0), bounds=(lo - pad, hi + pad), a=a, b=b)
    return S, info


def kpm_correlation_matrix_kron(model, omega, n: int = 300,
                                lanc_m: int = 40, cycles: int = 6,
                                target_residual: float | None = 1e-3,
                                kernel: str = "jackson", key=None,
                                bounds_m: int = 40, fused: bool = True,
                                psi0=None, E0=None, info=None,
                                safety: float = 0.01, a=None, b=None,
                                mesh=None, axis_name: str = "rows",
                                sites=None):
    """C[i, j, omega] = |S_{Sz_i Sz_j}(omega)| for all L x L site pairs at
    kron BlockVec scale (VERDICT r4 #6; flat version solvers/kpm.
    kpm_correlation_matrix; ref src/TimeEvolution/KPM.jl:214-235,72-116).

    Per B-site j (serial — peak memory is psi0 + 3 BlockVecs regardless of
    L): phi_j = Sz_j|psi0> normalized, Chebyshev recurrence
    v_n = T_n(H~)|phi_j> through the fused kernel, and per step the moments
    against ALL A-sites in ONE state pass via the per-axis marginal trick
    (observables_kron.bv_site_moments: mu_n[i] = <psi0| Sz_i |v_n> is a
    weighted-sz sum with weight psi0 * v_n — Sz_i is diagonal). Uses the
    reference's second KPM convention (no n>=1 doubling, 2/a density, abs)
    like the flat path, so the two agree spot-on.

    Pass `mesh` to run psi0 and every recurrence P(rows)-sharded (the
    marginal contractions partition; GSPMD inserts the psums). `sites`
    restricts the B-site loop (C then has shape [L, len(sites), W]).

    Returns (C [L, n_sites, n_omega] numpy, info)."""
    from ..observables_kron import bv_apply_sz, bv_site_moments
    from .blockvec import BlockVec
    from .chebyshev import kpm_reconstruct
    from .lanczos import lanczos_iteration, tridiag_eigh

    if psi0 is None or E0 is None:
        E0, psi0, info, lay = groundstate_kron(
            model, lanc_m=lanc_m, cycles=cycles,
            target_residual=target_residual, key=key, fused=fused,
            mesh=mesh, axis_name=axis_name)
    else:
        from ..ops.sector_kron import make_sector_kron_layout

        lay = make_sector_kron_layout(model, model.kron_splits,
                                      model.kron_pads)
    info = dict(info or {})
    mv, _spec = _kron_matvec_for(model, lay, fused, mesh, axis_name)

    rdt = jnp.dtype(model.dtype) if jnp.dtype(model.dtype) in (
        jnp.dtype(jnp.float32), jnp.dtype(jnp.float64)) else jnp.float32
    psi0 = psi0.astype(rdt)

    if a is None or b is None:
        from .blockvec import bv_random

        v0b = bv_random(lay, jax.random.PRNGKey(7), rdt)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.sharded_kron_scaling import shard_kron_blockvec

            sh = NamedSharding(mesh, P(axis_name))
            v0b = BlockVec([jax.device_put(l, sh)
                            for l in shard_kron_blockvec(v0b, _spec).leaves])
        fac = lanczos_iteration(mv, v0b, bounds_m)
        evals, _ = tridiag_eigh(fac.alphas, fac.betas, fac.m_eff)
        lo, hi = float(evals.min()), float(evals.max())
        if E0 is not None:
            lo = min(lo, float(E0))
        pad = safety * 0.5 * (hi - lo) + 1e-6
        a = (hi - lo + 2 * pad) / 2.0
        b = (hi + lo) / 2.0
        info.update(bounds=(lo - pad, hi + pad))
    a_inv = jnp.asarray(1.0 / a, rdt)
    bb = jnp.asarray(b, rdt)

    def mvr(bv):
        return (mv(bv) - bb * bv) * a_inv

    @partial(jax.jit, static_argnums=(2,))
    def _moments_all_A(psi_leaves, phi_leaves, n):
        """[n, L] moments of one B-state against all A-sites: the Chebyshev
        recurrence with a one-pass marginal contraction per step."""
        psi = BlockVec(list(psi_leaves))
        phi = BlockVec(list(phi_leaves))

        def mu(v):
            return bv_site_moments(
                [p * x for p, x in zip(psi.leaves, v.leaves)], lay)

        v_curr = mvr(phi)
        mu0 = mu(phi)
        mu1 = mu(v_curr)

        def step(carry, _):
            v_prev, v_curr = carry
            v_next = mvr(v_curr) * 2.0 - v_prev
            return (v_curr, v_next), mu(v_next)

        _, mus = jax.lax.scan(step, (phi, v_curr), None, length=n - 2)
        return jnp.concatenate([mu0[None], mu1[None], mus], axis=0)

    if sites is None:
        sites = range(model.L)
    mu_rows, norms = [], []
    for j in sites:
        phi = bv_apply_sz(psi0, lay, j)
        n2 = float(sum(jnp.vdot(x, x) for x in phi.leaves))
        if n2 <= 0.0:
            mu_rows.append(np.zeros((n, model.L), np.float64))
            norms.append(0.0)
            continue
        nrm = np.sqrt(n2)
        phi = phi * jnp.asarray(1.0 / nrm, rdt)
        mu = _moments_all_A(tuple(psi0.leaves), tuple(phi.leaves), n)
        mu_rows.append(np.asarray(mu, np.float64) * nrm)
        norms.append(nrm)
    mu_all = jnp.asarray(np.stack(mu_rows).transpose(0, 2, 1))  # [B, L_A, n]
    omega = jnp.asarray(np.asarray(omega, np.float64))
    S = kpm_reconstruct(mu_all, omega, a, b, kernel=kernel, doubling=False,
                        density_2_over_a=True, clamp=None, clip_nonneg=True)
    C = np.abs(np.asarray(jnp.swapaxes(S, 0, 1)))  # [i=A, j=B, W]
    info.update(E0=None if E0 is None else float(E0), a=float(a), b=float(b))
    return C, info


def _make_bucketed_finalize(layout, tables, n_buckets: int = 4):
    """Memory-lean Ritz finalize for BlockVec kron states.

    The one-jit finalize holds psi + the full H psi + group temps at once —
    at L=32 (3 GB/vector) that brushes the 16 GB HBM ceiling. This variant
    normalizes psi (donated scale), then runs TWO bucket sweeps with the
    group-filtered XLA apply: sweep 1 accumulates E = <psi|H|psi> as scalars,
    sweep 2 (E known) accumulates ||(H psi)_g - E psi_g||^2. Peak memory =
    psi + one bucket of outputs. Costs 2 extra applies per call — noise next
    to a 60-apply restart cycle."""
    import jax

    from ..ops.sector_kron import apply_H_sector_kron
    from ..utils.compensated import vdot2
    from .blockvec import BlockVec

    n_groups = len(layout.groups)
    edges = np.linspace(0, n_groups, n_buckets + 1).astype(int)
    buckets = [tuple(range(edges[i], edges[i + 1])) for i in range(n_buckets)
               if edges[i] < edges[i + 1]]

    @jax.jit
    def _nrm2(leaves):
        return sum(jnp.real(vdot2(x, x)) for x in leaves)

    @partial(jax.jit, donate_argnums=(0,))
    def _scale(leaves, s):
        return [x * s.astype(x.dtype) for x in leaves]

    @partial(jax.jit, static_argnums=(1,))
    def _e_part(leaves, bucket, tabs):
        h = apply_H_sector_kron(list(leaves), None, layout, tabs,
                                group_filter=bucket)
        return sum(jnp.real(vdot2(leaves[g], h[g])) for g in bucket)

    @partial(jax.jit, static_argnums=(1,))
    def _r_part(leaves, bucket, tabs, E):
        h = apply_H_sector_kron(list(leaves), None, layout, tabs,
                                group_filter=bucket)
        return sum(jnp.real(vdot2(h[g] - leaves[g] * E, h[g] - leaves[g] * E))
                   for g in bucket)

    def finalize(matvec, psi_unnorm):
        del matvec
        leaves = list(psi_unnorm.leaves)
        del psi_unnorm
        # barrier: let the second-pass scan finish and its intermediates
        # free before dispatching anything new — async dispatch otherwise
        # overlaps the scan's peak working set with the finalize temps,
        # which is what OOMed the first L=32 attempts (3 GB/vector).
        jax.block_until_ready(leaves[0])
        nrm = jnp.sqrt(jnp.maximum(_nrm2(leaves), 0.0))
        leaves = _scale(leaves, 1.0 / nrm)
        E = sum(_e_part(leaves, b, tables) for b in buckets)
        r2 = sum(_r_part(leaves, b, tables, E) for b in buckets)
        resid = jnp.sqrt(jnp.maximum(r2, 0.0))
        return BlockVec(leaves), E, resid

    return finalize
