"""Fused Chebyshev-term kernel (ops/pallas_cheb) vs the XLA scan path.

The fused path must be numerically equivalent to _cheb_kron_scan's XLA tail
(same math, same per-term operation order up to float reassociation inside
the kernel's f32 accumulators). CPU runs the kernels in interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import spindynamics_tpu as sd
from spindynamics_tpu.solvers.blockvec import bv_random, bv_zeros_like
from spindynamics_tpu.solvers.chebyshev import chebyshev_coefficients
from spindynamics_tpu.solvers.kron_evolve import (
    _cheb_kron_scan, kron_planes_matvec_fn)
from spindynamics_tpu.ops.sector_kron import make_sector_kron_layout


def _step_both(L, cheb_n, monkeypatch, state_dtype=jnp.float32, Jz=0.5,
               long_range=False, top_k=None):
    if long_range:
        model = sd.long_range_xy_chain(
            L, lambda i, j: 1.0 / (j - i) ** 2, nup=L // 2,
            dtype=jnp.float32, layout="sector_kron")
    else:
        model = sd.xxz_chain(L, Jxy=1.0, Jz=Jz, nup=L // 2,
                             dtype=jnp.float32, layout="sector_kron")
    lay = make_sector_kron_layout(model, model.kron_splits)
    re = bv_random(lay, jax.random.PRNGKey(0), jnp.float32)
    nrm = float(np.sqrt(sum(float(jnp.vdot(x, x)) for x in re.leaves)))
    pair = ((re * (1.0 / nrm)).astype(state_dtype),
            bv_zeros_like(re).astype(state_dtype))
    c, a, b = chebyshev_coefficients(0.15, -0.8 * L, 0.8 * L, cheb_n)
    c_ri = jnp.asarray(np.stack([c.real, c.imag], axis=1), jnp.float32)
    ab = (jnp.float32(1.0 / a), jnp.float32(b))

    outs = {}
    for mode, env in (("xla", "0"), ("fused", "1")):
        monkeypatch.setenv("SDTPU_CHEB_FUSED", env)
        if top_k is not None:
            monkeypatch.setenv("SDTPU_CHEB_TOPK", str(top_k))
        pmv = kron_planes_matvec_fn(lay, fused=True)
        out = _cheb_kron_scan(pmv, pair, c_ri, ab, cheb_n)
        outs[mode] = [np.asarray(l, np.float64)
                      for p in out for l in p.leaves]
    return outs


@pytest.mark.parametrize("top_k", [None, 2])
def test_fused_term_matches_xla_f32(monkeypatch, top_k):
    """f32: identical math -> agreement at f32 reassociation level.
    top_k=2 forces most groups through the XLA-tail branch of the fused
    path, exercising both branches against the reference scan."""
    outs = _step_both(10, 8, monkeypatch, top_k=top_k)
    for a, b in zip(outs["xla"], outs["fused"]):
        np.testing.assert_allclose(a, b, rtol=2e-6, atol=2e-7)


def test_fused_term_matches_xla_bf16(monkeypatch):
    """bf16 states: the fused path accumulates coefficients from the
    UNROUNDED f32 recurrence value (the XLA path re-reads the bf16-rounded
    store), so agreement is at bf16 resolution, not exact."""
    outs = _step_both(10, 8, monkeypatch, state_dtype=jnp.bfloat16)
    for a, b in zip(outs["xla"], outs["fused"]):
        np.testing.assert_allclose(a, b, rtol=0.05, atol=0.02)


def test_fused_term_long_range_unsupported_seeds(monkeypatch):
    """Long-range bonds produce cross terms the kernel cannot fuse
    (both-matmul local factors) — they must fold into the seeds, not drop."""
    outs = _step_both(8, 6, monkeypatch, long_range=True)
    for a, b in zip(outs["xla"], outs["fused"]):
        np.testing.assert_allclose(a, b, rtol=2e-6, atol=2e-7)


def test_trajectory_routes_fused(monkeypatch):
    """evolve_trajectory_kron under SDTPU_CHEB_FUSED=1 matches the XLA
    route end-to-end (norm drift + observables)."""
    from spindynamics_tpu.solvers.kron_evolve import evolve_trajectory_kron

    model = sd.xxz_chain(10, Jxy=1.0, Jz=0.5, nup=5, dtype=jnp.float32,
                         layout="sector_kron")
    psi0 = int("0101010101", 2)
    kw = dict(dt=0.1, n_steps=2, cheb_n=8, Ebounds=(-9.0, 9.0))
    monkeypatch.setenv("SDTPU_CHEB_FUSED", "0")
    _, obs0, info0 = evolve_trajectory_kron(model, psi0, **kw)
    monkeypatch.setenv("SDTPU_CHEB_FUSED", "1")
    _, obs1, info1 = evolve_trajectory_kron(model, psi0, **kw)
    np.testing.assert_allclose(obs0, obs1, rtol=1e-5, atol=1e-6)
    assert abs(info0["norm_drift"] - info1["norm_drift"]) < 1e-5
