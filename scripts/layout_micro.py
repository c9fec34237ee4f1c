#!/usr/bin/env python
"""Microbench: cost of group slice/reshape/concat for candidate state layouts.

Variants (all ~same logical bytes, L=28-ish group structure):
  v1: 1D state, per-group 3D reshape (ch, cm, cl)      [current]
  v2: 1D state, padded (8,128) group dims
  v3: 2D state [R, 512], groups (ch, cmp, 512)
  v4: 2D state [R, 128], groups (ch, cmp, q, 128)
  v5: 1D state, per-group 2D reshape (ch*cm, cl)
Each runs: slice -> reshape -> *1.0001 (+ optional Wlo matmul) -> flatten ->
concat, chained in a scan; slope-timed.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from spindynamics_tpu.ops.sector_kron import _group_list, _pad_up
from spindynamics_tpu.utils.profiling import slope_timer

L = int(sys.argv[1]) if len(sys.argv) > 1 else 28
splits = tuple(int(x) for x in os.environ.get("SPLITS", "11,9,8").split(","))
MM = os.environ.get("MM", "0") == "1"  # include a Wlo-style matmul
nup = L // 2

groups = _group_list(L, nup, splits)
key = jax.random.PRNGKey(0)


def build_variant(kind):
    """Return (state, apply_fn)."""
    specs = []
    off = 0
    for (k_h, k_m, k_l, ch, cm, cl, cmp, clp) in groups:
        if kind == "v1" or kind == "v5":
            shape = (ch, cm, cl) if kind == "v1" else (ch * cm, cl)
            n = ch * cm * cl
        elif kind == "v2":
            shape = (ch, cmp, clp)
            n = ch * cmp * clp
        elif kind == "v3":
            shape = (ch, cmp, 512)
            n = ch * cmp * 512
        elif kind in ("v4", "v6"):
            q = _pad_up(cl, 128) // 128
            shape = (ch, cmp, q, 128)
            n = ch * cmp * q * 128
        specs.append((off, n, shape, cl))
        off += n
    total = off
    if kind in ("v3",):
        state = jax.random.normal(key, (total // 512, 512), jnp.float32)
    elif kind == "v4":
        state = jax.random.normal(key, (total // 128, 128), jnp.float32)
    elif kind == "v6":
        state = jax.random.normal(key, (total,), jnp.float32)
    else:
        state = jax.random.normal(key, (total,), jnp.float32)

    Ws = {}
    if MM:
        for (off, n, shape, cl) in specs:
            lane = shape[-1]
            if len(shape) == 4:
                q = shape[2]
                Ws.setdefault((q, lane), jnp.asarray(
                    np.random.randn(q, lane, q, lane).astype(np.float32) * 0.01))
            else:
                Ws.setdefault(lane, jnp.asarray(
                    np.random.randn(lane, lane).astype(np.float32) * 0.01))

    def apply_fn(x):
        if kind == "v6":
            x = x.reshape(-1, 128)  # single top-level 1D -> 2D view
        outs = []
        flat2d = x.ndim == 2
        lanes = x.shape[1] if flat2d else 1
        for (off, n, shape, cl) in specs:
            if flat2d:
                blk = x[off // lanes : (off + n) // lanes].reshape(shape)
            else:
                blk = x[off : off + n].reshape(shape)
            y = blk * 1.0001
            if MM:
                if len(shape) == 4:
                    W = Ws[(shape[2], shape[3])]
                    y = y + jnp.einsum("hmqr,qrps->hmps", blk, W,
                                       preferred_element_type=jnp.float32)
                else:
                    W = Ws[shape[-1]]
                    y = y + jnp.einsum("...l,ln->...n", blk, W,
                                       preferred_element_type=jnp.float32)
            outs.append(y.reshape((-1, lanes)) if flat2d else y.reshape(-1))
        out = jnp.concatenate(outs)
        return out.reshape(-1) if kind == "v6" else out

    return state, apply_fn


for kind in os.environ.get("KINDS", "v1,v2,v3,v4,v5").split(","):
    state, apply_fn = build_variant(kind)
    nbytes = state.size * 4 / 1e9

    @partial(jax.jit, static_argnums=(1,))
    def chain(x, rep, apply_fn=apply_fn):
        def body(v, _):
            w = apply_fn(v)
            return w / jnp.linalg.norm(w), None
        v, _ = jax.lax.scan(body, x, None, length=rep)
        return jnp.sum(v)

    t0 = time.time()
    dt = slope_timer(chain, state, r0=2, r1=12)
    print(f"{kind}: {dt*1e3:7.2f} ms/pass  state {nbytes:.2f} GB "
          f"(wall {time.time()-t0:.0f}s)", flush=True)
