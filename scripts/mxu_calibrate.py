#!/usr/bin/env python
"""Measure the MXU matmul speed-of-light per precision mode on this chip.

Calibrates BENCH_F32_TFLOPS (bench.py's roofline denominator) and documents
the accuracy of each mode at the sector_kron contraction shapes
([M, 512] @ [512, 512], the W_lo/cross class). Measured on the v5e relay
(2026-08, docs/DESIGN.md §8):

    prec=default   0.806 ms   42.6 TFLOP/s   rel err 2.4e-3  (bf16 truncation!)
    prec=high      0.969 ms   35.5 TFLOP/s   rel err 1.4e-5  (3-pass bf16)
    prec=highest   1.587 ms   21.7 TFLOP/s   rel err 1.2e-7  (full f32)
    one-hot matrix @ default: |err| 1.5e-2 max (the INPUT gets truncated)
    bf16 x bf16    0.491 ms   70.0 TFLOP/s   (--bf16: both operands stored
    bf16, f32 accumulate — the denominator for the opt-in bf16 amplitude
    mode, BENCH_BF16_TFLOPS; faster than f32-operand prec=default because
    the halved operand bytes also halve the VMEM traffic feeding the MXU)

The physics needs <= ~1e-5 per contraction (ground-state residual 1e-3 at
L=32 with ~10 contractions/apply and ||H||~30), so `high` (or the in-kernel
split-2 bf16 equivalent, ops/pallas_kron._dot_split2) is the required mode
and 35.5e12 is the honest achievable-peak denominator.
"""

import time
from functools import partial
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    M, K = 65536, 512
    A = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.float32)
    W = jax.random.normal(jax.random.PRNGKey(1), (K, K), jnp.float32) / np.sqrt(K)

    def mk(prec):
        @partial(jax.jit, static_argnums=(2,))
        def chain(A, W, rep):
            def body(v, _):
                w = jnp.einsum("mk,kn->mn", v, W, precision=prec,
                               preferred_element_type=jnp.float32)
                return w / jnp.linalg.norm(w), None

            v, _ = jax.lax.scan(body, A, None, length=rep)
            return jnp.sum(v)

        return chain

    flops = 2 * M * K * K
    for prec in ("default", "high", "highest"):
        ch = mk(prec)
        float(ch(A, W, 2))
        t0 = time.time(); float(ch(A, W, 2)); tA = time.time() - t0
        float(ch(A, W, 34))
        t0 = time.time(); float(ch(A, W, 34)); tB = time.time() - t0
        dt = (tB - tA) / 32
        print(f"prec={prec:8s} {dt*1e3:7.3f} ms  {flops/dt/1e12:7.2f} TFLOP/s",
              flush=True)

    if "--bf16" in sys.argv:
        # both operands stored bf16 (the amplitude-mode layout), f32 accum
        Ab, Wb = A.astype(jnp.bfloat16), W.astype(jnp.bfloat16)

        @partial(jax.jit, static_argnums=(2,))
        def chain_bf(Ab, Wb, rep):
            def body(v, _):
                w = jnp.einsum("mk,kn->mn", v, Wb,
                               preferred_element_type=jnp.float32)
                w = w / jnp.linalg.norm(w.astype(jnp.float32))
                return w.astype(jnp.bfloat16), None

            v, _ = jax.lax.scan(body, Ab, None, length=rep)
            return jnp.sum(v.astype(jnp.float32))

        float(chain_bf(Ab, Wb, 2))
        t0 = time.time(); float(chain_bf(Ab, Wb, 2)); tA = time.time() - t0
        float(chain_bf(Ab, Wb, 34))
        t0 = time.time(); float(chain_bf(Ab, Wb, 34)); tB = time.time() - t0
        dt = (tB - tA) / 32
        print(f"bf16 x bf16  {dt*1e3:7.3f} ms  {flops/dt/1e12:7.2f} TFLOP/s",
              flush=True)

    ref = np.asarray(A[:1024], np.float64) @ np.asarray(W, np.float64)
    for prec in ("default", "high", "highest"):
        out = np.asarray(jax.jit(
            lambda a, w: jnp.einsum("mk,kn->mn", a, w, precision=prec,
                                    preferred_element_type=jnp.float32)
        )(A[:1024], W), np.float64)
        err = np.abs(out - ref).max() / np.abs(ref).max()
        print(f"prec={prec:8s} rel err {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
