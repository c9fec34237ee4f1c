"""bench.py smoke (tiny CPU config) + misc util coverage."""

import json
import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np


def test_bench_smoke():
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", BENCH_PLATFORM="cpu", BENCH_L="10",
               BENCH_BACKEND="blocked", BENCH_REPS="5")
    out = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True,
        timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-500:]
    line = out.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    assert rec["value"] > 0


def test_complex_io_helpers():
    from spindynamics_tpu.utils.complex_io import (
        complex_from_planes, planes_from_complex, to_host, wrap_complex_io)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=8) + 1j * rng.normal(size=8))
    p = planes_from_complex(x)
    assert p.shape == (2, 8)
    back = complex_from_planes(p, jnp.complex128)
    assert np.allclose(np.asarray(back), np.asarray(x))
    h = to_host(x)
    assert np.allclose(h, np.asarray(x))
    assert to_host(jnp.asarray([True, False])).dtype == bool
    assert to_host(jnp.arange(3, dtype=jnp.uint32)).dtype == np.uint32

    f = wrap_complex_io(lambda psi: 1j * psi, jnp.complex128)
    out = np.asarray(f(p))
    want = np.asarray(planes_from_complex(1j * x))
    assert np.allclose(out, want)


def test_slope_timer():
    import jax
    from functools import partial
    from spindynamics_tpu.utils.profiling import slope_timer

    @partial(jax.jit, static_argnums=(1,))
    def chain(x, rep):
        def body(v, _):
            return v * 1.0000001, None
        v, _ = jax.lax.scan(body, x, None, length=rep)
        return jnp.sum(v)

    t = slope_timer(chain, jnp.ones(1024))
    assert t >= 0.0


def test_profiler_trace_writes_dump(tmp_path):
    """utils/profiling.trace captures a real jax.profiler dump (SURVEY §5
    tracing row): the trace dir gains a plugins/profile timeline."""
    import glob
    import os

    import jax
    import jax.numpy as jnp

    from spindynamics_tpu.utils.profiling import annotate, trace

    d = str(tmp_path / "tr")

    @jax.jit
    def f(x):
        with annotate("test-phase"):
            return jnp.sum(x * x)

    with trace(d):
        jax.block_until_ready(f(jnp.arange(1024.0)))
    dumps = glob.glob(os.path.join(d, "plugins", "profile", "*", "*"))
    assert dumps, f"no profiler dump written under {d}"
