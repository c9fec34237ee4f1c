"""Profiling / observability helpers (the reference has only ad-hoc @time calls
— SURVEY.md §5). Thin wrappers over jax.profiler plus a dispatch-latency-immune
timer for chained device work."""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "annotate", "slope_timer"]


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/spindyn_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/XProf.

    Usage: `with trace("/tmp/t"): jax.block_until_ready(solve(...))` — the
    trace directory gains a plugins/profile/<ts>/ dump (device timelines,
    HLO op durations). Wrap the solve, not the trace, in block_until_ready:
    async dispatch otherwise ends the trace before the work runs
    (exercised in tests/test_bench_and_utils.py)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope for solver phases: ops traced inside show under `name`
    in the profiler timeline (jax.named_scope; also groups HLO ops in
    compiled-module dumps). Use around recurrence stages when hunting
    where an apply's time goes."""
    return jax.named_scope(name)


def slope_timer(chain_fn, *args, r0: int = 4, r1: int = 36):
    """Per-iteration time of `chain_fn(*args, rep)` measured as the slope
    between two chain lengths.

    chain_fn must run its work `rep` times inside one jit (e.g. a lax.scan) and
    return something forcing execution (a scalar). Slope timing cancels both
    dispatch latency and constant overheads — on remote-attached accelerators
    per-call wall time is meaningless."""
    float(chain_fn(*args, r0))
    t0 = time.time()
    float(chain_fn(*args, r0))
    ta = time.time() - t0
    float(chain_fn(*args, r1))
    t0 = time.time()
    float(chain_fn(*args, r1))
    tb = time.time() - t0
    return max((tb - ta) / (r1 - r0), 0.0)
