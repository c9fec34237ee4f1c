"""Test configuration: run on CPU with 8 virtual devices (the TPU-world fake
backend for multi-chip testing, SURVEY.md §4) and float64 enabled for the
reference's 1e-12 oracles.

NOTE: the ambient environment pins JAX_PLATFORMS=axon (TPU tunnel) via a
sitecustomize hook, so env vars alone are not enough — the jax config must be
overridden in-process before any backend initialization."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest

# Build the optional native lib once per session if a toolchain is present,
# so test_native.py runs on fresh checkouts instead of skipping (the .so is
# gitignored build output). Failure is fine — those tests skip gracefully.
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if not os.path.exists(os.path.join(_repo, "csrc", "libspindyn.so")):
    import subprocess

    try:
        subprocess.run(["make", "-C", os.path.join(_repo, "csrc")],
                       capture_output=True, timeout=120, check=False)
    except Exception:
        pass


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
