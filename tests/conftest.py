"""Test configuration: CPU backend with 8 virtual devices, float64.

The reference C++ core is float64-only; the test suite runs the JAX
implementation in x64 on a virtual 8-device CPU mesh so sharding tests work
without multi-chip hardware.  Benchmarks (bench.py) run float32 on the real
TPU chip instead.

The ambient environment registers a remote-TPU PJRT plugin via a
sitecustomize hook and pins JAX_PLATFORMS to it; overriding the platform
through jax.config (after import, before backend initialization) reliably
forces CPU regardless.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
