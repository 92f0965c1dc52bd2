"""Global numerics configuration for the TPU-native Cornell-MOE rebuild.

The reference C++ core (``/root/reference/moe/optimal_learning/cpp``) runs
exclusively in float64.  On TPU, float32 is the fast path (MXU), so the
library is dtype-polymorphic: every function operates in the dtype of its
inputs, with jitter policy scaled appropriately.  Tests enable x64 on CPU to
match the reference tolerances; benchmarks run float32/bfloat16 on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Jitter added to the diagonal of the posterior covariance of points-to-sample
# before Cholesky inside the MC-EI estimator.  Mirrors the hard-coded 1.0e-6
# in the reference (gpp_math.cpp:2000-2002).
EI_VARIANCE_JITTER = 1.0e-6

# Minimum standard deviation guard used by the analytic 1,0-EI formulas,
# mirroring kMinimumStdDev (gpp_math.hpp:291).
MINIMUM_STD_DEV = 1.0e-14

# Default relative jitter for training-covariance Cholesky in low precision.
# The reference relies on observation noise for conditioning; in float32 we
# optionally add a small relative diagonal term.
F32_CHOLESKY_JITTER = 1.0e-6

# Low-byte (bfloat16) streaming of the KG fantasy solve chain —
# EVALUATED AND REJECTED as a default (round 5).  The d-KG breakdown
# (benchmarks/DKG_BREAKDOWN_r05.json) measured the (N_ch, N_ch) factor
# matmuls as the HBM bottleneck, and this path streams the explicit
# inverse in bf16 with one f32 residual refinement.  Measured on the
# real chip at the 500-obs bench: the refined va still carries ~2.5e-3
# relative error (one bf16 correction against cond(L)~10), and
# var_u = prior - va^T va sits ~2 orders below |va|^2 there, so the
# fantasy VARIANCE inherits O(0.5) relative error — KG at the chosen
# point collapsed from -0.0078 to -0.0002 and the gated solver ran 1.8x
# LONGER chasing the corrupted objective (bench 0.420 s vs 0.235 s).
# The estimator's accuracy floor (KG lives 2-3 orders below the
# mean/variance scales it is a difference of) rules out half-precision
# storage on this chain; docs/dkg_bytes_r05.md carries the analysis.
# "always" keeps the path testable (tests/test_linalg.py,
# tests/test_knowledge_gradient.py pin its error structure); "never"
# (default) is the full-f32 production path.
KG_FANTASY_LOWP = "never"


def kg_fantasy_lowp_enabled(dtype) -> bool:
    """Resolve the KG_FANTASY_LOWP gate for inputs of ``dtype``."""
    if KG_FANTASY_LOWP == "never" or dtype != jnp.float32:
        return False
    if KG_FANTASY_LOWP == "always":
        return True
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def enable_x64() -> None:
    """Enable float64 globally (used by the CPU test suite for C++ parity)."""
    jax.config.update("jax_enable_x64", True)


_cache_enabled = False


def enable_compilation_cache(path: str = None) -> None:
    """Turn on JAX's persistent compilation cache (idempotent).

    First-iteration compiles of the KG suggest programs run minutes on a
    remote-TPU link; the persistent cache makes later processes reuse them
    (measured 11.6s -> 1.6s on a mid-sized program).  Called by the
    driver, bench, and PES entry points.
    """
    global _cache_enabled
    if _cache_enabled:
        return
    import os
    path = path or os.environ.get(
        "CORNELL_MOE_JAX_CACHE",
        os.path.expanduser("~/.cache/cornell_moe_tpu_jax"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _cache_enabled = True


def default_dtype():
    """Return float64 when x64 is enabled, else float32."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
