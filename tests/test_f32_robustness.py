"""Adversarial f32 robustness sweep (round-3 verdict item 8).

The f32 TPU path leans on two repair mechanisms:
  * the fantasy-model diagonal repair (-1.5 * min negative diag shift,
    acquisition/knowledge_gradient.py _build_fantasy_model_batch) and
  * ensemble-member replacement on non-finite Cholesky
    (models/mcmc.GaussianProcessLogLikelihoodMCMC._finalize_models).

These tests stress the fits where single precision actually breaks —
tight lengthscales, near-duplicate inputs, n = 2000 — and assert the
repair magnitudes stay under documented bounds relative to the f64
oracle, so a future perf round cannot silently trade accuracy for speed.
Bounds are for standardized data (unit-variance values, unit-box inputs,
noise floor 1e-2), the documented f32 operating regime (bench.py).

The reference's analogous guard is philosophy, not mechanism: the
kMinimumStdDev clamp (gpp_math.hpp:291) and the 1e-6 EI jitter
(gpp_math.cpp:2060); it never runs single precision at all.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cornell_moe_tpu.acquisition import knowledge_gradient as kg_mod
from cornell_moe_tpu.models import covariance as cov_mod
from cornell_moe_tpu.models import gp as gp_mod

NOISE_FLOOR = 1e-2   # documented f32 noise floor (bench.py)


def _make_data(rng, n, near_dup_frac=0.0):
    """Standardized synthetic data on the unit box; optionally a fraction
    of near-duplicate points (1e-5 apart — adversarial for the kernel
    matrix's conditioning)."""
    x = rng.random((n, 2))
    if near_dup_frac > 0:
        k = int(n * near_dup_frac)
        x[-k:] = x[:k] + 1e-5 * rng.standard_normal((k, 2))
        x = np.clip(x, 0.0, 1.0)
    y = np.sin(6 * x[:, 0]) + np.cos(4 * x[:, 1])
    y = (y - y.mean()) / y.std()
    return x, y


def _fit(x, y, lengths, dtype, noise=NOISE_FLOOR):
    cov = cov_mod.MaternNu2p5(
        jnp.asarray([1.0, lengths, lengths], dtype))
    return gp_mod.fit_gp(cov, jnp.asarray([noise], dtype),
                         jnp.asarray(x, dtype),
                         jnp.asarray(y, dtype)[:, None])


CASES = [
    # (n, lengthscale, near-duplicate fraction)
    (200, 0.05, 0.0),     # tight lengthscale
    (200, 0.3, 0.1),      # near-duplicate points
    (500, 0.1, 0.05),     # both, bench size
    (2000, 0.2, 0.02),    # large n
]


@pytest.mark.slow
@pytest.mark.parametrize("n,ls,dup", CASES)
def test_f32_posterior_matches_f64_oracle(rng, n, ls, dup):
    """f32 posterior mean/std at random query points vs the f64 oracle:
    errors bounded well below the noise floor at standardized scale."""
    x, y = _make_data(rng, n, dup)
    s32 = _fit(x, y, ls, jnp.float32)
    s64 = _fit(x, y, ls, jnp.float64)
    assert bool(jnp.all(jnp.isfinite(s32.chol_K))), \
        f"f32 Cholesky non-finite at n={n} ls={ls} dup={dup}"
    pts = rng.random((64, 2))
    mu32 = np.asarray(gp_mod.posterior_mean(
        s32, jnp.asarray(pts, jnp.float32))[:, 0], dtype=np.float64)
    mu64 = np.asarray(gp_mod.posterior_mean(
        s64, jnp.asarray(pts))[:, 0])
    var32 = np.asarray(jnp.diagonal(gp_mod.posterior_variance(
        s32, jnp.asarray(pts, jnp.float32))), dtype=np.float64)
    var64 = np.asarray(jnp.diagonal(gp_mod.posterior_variance(
        s64, jnp.asarray(pts))))
    # mean error << noise floor; variance error small relative to the
    # prior amplitude (1.0 after standardization)
    assert np.max(np.abs(mu32 - mu64)) < 0.3 * NOISE_FLOOR, \
        (n, ls, dup, float(np.max(np.abs(mu32 - mu64))))
    assert np.max(np.abs(var32 - var64)) < 0.5 * NOISE_FLOOR, \
        (n, ls, dup, float(np.max(np.abs(var32 - var64))))


@pytest.mark.slow
@pytest.mark.parametrize("n,ls,dup", CASES)
def test_f32_fantasy_repair_stays_bounded(rng, n, ls, dup):
    """The fantasy-model diagonal repair must stay under 10 pct of the
    noise floor across the stress grid (it is exactly zero when the f32
    posterior variance keeps a nonnegative diagonal; the bound caps how
    much estimator distortion the band-aid may ever inject)."""
    x, y = _make_data(rng, n, dup)
    s32 = _fit(x, y, ls, jnp.float32)
    q = 4
    unions = jnp.asarray(rng.random((16, q, 2)), jnp.float32)
    _, chol_u, _, noise_eff = kg_mod._build_fantasy_model_batch(
        s32, unions, ())
    assert bool(jnp.all(jnp.isfinite(chol_u))), \
        f"fantasy Cholesky non-finite at n={n} ls={ls} dup={dup}"
    repair = float(jnp.max(noise_eff)) - NOISE_FLOOR
    assert repair < 0.1 * NOISE_FLOOR, \
        f"f32 diag repair {repair:.2e} exceeds bound at " \
        f"n={n} ls={ls} dup={dup}"


@pytest.mark.slow
def test_f32_kg_estimator_tracks_f64(rng):
    """Batched KG in f32 at the bench shape vs the f64 oracle: the
    estimator (not just the GP posterior) stays within MC-noise-scale
    tolerance, so repairs upstream don't silently bias the acquisition."""
    from cornell_moe_tpu.acquisition.expected_improvement import (
        draw_antithetic_normals)
    from cornell_moe_tpu.ops import optimizers
    from cornell_moe_tpu.ops.domains import TensorProductDomain

    x, y = _make_data(rng, 500, 0.05)
    inner = optimizers.GradientDescentParameters(
        num_multistarts=1, max_num_steps=6, max_num_restarts=1,
        num_steps_averaged=3, gamma=0.0, pre_mult=1.0,
        max_relative_change=0.1)
    discrete64 = jnp.asarray(rng.random((7, 2)))
    unions64 = jnp.asarray(rng.random((8, 2, 2)))
    normals64 = draw_antithetic_normals(jax.random.PRNGKey(3), 64, 2)
    vals = {}
    for dtype in (jnp.float32, jnp.float64):
        dom = TensorProductDomain(
            bounds=jnp.asarray([[0.0, 1.0], [0.0, 1.0]], dtype))
        s = _fit(x, y, 0.2, dtype)
        kg = kg_mod.knowledge_gradient_batch(
            s, unions64.astype(dtype), discrete64.astype(dtype),
            normals64.astype(dtype), dom, inner,
            jnp.asarray(float(y.min()), dtype))
        vals[str(dtype.__name__)] = np.asarray(kg, dtype=np.float64)
    dev = np.max(np.abs(vals["float32"] - vals["float64"]))
    scale = max(float(np.max(np.abs(vals["float64"]))), 1e-3)
    assert dev < 0.05 * scale + 1e-4, (dev, scale)
