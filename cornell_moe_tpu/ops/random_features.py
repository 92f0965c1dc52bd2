"""Random Fourier feature GP sampling and approximate global-optima draws.

Counterpart of ``python/random_features.py`` in the reference (Bochner
random features + Woodbury posterior over feature weights, used both for
``sample_global_optima`` and by PES).  Hernandez-Lobato et al. 2014,
section 2.1.

Differences from the reference (host numpy + scipy SLSQP): everything is
jnp, the feature-weight posterior is one Cholesky on device, derivative
observations are handled by vmapped feature rows, and the argmin search is
the shared multistart-SGA optimizer, vmapped over sample draws.  The
spectral measure matches the kernel: Gaussian for the squared exponential,
multivariate-t (chi-square mixture) for Matérn-5/2 — the reference always
uses the Gaussian measure even for its Matérn GPs.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cornell_moe_tpu.models.covariance import MaternNu2p5
from cornell_moe_tpu.models.gp import GaussianProcessState
from cornell_moe_tpu.ops import linalg, optimizers


class RandomFeatureSample(NamedTuple):
    """One posterior GP sample in weight space: f(x) = phi(x) @ theta."""
    w: jax.Array        # (n_features, dim) spectral frequencies
    b: jax.Array        # (n_features,) phases
    theta: jax.Array    # (n_features,) sampled weights
    scale: jax.Array    # sqrt(2 sigma2 / n_features)


def _spectral_frequencies(key: jax.Array, state: GaussianProcessState,
                          n_features: int) -> jax.Array:
    """Draw W from the kernel's spectral measure, scaled by lengths."""
    lengths = state.covariance.lengths
    dim = state.dim
    kz, kc = jax.random.split(key)
    z = jax.random.normal(kz, (n_features, dim),
                          dtype=state.points_sampled.dtype)
    if isinstance(state.covariance, MaternNu2p5):
        # Matern(nu): W = Z / sqrt(u / (2 nu)), u ~ chi2(2 nu); nu = 5/2
        nu = 2.5
        u = 2.0 * jax.random.gamma(kc, nu, (n_features, 1),
                                   dtype=z.dtype)
        z = z / jnp.sqrt(u / (2.0 * nu))
    return z / lengths


def _feature_rows(w, b, scale, x):
    """phi(x) for a batch of points: (n_features, n_points)."""
    return scale * jnp.cos(w @ x.T + b[:, None])


def _feature_grad_rows(w, b, scale, x, deriv_idx):
    """d phi / d x_i rows for derivative-observation channels."""
    return -scale * jnp.sin(w @ x.T + b[:, None]) * w[:, deriv_idx:
                                                      deriv_idx + 1]


def sample_gp_with_random_features(key: jax.Array,
                                   state: GaussianProcessState,
                                   n_features: int,
                                   use_woodbury_if_faster: bool = True
                                   ) -> RandomFeatureSample:
    """Draw one approximate GP posterior sample (random_features.py:29).

    The Bayesian linear model phi(x)^T theta with unit Gaussian prior on
    theta conditions on the (noise-whitened) observations, including
    derivative channels; we then sample theta from its posterior.
    """
    dtype = state.points_sampled.dtype
    kw, kb, kr = jax.random.split(key, 3)
    sigma2 = state.covariance.alpha
    scale = jnp.sqrt(2.0 * sigma2 / n_features)
    w = _spectral_frequencies(kw, state, n_features)
    b = jax.random.uniform(kb, (n_features,), dtype=dtype,
                           maxval=2.0 * math.pi)
    randomness = jax.random.normal(kr, (n_features,), dtype=dtype)

    n = state.num_sampled
    if n == 0:
        return RandomFeatureSample(w=w, b=b, theta=randomness, scale=scale)

    x = state.points_sampled
    nu2 = state.noise_variance
    rows = [_feature_rows(w, b, scale, x) / jnp.sqrt(nu2[0])]
    for c, i in enumerate(state.derivatives):
        rows.append(_feature_grad_rows(w, b, scale, x, i)
                    / jnp.sqrt(nu2[1 + c]))
    phi = jnp.concatenate(rows, axis=1)          # (m, n * (1+nd)) F-order
    y = (state.points_sampled_value / jnp.sqrt(nu2)).T.reshape(-1)

    n_ch = phi.shape[1]
    if use_woodbury_if_faster and n_ch < n_features:
        # Woodbury: theta = r - Phi U diag(R) U^T Phi^T r + m_post
        woodbury = phi.T @ phi + jnp.eye(n_ch, dtype=dtype)
        chol_w = linalg.cholesky(woodbury)
        z = phi @ y
        m_post = z - phi @ linalg.cho_solve(chol_w, phi.T @ z)
        d, u = jnp.linalg.eigh(woodbury)
        r = 1.0 / (jnp.sqrt(d) * (jnp.sqrt(d) + 1.0))
        theta = randomness - phi @ (u @ (r * (u.T @ (phi.T @ randomness)))) \
            + m_post
    else:
        a = phi @ phi.T + jnp.eye(n_features, dtype=dtype)
        chol_a = linalg.cholesky(a)
        m_post = linalg.cho_solve(chol_a, phi @ y)
        # sample with covariance A^{-1}: theta = m + L^{-T} r
        theta = m_post + linalg.solve_triangular(chol_a, randomness,
                                                 lower=True, trans=True)
    return RandomFeatureSample(w=w, b=b, theta=theta, scale=scale)


def evaluate_random_feature_sample(sample: RandomFeatureSample,
                                   x: jax.Array) -> jax.Array:
    """f(x) for (n_points, dim) -> (n_points,)."""
    return sample.theta @ _feature_rows(sample.w, sample.b, sample.scale,
                                        jnp.atleast_2d(x))


def global_optimization_of_gp_approximation(
        sample: RandomFeatureSample, domain, grid: jax.Array,
        params: optimizers.GradientDescentParameters = None,
        minimize: bool = True) -> jax.Array:
    """Grid-seed + gradient polish of one sampled function
    (random_features.py:144)."""
    if params is None:
        params = optimizers.GradientDescentParameters(
            num_multistarts=1, max_num_steps=80, max_num_restarts=2,
            gamma=0.7, pre_mult=0.2, max_relative_change=0.8)
    sign = -1.0 if minimize else 1.0

    def value(x):
        return sign * evaluate_random_feature_sample(sample, x[None])[0]

    vg = jax.value_and_grad(value)
    vals = jax.vmap(value)(grid)
    x0 = grid[jnp.argmax(vals)]
    x_opt = optimizers.gradient_ascent(vg, domain, x0, params)
    take_opt = value(x_opt) > vals.max()
    return jnp.where(take_opt, x_opt, x0)


def sample_from_global_optima(key: jax.Array, state: GaussianProcessState,
                              domain, grid: jax.Array, num_points: int,
                              n_features: int = 1000) -> jax.Array:
    """num_points approximate Thompson draws of argmin f
    (random_features.py:171 / SampleGlobalOptimaFromGP counterpart)."""
    keys = jax.random.split(key, num_points)

    def one(k):
        s = sample_gp_with_random_features(k, state, n_features)
        return global_optimization_of_gp_approximation(s, domain, grid)

    return jax.vmap(one)(keys)
