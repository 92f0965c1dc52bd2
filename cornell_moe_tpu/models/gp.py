"""Gaussian-process posterior core.

TPU-native counterpart of ``GaussianProcess`` in the reference
(/root/reference/moe/optimal_learning/cpp/gpp_math.{hpp,cpp}:275-870) and of
the Python wrapper (``cpp_wrappers/gaussian_process.py``).

Design
------
The reference holds mutable state (K_chol_, K_inv_y_) recomputed by
``RecomputeDerivedVariables`` (gpp_math.cpp:481-524) and hand-codes every
spatial gradient, including the Smith-1995 differentiated Cholesky
(gpp_math.cpp:561-611).  Here the GP is an immutable pytree
(:class:`GaussianProcessState`) produced by :func:`fit_gp`; every posterior
quantity is a pure jittable function of the state, and all gradients come
from JAX autodiff (``jax.jacfwd`` over these functions replaces ~2k LoC of
hand-coded derivative chains).

Derivative observations follow the reference channel layout: each sampled
point carries ``1 + m`` observation channels (value + the listed partial
derivatives), so the training system has ``n * (1 + m)`` rows
(gpp_math.cpp:391-417).  The prior mean is the empirical mean of the value
channel, subtracted from value channels only (gpp_math.cpp:498-510).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from cornell_moe_tpu.models import covariance as cov_mod
from cornell_moe_tpu.models.covariance import StationaryCovariance
from cornell_moe_tpu.ops import linalg


class GaussianProcessState(struct.PyTreeNode):
    """Immutable fitted-GP state (counterpart of GaussianProcess members)."""

    covariance: StationaryCovariance
    noise_variance: jax.Array          # (1 + m,) per-channel observation noise
    points_sampled: jax.Array          # (n, dim)
    points_sampled_value: jax.Array    # (n, 1 + m)
    derivatives: Tuple[int, ...] = struct.field(pytree_node=False)
    chol_K: jax.Array                  # (n*(1+m), n*(1+m)) lower factor
    K_inv_y: jax.Array                 # (n*(1+m),)
    mean: jax.Array                    # scalar prior mean (value channels)
    # Explicit L^-1 (inverse Cholesky factor), precomputed at fit time.
    # TPU-native choice: triangular solves are sequential and latency-bound
    # on TPU, so the acquisition hot paths use inv_chol matmuls (MXU, Gram
    # form — numerically equivalent to the solve path) instead; None falls
    # back to Cholesky solves (e.g. after an incremental append).
    inv_chol_K: Optional[jax.Array] = None
    # Per-point extra noise ((n, 1+m)) baked into chol_K at fit time (the
    # shape-bucketing mechanism: PAD_NOISE dummy rows).  Carried so that
    # any refit from the state's raw arrays (e.g. the heuristic-EI fantasy
    # loop) preserves it instead of promoting dummy rows to full-weight
    # observations.
    point_noise: Optional[jax.Array] = None

    @property
    def dim(self) -> int:
        return self.points_sampled.shape[-1]

    @property
    def num_sampled(self) -> int:
        return self.points_sampled.shape[-2]

    @property
    def num_derivatives(self) -> int:
        return len(self.derivatives)

    @property
    def best_observed_value(self) -> jax.Array:
        return jnp.min(self.points_sampled_value[..., 0], axis=-1)

    @property
    def best_observed_point(self) -> jax.Array:
        idx = jnp.argmin(self.points_sampled_value[..., 0], axis=-1)
        return self.points_sampled[idx]


def fit_gp(covariance: StationaryCovariance, noise_variance,
           points_sampled, points_sampled_value,
           derivatives: Sequence[int] = (), jitter: float = 0.0,
           mean: Optional[jax.Array] = None,
           precompute_inverse: bool = True,
           point_noise=None) -> GaussianProcessState:
    """Build the derived GP state (RecomputeDerivedVariables counterpart).

    ``points_sampled_value`` has shape (n, 1 + m); ``noise_variance`` has
    one entry per channel.  ``mean`` defaults to the empirical mean of the
    value channel (gpp_math.cpp:498-505).

    ``point_noise`` (optional, (n, 1+m)) is added per point on top of the
    per-channel noise — the shape-bucketing mechanism: padded dummy points
    carry huge noise so they contribute nothing to the posterior while
    keeping array shapes (and therefore compiled programs) stable as
    observations accumulate.
    """
    derivatives = tuple(int(i) for i in derivatives)
    x = jnp.asarray(points_sampled)
    y = jnp.asarray(points_sampled_value)
    if y.ndim == 1:
        y = y[:, None]
    noise = jnp.asarray(noise_variance, x.dtype).reshape(-1)
    if covariance.dim != x.shape[-1]:
        raise ValueError(
            f"covariance has {covariance.dim} length scales but points "
            f"have dim {x.shape[-1]}")
    if noise.shape[0] != 1 + len(derivatives):
        raise ValueError(
            f"noise_variance has {noise.shape[0]} channels, expected "
            f"{1 + len(derivatives)} (value + derivative observations)")
    if y.shape[-1] != 1 + len(derivatives):
        raise ValueError(
            f"values have {y.shape[-1]} channels, expected "
            f"{1 + len(derivatives)}")

    total_noise = noise if point_noise is None else \
        jnp.asarray(point_noise, x.dtype) + noise[None, :]
    k = cov_mod.build_covariance_matrix_with_noise(
        covariance, x, derivatives, total_noise)
    if isinstance(jitter, (int, float)):
        chol = linalg.cholesky(k, jitter=jitter)
    else:
        # traced per-walker jitter (the f32 ensemble-fit policy scales it
        # by the walker's amplitude hyperparameter)
        chol = linalg.cholesky(linalg.add_jitter(k, jitter))

    if mean is None:
        mean = jnp.mean(y[:, 0])
    y_centered = y.at[:, 0].add(-mean).reshape(-1)
    k_inv_y = linalg.cho_solve(chol, y_centered)
    inv_chol = linalg.solve_triangular(
        chol, jnp.eye(chol.shape[0], dtype=x.dtype), lower=True) \
        if precompute_inverse else None

    return GaussianProcessState(
        covariance=covariance, noise_variance=noise, points_sampled=x,
        points_sampled_value=y, derivatives=derivatives, chol_K=chol,
        K_inv_y=k_inv_y, mean=jnp.asarray(mean, x.dtype),
        inv_chol_K=inv_chol,
        point_noise=None if point_noise is None else
        jnp.asarray(point_noise, x.dtype))


# ---------------------------------------------------------------------------
# Posterior quantities (pure functions of the state)
# ---------------------------------------------------------------------------

def _mix_cov(state: GaussianProcessState, points_to_sample: jax.Array,
             derivatives_to_sample: Sequence[int]) -> jax.Array:
    """K(X_train, X_star) over channels: (n*(1+m), q*(1+ms))."""
    return cov_mod.build_block_covariance(
        state.covariance, state.points_sampled, state.derivatives,
        points_to_sample, derivatives_to_sample)


def posterior_mean(state: GaussianProcessState, points_to_sample,
                   derivatives_to_sample: Sequence[int] = ()) -> jax.Array:
    """Posterior mean over (value + requested derivative) channels.

    Counterpart of ComputeMeanOfAdditionalPoints (gpp_math.hpp:464).
    Returns shape (q, 1 + ms); the prior mean is added to value channels
    only.
    """
    pts = jnp.atleast_2d(jnp.asarray(points_to_sample))
    ds = tuple(int(i) for i in derivatives_to_sample)
    kt = _mix_cov(state, pts, ds)
    mu = linalg.hdot(kt.T, state.K_inv_y).reshape(
        pts.shape[0], 1 + len(ds))
    return mu.at[:, 0].add(state.mean)


def posterior_covariance(state: GaussianProcessState, points_1,
                         points_2=None,
                         derivatives_to_sample: Sequence[int] = ()
                         ) -> jax.Array:
    """Posterior cross-covariance between two point sets.

    Counterpart of ComputeCovarianceOfPoints (gpp_math.hpp:720):
    ``K(A,B) - K(A,X) K^{-1} K(X,B)`` over channel blocks.
    """
    ds = tuple(int(i) for i in derivatives_to_sample)
    a = jnp.atleast_2d(jnp.asarray(points_1))
    b = a if points_2 is None else jnp.atleast_2d(jnp.asarray(points_2))
    prior = cov_mod.build_block_covariance(state.covariance, a, ds, b, ds)
    ka = _mix_cov(state, a, ds)
    kb = ka if points_2 is None else _mix_cov(state, b, ds)
    if state.inv_chol_K is not None:
        # MXU path: inverse-Cholesky matmul + one refinement step.  A bare
        # L^-1 matmul was tried and removed — its forward error (amplified
        # by cond(K)) produced O(1) posterior-variance errors in f32 at 500
        # points; one refinement step restores solve-path accuracy while
        # keeping everything on the MXU.
        va = linalg.solve_lower_with_refinement(state.chol_K,
                                                state.inv_chol_K, ka)
        vb = va if points_2 is None else \
            linalg.solve_lower_with_refinement(state.chol_K,
                                               state.inv_chol_K, kb)
        return prior - linalg.hdot(va.T, vb)
    va = linalg.solve_triangular(state.chol_K, ka, lower=True)
    vb = va if points_2 is None else linalg.solve_triangular(
        state.chol_K, kb, lower=True)
    return prior - linalg.hdot(va.T, vb)


def posterior_variance(state: GaussianProcessState, points_to_sample,
                       derivatives_to_sample: Sequence[int] = ()
                       ) -> jax.Array:
    """Full posterior covariance of the joint over points_to_sample.

    Counterpart of ComputeVarianceOfPoints (gpp_math.hpp:513).
    """
    return posterior_covariance(state, points_to_sample, None,
                                derivatives_to_sample)


def posterior_cholesky_variance(state: GaussianProcessState,
                                points_to_sample,
                                derivatives_to_sample: Sequence[int] = (),
                                jitter: float = 0.0) -> jax.Array:
    """Lower Cholesky of the posterior variance (gpp_math.hpp:? cholesky)."""
    var = posterior_variance(state, points_to_sample, derivatives_to_sample)
    return linalg.cholesky(var, jitter=jitter)


def grad_posterior_mean(state: GaussianProcessState, points_to_sample,
                        derivatives_to_sample: Sequence[int] = ()
                        ) -> jax.Array:
    """d mean / d points_to_sample via autodiff.

    Counterpart of ComputeGradMeanOfPoints (gpp_math.hpp:488).  Returns
    (q, 1 + ms, q, dim); the reference only materializes the diagonal
    (d mu_i / d x_i), recoverable as ``out[i, :, i, :]``.
    """
    pts = jnp.atleast_2d(jnp.asarray(points_to_sample))
    jac = jax.jacfwd(
        lambda p: posterior_mean(state, p, derivatives_to_sample))(pts)
    return jac


def grad_posterior_variance(state: GaussianProcessState, points_to_sample,
                            derivatives_to_sample: Sequence[int] = ()
                            ) -> jax.Array:
    """d Var / d points_to_sample via autodiff (gpp_math.hpp:561-611).

    Returns (N, N, q, dim) with N = q * (1 + ms).
    """
    pts = jnp.atleast_2d(jnp.asarray(points_to_sample))
    return jax.jacfwd(
        lambda p: posterior_variance(state, p, derivatives_to_sample))(pts)


def grad_posterior_cholesky_variance(
        state: GaussianProcessState, points_to_sample,
        derivatives_to_sample: Sequence[int] = (),
        jitter: float = 0.0) -> jax.Array:
    """d chol(Var) / d points_to_sample via autodiff.

    Replaces the hand-coded Smith-1995 differentiated Cholesky
    (gpp_math.cpp:561-611) with JAX's cholesky JVP.
    """
    pts = jnp.atleast_2d(jnp.asarray(points_to_sample))
    return jax.jacfwd(
        lambda p: posterior_cholesky_variance(
            state, p, derivatives_to_sample, jitter=jitter))(pts)


# ---------------------------------------------------------------------------
# Data updates and sampling
# ---------------------------------------------------------------------------

def add_sampled_points(state: GaussianProcessState, new_points,
                       new_values, jitter: float = 0.0,
                       update_mean: bool = True) -> GaussianProcessState:
    """Return a new state conditioned on additional observations.

    Counterpart of AddPointsToGP / AddSampledPointsToGP
    (gpp_math.hpp:393-406).  Uses the O(n^2 q) block-Cholesky append from
    :func:`linalg.chol_update_append` instead of refactorizing, then
    refreshes K_inv_y.
    """
    xp = jnp.atleast_2d(jnp.asarray(new_points))
    yp = jnp.asarray(new_values)
    if yp.ndim == 1:
        yp = yp.reshape(xp.shape[0], -1)

    cross = _mix_cov(state, xp, state.derivatives)
    new_block = cov_mod.build_covariance_matrix_with_noise(
        state.covariance, xp, state.derivatives, state.noise_variance)
    if jitter:
        new_block = linalg.add_jitter(new_block, jitter)
    chol = linalg.chol_update_append(state.chol_K, cross, new_block)

    x = jnp.concatenate([state.points_sampled, xp], axis=0)
    y = jnp.concatenate([state.points_sampled_value, yp], axis=0)
    mean = jnp.mean(y[:, 0]) if update_mean else state.mean
    y_centered = y.at[:, 0].add(-mean).reshape(-1)
    k_inv_y = linalg.cho_solve(chol, y_centered)
    inv_chol = None if state.inv_chol_K is None else \
        linalg.solve_triangular(
            chol, jnp.eye(chol.shape[0], dtype=chol.dtype), lower=True)
    pn = None if state.point_noise is None else jnp.concatenate(
        [state.point_noise, jnp.zeros_like(yp)], axis=0)
    return state.replace(points_sampled=x, points_sampled_value=y,
                         chol_K=chol, K_inv_y=k_inv_y, mean=mean,
                         inv_chol_K=inv_chol, point_noise=pn)


def fantasy_update_vector(state: GaussianProcessState, union_points,
                          eval_points, chol_union: jax.Array,
                          derivatives_to_sample: Sequence[int] = ()
                          ) -> jax.Array:
    """sigma_tilde(a) = PostCov(a, U) C^{-T}, the one-shot fantasy map.

    For fantasy observations ``y_U = mu_U + C z`` (C the Cholesky of the
    union posterior covariance + noise), the fantasized posterior mean is
    exactly ``mu(a) + sigma_tilde(a) @ z``.  This is the quantity the
    reference assembles via ComputeGradInverseCholeskyCovarianceOfPoints
    (gpp_math.hpp:826) inside KG; here it is one triangular solve.

    Returns shape (n_eval * (1+ms), n_union_channels).
    """
    cross = posterior_covariance(state, eval_points, union_points,
                                 derivatives_to_sample)
    # cross is (n_eval_ch, n_union_ch); want cross @ C^{-T}
    return linalg.solve_triangular(chol_union, cross.T, lower=True).T


def sample_point_from_gp(key: jax.Array, state: GaussianProcessState,
                         point_to_sample, noise_variance=None) -> jax.Array:
    """Draw one observation from the posterior at a point.

    Counterpart of SamplePointFromGP (gpp_math.hpp:424).
    """
    pts = jnp.atleast_2d(jnp.asarray(point_to_sample))
    mu = posterior_mean(state, pts)[0, 0]
    var = posterior_variance(state, pts)[0, 0]
    if noise_variance is None:
        noise_variance = state.noise_variance[0]
    std = jnp.sqrt(jnp.maximum(var, 0.0) + noise_variance)
    return mu + std * jax.random.normal(key, dtype=mu.dtype)


def sample_points_from_gp(key: jax.Array, state: GaussianProcessState,
                          points_to_sample, jitter: float = 1e-10
                          ) -> jax.Array:
    """Draw a joint posterior sample at several points (gpp_math.hpp:432)."""
    pts = jnp.atleast_2d(jnp.asarray(points_to_sample))
    mu = posterior_mean(state, pts)[:, 0]
    chol = posterior_cholesky_variance(state, pts, jitter=jitter)
    z = jax.random.normal(key, (pts.shape[0],), dtype=mu.dtype)
    return mu + chol @ z
