"""Log-likelihood measures for GP model selection.

Counterpart of ``gpp_model_selection.{hpp,cpp}`` in the reference.  The LML
is zero-mean over the raw observation vector (value + derivative channels),
matching LogMarginalLikelihoodEvaluator::ComputeLogLikelihood
(gpp_model_selection.cpp:593-612):

    LML = -1/2 y^T K^-1 y - 1/2 log det K - N/2 log 2 pi.

Gradients wrt hyperparameters are autodiff (replacing
BuildHyperparameterGradCovarianceMatrix + the hand-coded trace formulas,
gpp_model_selection.hpp:358-393).  The leave-one-out pseudo-likelihood —
declared but disabled in the reference C++ (gpp_model_selection.hpp:575) yet
exposed by its Python layer — is implemented here via the closed form from
the Cholesky factor (Rasmussen & Williams eqs. 5.10-5.12).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

from cornell_moe_tpu.models import covariance as cov_mod
from cornell_moe_tpu.models.covariance import StationaryCovariance
from cornell_moe_tpu.ops import linalg


def _system(covariance: StationaryCovariance, noise_variance, points,
            values, derivatives: Sequence[int], point_noise=None):
    y = jnp.asarray(values)
    if y.ndim > 1:
        y = y.reshape(-1)
    noise = jnp.asarray(noise_variance)
    if point_noise is not None:
        noise = jnp.asarray(point_noise) + noise[None, :]
    # use_pallas="never": the likelihood is differentiated wrt
    # hyperparameters (MAP path) and the Pallas builder has no VJP
    k = cov_mod.build_covariance_matrix_with_noise(
        covariance, jnp.asarray(points), derivatives, noise,
        use_pallas="never")
    chol = linalg.cholesky(k)
    alpha = linalg.cho_solve(chol, y)
    return y, chol, alpha


def log_marginal_likelihood(covariance: StationaryCovariance,
                            noise_variance, points, values,
                            derivatives: Sequence[int] = (),
                            point_noise=None) -> jax.Array:
    """Zero-mean GP log marginal likelihood over all observation channels.

    ``point_noise`` ((n, 1+m), optional) supports shape-bucketing: padded
    huge-noise rows shift the LML by a theta-independent constant, which
    MCMC/MAP are invariant to.
    """
    y, chol, alpha = _system(covariance, noise_variance, points, values,
                             derivatives, point_noise)
    n = y.shape[0]
    return (-0.5 * y @ alpha
            - 0.5 * linalg.log_det_from_chol(chol)
            - 0.5 * n * math.log(2.0 * math.pi))


def grad_log_marginal_likelihood(covariance: StationaryCovariance,
                                 noise_variance, points, values,
                                 derivatives: Sequence[int] = ()
                                 ) -> jax.Array:
    """d LML / d covariance hyperparameters (ComputeGradLogLikelihood)."""
    def f(h):
        return log_marginal_likelihood(
            covariance.replace(hyperparameters=h), noise_variance, points,
            values, derivatives)
    return jax.grad(f)(covariance.hyperparameters)


def log_marginal_likelihood_and_all_grads(covariance, noise_variance,
                                          points, values,
                                          derivatives: Sequence[int] = ()):
    """(LML, dLML/dtheta_cov, dLML/dnoise) in one pass."""
    def f(h, nv):
        return log_marginal_likelihood(
            covariance.replace(hyperparameters=h), nv, points, values,
            derivatives)
    val, grads = jax.value_and_grad(f, argnums=(0, 1))(
        covariance.hyperparameters, jnp.asarray(noise_variance))
    return val, grads[0], grads[1]


def leave_one_out_log_likelihood(covariance: StationaryCovariance,
                                 noise_variance, points, values,
                                 derivatives: Sequence[int] = ()
                                 ) -> jax.Array:
    """LOO-CV log pseudo-likelihood (GaussianProcessLeaveOneOutLogLikelihood
    counterpart, cpp_wrappers/log_likelihood.py:447).

    With K^{-1} from the Cholesky factor:
      mu_i  = y_i - alpha_i / K^{-1}_{ii}
      s2_i  = 1 / K^{-1}_{ii}
      LOO   = sum_i log N(y_i | mu_i, s2_i).
    """
    y, chol, alpha = _system(covariance, noise_variance, points, values,
                             derivatives)
    n = y.shape[0]
    k_inv = linalg.cho_solve(chol, jnp.eye(n, dtype=y.dtype))
    k_inv_diag = jnp.diag(k_inv)
    s2 = 1.0 / k_inv_diag
    resid2 = (alpha / k_inv_diag) ** 2
    return jnp.sum(-0.5 * jnp.log(s2) - 0.5 * resid2 / s2
                   - 0.5 * math.log(2.0 * math.pi))


def evaluate_log_likelihood_at_hyperparameter_list(
        kernel_name: str, hyperparameter_list, noise_variance, points,
        values, derivatives: Sequence[int] = ()) -> jax.Array:
    """Batch LML evaluation (EvaluateLogLikelihoodAtPointList counterpart,
    gpp_model_selection.hpp:1274).  hyperparameter_list is (S, 1+dim)."""
    def one(h):
        return log_marginal_likelihood(
            cov_mod.COVARIANCE_TYPES[kernel_name](hyperparameters=h),
            noise_variance, points, values, derivatives)
    return jax.vmap(one)(jnp.asarray(hyperparameter_list))
