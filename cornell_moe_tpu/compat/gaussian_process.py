"""GaussianProcess class for the compatibility layer.

Counterpart of ``cpp_wrappers/gaussian_process.py:18``: same constructor
``(covariance_function, noise_variance, historical_data, derivatives)``
and method surface; shapes follow the reference's channel conventions —
variance matrices are ``(q*(1+m), q*(1+m))`` over (value + derivative)
channels, gradient tensors carry the reduced winner-diagonal form
(SURVEY.md section 2.4).  All math delegates to the jitted functional core.
"""

from __future__ import annotations

import copy
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cornell_moe_tpu.compat.interfaces import GaussianProcessInterface
from cornell_moe_tpu.exceptions import check_finite_cholesky
from cornell_moe_tpu.models import gp as gp_mod
from cornell_moe_tpu.ops import random_features
from cornell_moe_tpu.ops.domains import TensorProductDomain
from cornell_moe_tpu.utils.data_containers import HistoricalData


class GaussianProcess(GaussianProcessInterface):
    """A GP conditioned on HistoricalData (value + derivative channels)."""

    def __init__(self, covariance_function, noise_variance,
                 historical_data: HistoricalData,
                 derivatives: Sequence[int] = (), rng_key=None):
        self._covariance = covariance_function
        self._noise_variance = np.asarray(noise_variance, dtype=float)
        self._historical_data = historical_data
        self._derivatives = tuple(int(i) for i in derivatives)
        self._num_derivatives = len(self._derivatives)
        self._key = rng_key if rng_key is not None else \
            jax.random.PRNGKey(0)
        self._refit()

    def _refit(self):
        self._state = gp_mod.fit_gp(
            self._covariance.to_kernel(), self._noise_variance,
            jnp.asarray(self._historical_data.points_sampled),
            jnp.asarray(self._historical_data.points_sampled_value),
            derivatives=self._derivatives)
        check_finite_cholesky(self._state.chol_K, "GaussianProcess")

    # -- data access ------------------------------------------------------
    @property
    def state(self) -> gp_mod.GaussianProcessState:
        """The underlying functional state (TPU-native extension)."""
        return self._state

    @property
    def dim(self):
        return self._historical_data.dim

    @property
    def num_sampled(self):
        return self._historical_data.num_sampled

    @property
    def num_derivatives(self):
        return self._num_derivatives

    @property
    def derivatives(self):
        return self._derivatives

    @property
    def noise_variance(self):
        return self._noise_variance

    @property
    def _points_sampled(self):
        return self._historical_data.points_sampled

    @property
    def _points_sampled_value(self):
        return self._historical_data.points_sampled_value

    def get_covariance_copy(self):
        return copy.deepcopy(self._covariance)

    def get_historical_data_copy(self):
        return copy.deepcopy(self._historical_data)

    # -- posterior quantities --------------------------------------------
    def compute_mean_of_points(self, points_to_sample):
        pts = jnp.atleast_2d(jnp.asarray(points_to_sample, dtype=float))
        return np.asarray(gp_mod.posterior_mean(self._state, pts))[:, 0]

    def compute_mean_of_additional_points(self, discrete_pts):
        return self.compute_mean_of_points(discrete_pts)

    def compute_grad_mean_of_points(self, points_to_sample,
                                    num_derivatives=-1):
        pts = jnp.atleast_2d(jnp.asarray(points_to_sample, dtype=float))
        nd = self._clamp_num_derivatives(pts.shape[0], num_derivatives)
        jac = gp_mod.grad_posterior_mean(self._state, pts[:nd],
                                         self._derivatives)
        # reduced form: d mu_i / d x_i only (cpp_wrappers shape
        # (num_derivatives, 1+m, dim))
        diag = jnp.stack([jac[i, :, i, :] for i in range(nd)])
        return np.asarray(diag)

    def compute_variance_of_points(self, points_to_sample):
        pts = jnp.atleast_2d(jnp.asarray(points_to_sample, dtype=float))
        return np.asarray(gp_mod.posterior_variance(
            self._state, pts, self._derivatives))

    def compute_cholesky_variance_of_points(self, points_to_sample):
        pts = jnp.atleast_2d(jnp.asarray(points_to_sample, dtype=float))
        chol = gp_mod.posterior_cholesky_variance(self._state, pts,
                                                  self._derivatives)
        return np.asarray(check_finite_cholesky(
            chol, "compute_cholesky_variance_of_points"))

    def compute_grad_variance_of_points(self, points_to_sample,
                                        num_derivatives=-1):
        pts = jnp.atleast_2d(jnp.asarray(points_to_sample, dtype=float))
        nd = self._clamp_num_derivatives(pts.shape[0], num_derivatives)
        jac = gp_mod.grad_posterior_variance(self._state, pts,
                                             self._derivatives)
        # (num_derivatives, q_ch, q_ch, dim)
        return np.asarray(jnp.moveaxis(jac[:, :, :nd, :], 2, 0))

    def compute_grad_cholesky_variance_of_points(self, points_to_sample,
                                                 num_derivatives=-1):
        pts = jnp.atleast_2d(jnp.asarray(points_to_sample, dtype=float))
        nd = self._clamp_num_derivatives(pts.shape[0], num_derivatives)
        jac = gp_mod.grad_posterior_cholesky_variance(
            self._state, pts, self._derivatives)
        return np.asarray(jnp.moveaxis(jac[:, :, :nd, :], 2, 0))

    # -- mutation / sampling ---------------------------------------------
    def add_sampled_points(self, sampled_points):
        self._historical_data.append_sample_points(sampled_points)
        self._refit()

    def sample_point_from_gp(self, point_to_sample, noise_variance=0.0):
        self._key, k = jax.random.split(self._key)
        return float(gp_mod.sample_point_from_gp(
            k, self._state, jnp.asarray(point_to_sample, dtype=float),
            noise_variance=noise_variance))

    def sample_global_optima(self, num_optima, domain_bounds=None,
                             num_grid=500, n_features=1000):
        """Approximate Thompson draws of argmin f (SampleGlobalOptimaFromGP
        counterpart, gpp_math.hpp:437)."""
        if domain_bounds is None:
            x = self._historical_data.points_sampled
            domain_bounds = np.stack([x.min(0), x.max(0)], axis=1)
        domain = TensorProductDomain.from_bounds(domain_bounds)
        self._key, k1, k2 = jax.random.split(self._key, 3)
        grid = domain.generate_latin_hypercube_points(k1, num_grid)
        return np.asarray(random_features.sample_from_global_optima(
            k2, self._state, domain, grid, num_optima,
            n_features=n_features))

    def print_historical_data(self):
        print(self._historical_data)
