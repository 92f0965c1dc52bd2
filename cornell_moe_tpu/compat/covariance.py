"""Covariance containers for the compatibility layer.

Counterpart of ``cpp_wrappers/covariance.py``: hyperparameter containers
with the CovarianceInterface surface.  Unlike the reference — where the
Python ``SquareExponential`` is a label and the C++ silently builds
Matérn-5/2 (SURVEY.md section 2.1) — these classes map to the kernel they
name.
"""

from __future__ import annotations

import numpy as np

from cornell_moe_tpu.compat.interfaces import CovarianceInterface
from cornell_moe_tpu.models import covariance as cov_mod


class _CovarianceCompat(CovarianceInterface):

    _kernel_name = None
    covariance_type = None

    def __init__(self, hyperparameters):
        self._hyperparameters = np.asarray(hyperparameters, dtype=float)

    @property
    def num_hyperparameters(self):
        return self._hyperparameters.size

    def get_hyperparameters(self):
        return np.copy(self._hyperparameters)

    def set_hyperparameters(self, hyperparameters):
        self._hyperparameters = np.asarray(hyperparameters, dtype=float)

    hyperparameters = property(get_hyperparameters, set_hyperparameters)

    def to_kernel(self) -> cov_mod.StationaryCovariance:
        """The functional JAX kernel object."""
        return cov_mod.make_covariance(self._kernel_name,
                                       self._hyperparameters)

    def covariance(self, point_one, point_two):
        return float(self.to_kernel().covariance(
            np.asarray(point_one), np.asarray(point_two)))

    def grad_covariance(self, point_one, point_two):
        return np.asarray(self.to_kernel().grad_covariance(
            np.asarray(point_one), np.asarray(point_two)))

    def hyperparameter_grad_covariance(self, point_one, point_two):
        return np.asarray(self.to_kernel().hyperparameter_grad_covariance(
            np.asarray(point_one), np.asarray(point_two)))


class SquareExponential(_CovarianceCompat):
    _kernel_name = "square_exponential"
    covariance_type = "square_exponential"


class MaternNu2p5(_CovarianceCompat):
    _kernel_name = "matern_2.5"
    covariance_type = "matern_2.5"


COVARIANCE_TYPES_TO_CLASSES = {
    "square_exponential": SquareExponential,
    "matern_2.5": MaternNu2p5,
}
