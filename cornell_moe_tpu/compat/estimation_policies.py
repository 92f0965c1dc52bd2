"""Batch estimation policies (compat layer).

Counterpart of the ConstantLiarEstimationPolicy /
KrigingBelieverEstimationPolicy classes the reference exports from its
bindings (gpp_python.cpp, SURVEY.md section 2.9; their heuristic-EI
consumer is compiled out upstream but functional here via
heuristic_expected_improvement_optimization).
"""

from __future__ import annotations

import numpy as np

from cornell_moe_tpu.acquisition import expected_improvement as ei_core
from cornell_moe_tpu.utils.constant import (
    CONSTANT_LIAR_MAX, CONSTANT_LIAR_MEAN, CONSTANT_LIAR_MIN,
    DEFAULT_CONSTANT_LIAR_LIE_NOISE_VARIANCE,
    DEFAULT_KRIGING_NOISE_VARIANCE, DEFAULT_KRIGING_STD_DEVIATION_COEF)


class ConstantLiarEstimationPolicy:
    """Fantasize a constant value for in-flight points."""

    def __init__(self, lie_value,
                 lie_noise_variance=DEFAULT_CONSTANT_LIAR_LIE_NOISE_VARIANCE):
        self.lie_value = float(lie_value)
        self.lie_noise_variance = float(lie_noise_variance)

    @classmethod
    def from_method(cls, method, values,
                    lie_noise_variance=
                    DEFAULT_CONSTANT_LIAR_LIE_NOISE_VARIANCE):
        """Build from the CL_MIN/CL_MAX/CL_MEAN method strings
        (constant.py:281-301)."""
        values = np.asarray(values)
        lie = {CONSTANT_LIAR_MIN: values.min(),
               CONSTANT_LIAR_MAX: values.max(),
               CONSTANT_LIAR_MEAN: values.mean()}[method]
        return cls(lie, lie_noise_variance)

    def compute_estimate(self, gaussian_process, point):
        return ei_core.constant_liar_estimate(
            getattr(gaussian_process, "state", gaussian_process), point,
            self.lie_value, self.lie_noise_variance)

    def __call__(self, state, point):
        return ei_core.constant_liar_estimate(
            state, point, self.lie_value, self.lie_noise_variance)


class KrigingBelieverEstimationPolicy:
    """Fantasize mu(x) + c * sigma(x) for in-flight points."""

    def __init__(self,
                 std_deviation_coef=DEFAULT_KRIGING_STD_DEVIATION_COEF,
                 kriging_noise_variance=DEFAULT_KRIGING_NOISE_VARIANCE):
        self.std_deviation_coef = float(std_deviation_coef)
        self.kriging_noise_variance = float(kriging_noise_variance)

    def compute_estimate(self, gaussian_process, point):
        return ei_core.kriging_believer_estimate(
            getattr(gaussian_process, "state", gaussian_process), point,
            self.std_deviation_coef, self.kriging_noise_variance)

    def __call__(self, state, point):
        return ei_core.kriging_believer_estimate(
            state, point, self.std_deviation_coef,
            self.kriging_noise_variance)
