"""ExpectedImprovement class + optimization endpoints (compat layer).

Counterpart of ``cpp_wrappers/expected_improvement.py``: the
ExpectedImprovement evaluator (q,p-EI with current-point state) and
``multistart_expected_improvement_optimization``.  CRN discipline: the MC
normals are drawn once at construction and reused for every evaluation
(the reference's ResetToMostRecentSeed).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cornell_moe_tpu.acquisition import expected_improvement as ei_core
from cornell_moe_tpu.compat.interfaces import ExpectedImprovementInterface
from cornell_moe_tpu.utils.constant import (
    DEFAULT_EXPECTED_IMPROVEMENT_MC_ITERATIONS)


class ExpectedImprovement(ExpectedImprovementInterface):
    """q,p-EI evaluator (cpp_wrappers/expected_improvement.py class)."""

    def __init__(self, gaussian_process, points_to_sample=None,
                 points_being_sampled=None,
                 num_mc_iterations=DEFAULT_EXPECTED_IMPROVEMENT_MC_ITERATIONS,
                 rng_key=None):
        self._gaussian_process = gaussian_process
        self._num_mc_iterations = num_mc_iterations
        self._points_being_sampled = None if points_being_sampled is None \
            else np.atleast_2d(np.asarray(points_being_sampled,
                                          dtype=float))
        self._best_so_far = float(
            gaussian_process._historical_data.best_value)
        key = rng_key if rng_key is not None else jax.random.PRNGKey(0)
        self._key = key
        self._normals = None
        if points_to_sample is None:
            points_to_sample = np.zeros((1, gaussian_process.dim))
        self.set_current_point(points_to_sample)

    # -- state ------------------------------------------------------------
    @property
    def dim(self):
        return self._gaussian_process.dim

    @property
    def num_to_sample(self):
        return self._points_to_sample.shape[0]

    @property
    def problem_size(self):
        return self.num_to_sample * self.dim

    def get_current_point(self):
        return np.copy(self._points_to_sample)

    def set_current_point(self, points_to_sample):
        self._points_to_sample = np.atleast_2d(
            np.asarray(points_to_sample, dtype=float))
        p = 0 if self._points_being_sampled is None else \
            self._points_being_sampled.shape[0]
        n_union = self.num_to_sample + p
        if self._normals is None or self._normals.shape[1] != n_union:
            self._key, k = jax.random.split(self._key)
            self._normals = ei_core.draw_normals(
                k, self._num_mc_iterations, n_union,
                dtype=self._gaussian_process.state.points_sampled.dtype)

    current_point = property(lambda s: s.get_current_point(),
                             lambda s, p: s.set_current_point(p))

    @property
    def _use_analytic(self):
        return self.num_to_sample == 1 and \
            self._points_being_sampled is None

    # -- evaluation --------------------------------------------------------
    def compute_expected_improvement(self, force_monte_carlo=False):
        state = self._gaussian_process.state
        pts = jnp.asarray(self._points_to_sample)
        if self._use_analytic and not force_monte_carlo:
            return float(ei_core.analytic_expected_improvement(
                state, pts, self._best_so_far))
        being = None if self._points_being_sampled is None else \
            jnp.asarray(self._points_being_sampled)
        return float(ei_core.monte_carlo_expected_improvement(
            state, pts, being, self._best_so_far, self._normals))

    def compute_grad_expected_improvement(self, force_monte_carlo=False):
        state = self._gaussian_process.state
        pts = jnp.asarray(self._points_to_sample)
        if self._use_analytic and not force_monte_carlo:
            g = jax.grad(lambda p: ei_core.analytic_expected_improvement(
                state, p, self._best_so_far))(pts)
            return np.asarray(g)
        being = None if self._points_being_sampled is None else \
            jnp.asarray(self._points_being_sampled)
        _, g = ei_core.expected_improvement_value_and_grad(
            state, pts, being, self._best_so_far, self._normals)
        return np.asarray(g)

    compute_objective_function = compute_expected_improvement
    compute_grad_objective_function = compute_grad_expected_improvement

    def value_and_grad_jax(self, pts):
        """Jittable (value, grad) — used by the jitted optimizers."""
        state = self._gaussian_process.state
        being = None if self._points_being_sampled is None else \
            jnp.asarray(self._points_being_sampled)
        if self._use_analytic:
            return jax.value_and_grad(
                lambda p: ei_core.analytic_expected_improvement(
                    state, p, self._best_so_far))(pts)
        return ei_core.expected_improvement_value_and_grad(
            state, pts, being, self._best_so_far, self._normals)

    def evaluate_at_point_list(self, points_to_evaluate):
        state = self._gaussian_process.state
        self._key, k = jax.random.split(self._key)
        return np.asarray(
            ei_core.evaluate_expected_improvement_at_point_list(
                state, jnp.asarray(points_to_evaluate, dtype=float),
                key=k, best_so_far=self._best_so_far,
                num_mc_iterations=self._num_mc_iterations))


def multistart_expected_improvement_optimization(
        ei_optimizer, num_multistarts: Optional[int] = None,
        num_to_sample: Optional[int] = None, randomness=None,
        max_num_threads=None, status=None, rng_key=None):
    """Solve q,p-EI (cpp_wrappers/expected_improvement.py:22 counterpart).

    ``ei_optimizer`` pairs an ExpectedImprovement objective with a domain
    and GradientDescentParameters.
    """
    del randomness, max_num_threads
    obj = ei_optimizer.objective_function
    params = ei_optimizer.optimizer_parameters
    if num_multistarts is not None:
        params = params.__class__(**{
            **params.__dict__, "num_multistarts": num_multistarts})
    if num_to_sample is None:
        num_to_sample = obj.num_to_sample
    domain = getattr(ei_optimizer.domain, "core", ei_optimizer.domain)
    key = rng_key if rng_key is not None else jax.random.PRNGKey(1)
    being = None if obj._points_being_sampled is None else \
        jnp.asarray(obj._points_being_sampled)
    best = ei_core.multistart_expected_improvement_optimization(
        key, obj._gaussian_process.state, domain, num_to_sample, params,
        points_being_sampled=being, best_so_far=obj._best_so_far,
        num_mc_iterations=obj._num_mc_iterations)
    if status is not None:
        status["gradient_descent_found_update"] = True
    return np.asarray(best)


def heuristic_expected_improvement_optimization(
        ei_optimizer, num_to_sample: int, estimation_policy=None,
        randomness=None, max_num_threads=None, status=None,
        rng_key=None):
    """Sequential heuristic q-point selection (constant-liar / kriging).

    Counterpart of the ``heuristic_expected_improvement_optimization``
    GPP binding (gpp_python_expected_improvement.cpp; its C++ consumer is
    compiled out of the reference build but the surface is part of the
    SURVEY.md section 2.9 contract).  ``estimation_policy`` is one of the
    compat estimation-policy objects (ConstantLiarEstimationPolicy /
    KrigingBelieverEstimationPolicy) or a callable
    ``(state, point) -> (value, noise)``.
    """
    del randomness, max_num_threads
    obj = ei_optimizer.objective_function
    params = ei_optimizer.optimizer_parameters
    domain = getattr(ei_optimizer.domain, "core", ei_optimizer.domain)
    key = rng_key if rng_key is not None else jax.random.PRNGKey(2)
    # the compat estimation-policy classes are callable on core states
    best = ei_core.heuristic_expected_improvement_optimization(
        key, obj._gaussian_process.state, domain, num_to_sample, params,
        estimation_policy=estimation_policy, best_so_far=obj._best_so_far,
        num_mc_iterations=obj._num_mc_iterations)
    if status is not None:
        status["heuristic_ei_found_update"] = True
    return np.asarray(best)
