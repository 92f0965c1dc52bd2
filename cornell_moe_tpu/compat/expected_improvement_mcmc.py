"""MCMC-averaged EI class (compat layer).

Counterpart of ``cpp_wrappers/expected_improvement_mcmc.py``:
ExpectedImprovementMCMC (:99) and
multistart_expected_improvement_mcmc_optimization (:21).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cornell_moe_tpu.acquisition import expected_improvement as ei_core
from cornell_moe_tpu.compat.interfaces import OptimizableInterface


class ExpectedImprovementMCMC(OptimizableInterface):
    """Mean EI over a hyperparameter ensemble."""

    def __init__(self, gaussian_process_mcmc, num_to_sample: int = 1,
                 points_to_sample=None, points_being_sampled=None,
                 num_mc_iterations: int = 10000, rng_key=None):
        self._gp_mcmc = gaussian_process_mcmc
        self._states = gaussian_process_mcmc.states
        self._num_mc_iterations = num_mc_iterations
        self._points_being_sampled = None if points_being_sampled is None \
            else np.atleast_2d(np.asarray(points_being_sampled,
                                          dtype=float))
        self._best_so_far = jax.vmap(
            lambda s: s.best_observed_value)(self._states)
        self._key = rng_key if rng_key is not None else \
            jax.random.PRNGKey(0)
        self._normals = None
        if points_to_sample is None:
            points_to_sample = np.zeros((num_to_sample,
                                         self._gp_mcmc.dim))
        self.set_current_point(points_to_sample)

    @property
    def dim(self):
        return self._gp_mcmc.dim

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
                dtype=self._states.points_sampled.dtype)

    current_point = property(lambda s: s.get_current_point(),
                             lambda s, p: s.set_current_point(p))

    def _objective_jax(self, pts):
        being = None if self._points_being_sampled is None else \
            jnp.asarray(self._points_being_sampled)
        return ei_core.monte_carlo_expected_improvement_mcmc(
            self._states, pts, being, self._best_so_far, self._normals)

    def compute_expected_improvement_mcmc(self):
        return float(self._objective_jax(
            jnp.asarray(self._points_to_sample)))

    def compute_grad_expected_improvement_mcmc(self):
        return np.asarray(jax.grad(self._objective_jax)(
            jnp.asarray(self._points_to_sample)))

    compute_objective_function = compute_expected_improvement_mcmc
    compute_grad_objective_function = compute_grad_expected_improvement_mcmc

    def value_and_grad_jax(self, pts):
        return jax.value_and_grad(self._objective_jax)(pts)

    def evaluate_at_point_list(self, points_to_evaluate):
        """Ensemble-averaged EI at each candidate block.

        Counterpart of ``evaluate_EI_mcmc_at_point_list``
        (gpp_python_expected_improvement_mcmc.cpp).  Accepts (n, dim) for
        single-point candidates or (n, q, dim) blocks; returns (n,).
        """
        pts = jnp.asarray(points_to_evaluate, dtype=float)
        if pts.ndim == 2:
            pts = pts[:, None, :]
        return np.asarray(jax.lax.map(self._objective_jax, pts))


def multistart_expected_improvement_mcmc_optimization(
        ei_optimizer, num_multistarts=None, num_to_sample=None,
        max_num_threads=None, status=None, rng_key=None):
    """Solve ensemble q-EI
    (cpp_wrappers/expected_improvement_mcmc.py:21 counterpart)."""
    del max_num_threads
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
    best = ei_core.multistart_expected_improvement_mcmc_optimization(
        key, obj._states, domain, num_to_sample, params,
        points_being_sampled=being, best_so_far=obj._best_so_far,
        num_mc_iterations=obj._num_mc_iterations)
    if status is not None:
        status["gradient_descent_found_update"] = True
    return np.asarray(best)
