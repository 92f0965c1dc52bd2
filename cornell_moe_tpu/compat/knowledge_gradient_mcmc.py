"""MCMC-averaged KG classes (compat layer).

Counterpart of ``cpp_wrappers/knowledge_gradient_mcmc.py``:
GaussianProcessMCMC (:163), PosteriorMeanMCMC (:25),
KnowledgeGradientMCMC (:333), and
multistart_knowledge_gradient_mcmc_optimization (:247).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cornell_moe_tpu.acquisition import expected_improvement as ei_core
from cornell_moe_tpu.acquisition import knowledge_gradient as kg_core
from cornell_moe_tpu.compat.interfaces import OptimizableInterface
from cornell_moe_tpu.models import mcmc as mcmc_mod
from cornell_moe_tpu.ops.domains import TensorProductDomain


class GaussianProcessMCMC:
    """A stacked ensemble of GPs, one per hyperparameter sample
    (cpp_wrappers/knowledge_gradient_mcmc.py:163)."""

    def __init__(self, hyperparameters_list, noise_variance_list,
                 historical_data, derivatives: Sequence[int] = (),
                 kernel_name: str = "matern_2.5"):
        self._hypers = np.atleast_2d(np.asarray(hyperparameters_list,
                                                dtype=float))
        self._noises = np.atleast_2d(np.asarray(noise_variance_list,
                                                dtype=float))
        self._historical_data = historical_data
        self._derivatives = tuple(int(i) for i in derivatives)
        self._kernel_name = kernel_name
        self._refit()

    def _refit(self):
        self._states = mcmc_mod.fit_gp_ensemble(
            self._kernel_name, jnp.asarray(self._hypers),
            jnp.asarray(self._noises),
            jnp.asarray(self._historical_data.points_sampled),
            jnp.asarray(self._historical_data.points_sampled_value),
            self._derivatives)

    @property
    def states(self):
        """Stacked functional states (TPU-native extension)."""
        return self._states

    @property
    def dim(self):
        return self._historical_data.dim

    @property
    def num_sampled(self):
        return self._historical_data.num_sampled

    @property
    def num_mcmc(self):
        return self._hypers.shape[0]

    @property
    def derivatives(self):
        return self._derivatives

    def get_historical_data_copy(self):
        import copy
        return copy.deepcopy(self._historical_data)

    def add_sampled_points(self, sampled_points):
        self._historical_data.append_sample_points(sampled_points)
        self._refit()


class PosteriorMeanMCMC(OptimizableInterface):
    """Ensemble-averaged -posterior_mean
    (cpp_wrappers/knowledge_gradient_mcmc.py:25).

    Accepts either a GaussianProcessMCMC or a stacked functional state.
    """

    def __init__(self, gp_mcmc, num_fidelity: int = 0,
                 point_to_sample=None):
        self._states = getattr(gp_mcmc, "states", gp_mcmc)
        self._num_fidelity = num_fidelity
        self._dim = self._states.points_sampled.shape[-1]
        dim_opt = self._dim - num_fidelity
        self._point = np.zeros(dim_opt) if point_to_sample is None else \
            np.asarray(point_to_sample, dtype=float).reshape(-1)[:dim_opt]

    @property
    def dim(self):
        return self._dim

    @property
    def num_fidelity(self):
        return self._num_fidelity

    @property
    def problem_size(self):
        return self._dim - self._num_fidelity

    def get_current_point(self):
        return np.copy(self._point)

    def set_current_point(self, point):
        self._point = np.asarray(point, dtype=float).reshape(-1)[
            :self.problem_size]

    current_point = property(lambda s: s.get_current_point(),
                             lambda s, p: s.set_current_point(p))

    def _objective_jax(self, p):
        return jnp.mean(jax.vmap(
            lambda s: kg_core.posterior_mean_objective(
                s, p, self._num_fidelity))(self._states))

    def compute_objective_function(self):
        return float(self._objective_jax(jnp.asarray(self._point)))

    def compute_grad_objective_function(self):
        return np.asarray(jax.grad(self._objective_jax)(
            jnp.asarray(self._point)))

    def value_and_grad_jax(self, p):
        return jax.value_and_grad(self._objective_jax)(p)


class KnowledgeGradientMCMC(OptimizableInterface):
    """Ensemble-averaged q-KG with continuous-fidelity cost
    (cpp_wrappers/knowledge_gradient_mcmc.py:333)."""

    def __init__(self, gaussian_process_mcmc, gaussian_process_list=None,
                 num_fidelity: int = 0, inner_optimizer=None,
                 discrete_pts_list=None, points_to_sample=None,
                 points_being_sampled=None, num_to_sample: int = 1,
                 num_mc_iterations: int = 2**7, rng_key=None):
        del gaussian_process_list
        self._gp_mcmc = gaussian_process_mcmc
        self._states = gaussian_process_mcmc.states
        self._num_fidelity = num_fidelity
        self._inner_params = getattr(inner_optimizer,
                                     "optimizer_parameters",
                                     inner_optimizer)
        self._discrete_pts = jnp.asarray(
            np.stack([np.atleast_2d(np.asarray(d, dtype=float))
                      for d in discrete_pts_list]))
        self._num_mc_iterations = num_mc_iterations
        self._points_being_sampled = None if points_being_sampled is None \
            else np.atleast_2d(np.asarray(points_being_sampled,
                                          dtype=float))
        self._key = rng_key if rng_key is not None else \
            jax.random.PRNGKey(0)
        self._normals = None

        # per-model best = min posterior mean over its discretization
        # (knowledge_gradient_mcmc.py:387-393)
        self._best_so_far_list = self._compute_best_so_far()
        if points_to_sample is None:
            points_to_sample = np.zeros((num_to_sample,
                                         self._gp_mcmc.dim))
        self.set_current_point(points_to_sample)

        dim_opt = self._gp_mcmc.dim - num_fidelity
        x = self._gp_mcmc._historical_data.points_sampled
        d_flat = np.asarray(self._discrete_pts).reshape(-1, dim_opt)
        lo = np.minimum(x.min(0)[:dim_opt], d_flat.min(0))
        hi = np.maximum(x.max(0)[:dim_opt], d_flat.max(0))
        self._inner_domain = TensorProductDomain(
            bounds=jnp.asarray(np.stack([lo, hi], axis=1)))

    def _compute_best_so_far(self):
        def per_model(s, pts):
            mus = jax.vmap(lambda p: -kg_core.posterior_mean_objective(
                s, p, self._num_fidelity))(pts)
            return jnp.min(mus)
        return jax.vmap(per_model)(self._states, self._discrete_pts)

    @property
    def dim(self):
        return self._gp_mcmc.dim

    @property
    def num_to_sample(self):
        return self._points_to_sample.shape[0]

    @property
    def problem_size(self):
        return self.num_to_sample * self.dim

    def set_inner_domain(self, domain):
        self._inner_domain = getattr(domain, "core", domain)

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
            self._normals = ei_core.draw_antithetic_normals(
                k, self._num_mc_iterations, n_union,
                dtype=self._states.points_sampled.dtype)

    current_point = property(lambda s: s.get_current_point(),
                             lambda s, p: s.set_current_point(p))

    def _objective_jax(self, pts):
        being = None if self._points_being_sampled is None else \
            jnp.asarray(self._points_being_sampled)
        union = pts if being is None else jnp.concatenate([pts, being])
        return kg_core.knowledge_gradient_mcmc(
            self._states, union, self._discrete_pts, self._normals,
            self._inner_domain, self._inner_params,
            self._best_so_far_list, self.num_to_sample,
            self._num_fidelity)

    def compute_knowledge_gradient_mcmc(self):
        return float(self._objective_jax(
            jnp.asarray(self._points_to_sample)))

    def compute_grad_knowledge_gradient_mcmc(self):
        return np.asarray(jax.grad(self._objective_jax)(
            jnp.asarray(self._points_to_sample)))

    compute_objective_function = compute_knowledge_gradient_mcmc
    compute_grad_objective_function = compute_grad_knowledge_gradient_mcmc

    def value_and_grad_jax(self, pts):
        return jax.value_and_grad(self._objective_jax)(pts)

    def evaluate_at_point_list(self, points_to_evaluate):
        """Ensemble-averaged KG at each candidate block.

        Counterpart of ``evaluate_KG_mcmc_at_point_list``
        (gpp_python_knowledge_gradient_mcmc.cpp:627 area).  Accepts
        (n, dim) single-point candidates or (n, q, dim) blocks; returns
        (n,).
        """
        pts = jnp.asarray(points_to_evaluate, dtype=float)
        if pts.ndim == 2:
            pts = pts[:, None, :]
        return np.asarray(jax.lax.map(self._objective_jax, pts))


def multistart_knowledge_gradient_mcmc_optimization(
        kg_optimizer, inner_optimizer=None, num_multistarts=None,
        discrete_pts_list=None, num_to_sample=None, num_pts=None,
        max_num_threads=None, status=None, rng_key=None):
    """Solve ensemble q-KG
    (cpp_wrappers/knowledge_gradient_mcmc.py:247 counterpart)."""
    del inner_optimizer, discrete_pts_list, num_pts, max_num_threads
    obj = kg_optimizer.objective_function
    params = kg_optimizer.optimizer_parameters
    if num_multistarts is not None:
        params = params.__class__(**{
            **params.__dict__, "num_multistarts": num_multistarts})
    if num_to_sample is None:
        num_to_sample = obj.num_to_sample
    domain = getattr(kg_optimizer.domain, "core", kg_optimizer.domain)
    key = rng_key if rng_key is not None else jax.random.PRNGKey(1)
    being = None if obj._points_being_sampled is None else \
        jnp.asarray(obj._points_being_sampled)
    best = kg_core.multistart_knowledge_gradient_mcmc_optimization(
        key, obj._states, domain, num_to_sample, params,
        obj._inner_params, obj._discrete_pts,
        points_being_sampled=being, best_so_far=obj._best_so_far_list,
        num_mc_iterations=obj._num_mc_iterations,
        num_fidelity=obj._num_fidelity)
    if status is not None:
        status["gradient_descent_found_update"] = True
    return np.asarray(best)
