"""KnowledgeGradient / PosteriorMean classes + endpoints (compat layer).

Counterpart of ``cpp_wrappers/knowledge_gradient.py``: PosteriorMean
(:92), KnowledgeGradient (:309), posterior_mean_optimization (:19) and
multistart_knowledge_gradient_optimization (:224).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from cornell_moe_tpu.acquisition import expected_improvement as ei_core
from cornell_moe_tpu.acquisition import knowledge_gradient as kg_core
from cornell_moe_tpu.compat.interfaces import OptimizableInterface
from cornell_moe_tpu.ops.domains import TensorProductDomain


class PosteriorMean(OptimizableInterface):
    """-posterior_mean objective with fidelity pinning
    (cpp_wrappers/knowledge_gradient.py:92)."""

    def __init__(self, gaussian_process, num_fidelity: int = 0,
                 point_to_sample=None):
        self._gaussian_process = gaussian_process
        self._num_fidelity = num_fidelity
        dim_opt = gaussian_process.dim - num_fidelity
        self._point = np.zeros(dim_opt) if point_to_sample is None else \
            np.asarray(point_to_sample, dtype=float).reshape(-1)[:dim_opt]

    @property
    def dim(self):
        return self._gaussian_process.dim

    @property
    def num_fidelity(self):
        return self._num_fidelity

    @property
    def problem_size(self):
        return self.dim - self._num_fidelity

    def get_current_point(self):
        return np.copy(self._point)

    def set_current_point(self, point):
        self._point = np.asarray(point, dtype=float).reshape(-1)[
            :self.problem_size]

    current_point = property(lambda s: s.get_current_point(),
                             lambda s, p: s.set_current_point(p))

    def compute_posterior_mean(self):
        """Returns -mu (the maximized objective), as in the reference."""
        return float(kg_core.posterior_mean_objective(
            self._gaussian_process.state, jnp.asarray(self._point),
            self._num_fidelity))

    def compute_grad_posterior_mean(self):
        g = jax.grad(lambda p: kg_core.posterior_mean_objective(
            self._gaussian_process.state, p, self._num_fidelity))(
                jnp.asarray(self._point))
        return np.asarray(g)

    compute_objective_function = compute_posterior_mean
    compute_grad_objective_function = compute_grad_posterior_mean

    def value_and_grad_jax(self, p):
        return jax.value_and_grad(
            lambda x: kg_core.posterior_mean_objective(
                self._gaussian_process.state, x, self._num_fidelity))(p)


class KnowledgeGradient(OptimizableInterface):
    """q-KG evaluator (cpp_wrappers/knowledge_gradient.py:309)."""

    def __init__(self, gaussian_process, inner_optimizer, discrete_pts,
                 num_fidelity: int = 0, points_to_sample=None,
                 points_being_sampled=None, num_mc_iterations: int = 2**7,
                 best_so_far=None, rng_key=None):
        self._gaussian_process = gaussian_process
        self._num_fidelity = num_fidelity
        self._inner_params = getattr(inner_optimizer,
                                     "optimizer_parameters",
                                     inner_optimizer)
        self._discrete_pts = np.atleast_2d(np.asarray(discrete_pts,
                                                      dtype=float))
        self._points_being_sampled = None if points_being_sampled is None \
            else np.atleast_2d(np.asarray(points_being_sampled,
                                          dtype=float))
        self._num_mc_iterations = num_mc_iterations
        if best_so_far is None:
            mus = gaussian_process.compute_mean_of_points(
                np.hstack([self._discrete_pts,
                           np.ones((self._discrete_pts.shape[0],
                                    num_fidelity))]))
            best_so_far = float(np.min(mus))
        self._best_so_far = best_so_far
        self._key = rng_key if rng_key is not None else \
            jax.random.PRNGKey(0)
        self._normals = None
        if points_to_sample is None:
            points_to_sample = np.zeros((1, gaussian_process.dim))
        self.set_current_point(points_to_sample)
        dim_opt = gaussian_process.dim - num_fidelity
        x = gaussian_process._historical_data.points_sampled
        lo = np.minimum(x.min(0)[:dim_opt], self._discrete_pts.min(0))
        hi = np.maximum(x.max(0)[:dim_opt], self._discrete_pts.max(0))
        self._inner_domain = TensorProductDomain(
            bounds=jnp.asarray(np.stack([lo, hi], axis=1)))

    @property
    def dim(self):
        return self._gaussian_process.dim

    @property
    def num_to_sample(self):
        return self._points_to_sample.shape[0]

    @property
    def problem_size(self):
        return self.num_to_sample * self.dim

    def set_inner_domain(self, domain):
        """Override the inner posterior-mean optimization domain."""
        self._inner_domain = getattr(domain, "core", domain)

    def get_current_point(self):
        return np.copy(self._points_to_sample)

    def set_current_point(self, points_to_sample):
        self._points_to_sample = np.atleast_2d(
            np.asarray(points_to_sample, dtype=float))
        p = 0 if self._points_being_sampled is None else \
            self._points_being_sampled.shape[0]
        n_union = self.num_to_sample + p
        if self._normals is None or \
                self._normals.shape[1] != n_union:
            self._key, k = jax.random.split(self._key)
            self._normals = ei_core.draw_antithetic_normals(
                k, self._num_mc_iterations, n_union,
                dtype=self._gaussian_process.state.points_sampled.dtype)

    current_point = property(lambda s: s.get_current_point(),
                             lambda s, p: s.set_current_point(p))

    def _kg_args(self):
        being = None if self._points_being_sampled is None else \
            jnp.asarray(self._points_being_sampled)
        return (self._gaussian_process.state,
                jnp.asarray(self._points_to_sample), being,
                jnp.asarray(self._discrete_pts), self._normals,
                self._inner_domain, self._inner_params,
                self._best_so_far, self._num_fidelity)

    def compute_knowledge_gradient(self):
        (state, pts, being, discrete, normals, dom, inner, bsf,
         nf) = self._kg_args()
        union = pts if being is None else jnp.concatenate([pts, being])
        return float(kg_core.knowledge_gradient(
            state, union, discrete, normals, dom, inner, bsf, nf))

    def compute_grad_knowledge_gradient(self):
        (state, pts, being, discrete, normals, dom, inner, bsf,
         nf) = self._kg_args()
        _, g = kg_core.knowledge_gradient_value_and_grad(
            state, pts, being, discrete, normals, dom, inner, bsf, nf)
        return np.asarray(g)

    compute_objective_function = compute_knowledge_gradient
    compute_grad_objective_function = compute_grad_knowledge_gradient

    def value_and_grad_jax(self, pts):
        (state, _, being, discrete, normals, dom, inner, bsf,
         nf) = self._kg_args()
        return kg_core.knowledge_gradient_value_and_grad(
            state, pts, being, discrete, normals, dom, inner, bsf, nf)

    def evaluate_at_point_list(self, points_to_evaluate):
        (state, _, being, discrete, normals, dom, inner, bsf,
         nf) = self._kg_args()
        return np.asarray(kg_core.evaluate_knowledge_gradient_at_point_list(
            state, jnp.asarray(points_to_evaluate, dtype=float), discrete,
            normals, dom, inner, bsf, nf))


def posterior_mean_optimization(ps_optimizer, initial_guess=None,
                                max_num_threads=None, status=None):
    """Find argmin of the posterior mean
    (cpp_wrappers/knowledge_gradient.py:19 counterpart)."""
    del max_num_threads
    obj = ps_optimizer.objective_function
    params = ps_optimizer.optimizer_parameters
    domain = getattr(ps_optimizer.domain, "core", ps_optimizer.domain)
    if initial_guess is None:
        initial_guess = obj.get_current_point()
    guesses = jnp.atleast_2d(jnp.asarray(initial_guess, dtype=float))
    pt, _val = kg_core.compute_optimal_posterior_mean(
        obj._gaussian_process.state, domain, guesses, params,
        obj.num_fidelity)
    if status is not None:
        status["gradient_descent_found_update"] = True
    obj.set_current_point(np.asarray(pt))
    return np.asarray(pt)


def multistart_knowledge_gradient_optimization(
        kg_optimizer, inner_optimizer=None, num_multistarts=None,
        deriv=None, num_pts=None, num_to_sample=None,
        max_num_threads=None, status=None, rng_key=None):
    """Solve q-KG (cpp_wrappers/knowledge_gradient.py:224 counterpart)."""
    del inner_optimizer, deriv, num_pts, max_num_threads
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
    best = kg_core.multistart_knowledge_gradient_optimization(
        key, obj._gaussian_process.state, domain, num_to_sample, params,
        obj._inner_params, jnp.asarray(obj._discrete_pts),
        points_being_sampled=being, best_so_far=obj._best_so_far,
        num_mc_iterations=obj._num_mc_iterations,
        num_fidelity=obj._num_fidelity)
    if status is not None:
        status["gradient_descent_found_update"] = True
    return np.asarray(best)
