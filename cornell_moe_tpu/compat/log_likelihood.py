"""Log-likelihood model-selection classes (compat layer).

Counterpart of ``cpp_wrappers/log_likelihood.py``:
GaussianProcessLogLikelihood (:228), GaussianProcessLogMarginalLikelihood
(:407), GaussianProcessLeaveOneOutLogLikelihood (:447),
multistart_hyperparameter_optimization (:66),
restarted_hyperparameter_optimization and
evaluate_log_likelihood_at_hyperparameter_list (:179).

Hyperparameter optimization runs over LOG-hyperparameters (as the
reference's C++ does internally) with the jitted multistart machinery.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cornell_moe_tpu.compat.interfaces import (
    GaussianProcessLogLikelihoodInterface)
from cornell_moe_tpu.models import likelihood as lik_mod
from cornell_moe_tpu.ops import optimizers as opt_mod
from cornell_moe_tpu.ops.domains import TensorProductDomain


class GaussianProcessLogLikelihood(GaussianProcessLogLikelihoodInterface):
    """Measures covariance-hyperparameter fit quality over the data."""

    objective_type = "log_marginal_likelihood"
    _measure = staticmethod(lik_mod.log_marginal_likelihood)

    def __init__(self, covariance_function, historical_data,
                 noise_variance=None, derivatives=()):
        self._covariance = covariance_function
        self._historical_data = historical_data
        self._derivatives = tuple(int(i) for i in derivatives)
        if noise_variance is None:
            noise_variance = np.full((1 + len(self._derivatives),), 1e-8)
        self._noise_variance = np.asarray(noise_variance, dtype=float)

    # -- hyperparameter access -------------------------------------------
    @property
    def dim(self):
        return self._historical_data.dim

    @property
    def num_hyperparameters(self):
        return self._covariance.num_hyperparameters

    @property
    def problem_size(self):
        return self.num_hyperparameters

    def get_hyperparameters(self):
        return self._covariance.get_hyperparameters()

    def set_hyperparameters(self, hyperparameters):
        self._covariance.set_hyperparameters(hyperparameters)

    hyperparameters = property(
        lambda s: s.get_hyperparameters(),
        lambda s, h: s.set_hyperparameters(h))
    current_point = hyperparameters
    get_current_point = get_hyperparameters
    set_current_point = set_hyperparameters

    def get_covariance_copy(self):
        import copy
        return copy.deepcopy(self._covariance)

    def get_historical_data_copy(self):
        import copy
        return copy.deepcopy(self._historical_data)

    # -- evaluation --------------------------------------------------------
    def _args(self):
        return (jnp.asarray(self._noise_variance),
                jnp.asarray(self._historical_data.points_sampled),
                jnp.asarray(self._historical_data.points_sampled_value),
                self._derivatives)

    def compute_log_likelihood(self):
        noise, x, y, derivs = self._args()
        return float(self._measure(
            self._covariance.to_kernel(), noise, x, y, derivs))

    def compute_grad_log_likelihood(self):
        noise, x, y, derivs = self._args()

        def f(h):
            kern = self._covariance.to_kernel().replace(hyperparameters=h)
            return self._measure(kern, noise, x, y, derivs)
        return np.asarray(jax.grad(f)(
            jnp.asarray(self._covariance.get_hyperparameters())))

    compute_objective_function = compute_log_likelihood
    compute_grad_objective_function = compute_grad_log_likelihood

    def value_and_grad_jax(self, h):
        noise, x, y, derivs = self._args()

        def f(hh):
            kern = self._covariance.to_kernel().replace(
                hyperparameters=hh)
            return self._measure(kern, noise, x, y, derivs)
        return jax.value_and_grad(f)(h)


class GaussianProcessLogMarginalLikelihood(GaussianProcessLogLikelihood):
    """LML measure (cpp_wrappers/log_likelihood.py:407)."""

    objective_type = "log_marginal_likelihood"
    _measure = staticmethod(lik_mod.log_marginal_likelihood)


class GaussianProcessLeaveOneOutLogLikelihood(GaussianProcessLogLikelihood):
    """LOO-CV pseudo-likelihood measure
    (cpp_wrappers/log_likelihood.py:447)."""

    objective_type = "leave_one_out_log_likelihood"
    _measure = staticmethod(lik_mod.leave_one_out_log_likelihood)


def multistart_hyperparameter_optimization(
        log_likelihood_optimizer, num_multistarts: Optional[int] = None,
        randomness=None, max_num_threads=None, status=None, rng_key=None):
    """Point-estimate hyperparameter fit
    (cpp_wrappers/log_likelihood.py:66 counterpart).

    Multistart SGA over LOG-hyperparameters in a [-10, 10] log-box (the
    C++ searches a user domain in log space; we default to the same broad
    box the reference driver uses).  Returns the best hyperparameters in
    linear space.
    """
    del randomness, max_num_threads
    obj = log_likelihood_optimizer.objective_function
    params = log_likelihood_optimizer.optimizer_parameters
    if num_multistarts is not None:
        params = params.__class__(**{
            **params.__dict__, "num_multistarts": num_multistarts})
    n_hyper = obj.num_hyperparameters
    domain = getattr(log_likelihood_optimizer.domain, "core",
                     log_likelihood_optimizer.domain)
    if domain is None:
        domain = TensorProductDomain(
            bounds=jnp.tile(jnp.asarray([[-10.0, 10.0]]), (n_hyper, 1)))

    def vg(log_h):
        return jax.value_and_grad(
            lambda lh: obj.value_and_grad_jax(jnp.exp(lh))[0])(log_h)

    key = rng_key if rng_key is not None else jax.random.PRNGKey(0)
    starts = domain.generate_latin_hypercube_points(
        key, params.num_multistarts)
    res = opt_mod.multistart_optimize(vg, domain, starts, params)
    best = np.exp(np.asarray(res.best_point))
    if status is not None:
        status["log_likelihood_found_update"] = True
    obj.set_hyperparameters(best)
    return best


def restarted_hyperparameter_optimization(
        log_likelihood_optimizer, **kwargs):
    """Newton-polished variant (restarted_hyperparameter_optimization
    counterpart): multistart SGA, then a damped-Newton polish in log
    space."""
    best = multistart_hyperparameter_optimization(
        log_likelihood_optimizer, **kwargs)
    obj = log_likelihood_optimizer.objective_function
    domain = getattr(log_likelihood_optimizer.domain, "core",
                     log_likelihood_optimizer.domain)
    if domain is None:
        n_hyper = obj.num_hyperparameters
        domain = TensorProductDomain(
            bounds=jnp.tile(jnp.asarray([[-10.0, 10.0]]), (n_hyper, 1)))

    def vg(log_h):
        return jax.value_and_grad(
            lambda lh: obj.value_and_grad_jax(jnp.exp(lh))[0])(log_h)

    newton = opt_mod.NewtonParameters(max_num_steps=30, time_factor=1.0,
                                      gamma=1.1)
    x = opt_mod.newton_optimize(vg, domain, jnp.log(jnp.asarray(best)),
                                newton)
    polished = np.exp(np.asarray(x))
    v_best = obj.value_and_grad_jax(jnp.asarray(best))[0]
    v_pol = obj.value_and_grad_jax(jnp.asarray(polished))[0]
    final = polished if float(v_pol) > float(v_best) else best
    obj.set_hyperparameters(final)
    return final


def evaluate_log_likelihood_at_hyperparameter_list(
        log_likelihood_evaluator, hyperparameters_to_evaluate,
        max_num_threads=None, status=None):
    """Batch evaluation (cpp_wrappers/log_likelihood.py:179 counterpart)."""
    del max_num_threads
    obj = log_likelihood_evaluator
    noise, x, y, derivs = obj._args()

    def one(h):
        kern = obj._covariance.to_kernel().replace(hyperparameters=h)
        return obj._measure(kern, noise, x, y, derivs)

    vals = jax.vmap(one)(jnp.asarray(hyperparameters_to_evaluate,
                                     dtype=float))
    if status is not None:
        status["evaluated_log_likelihood_at_hyperparameter_list"] = True
    return np.asarray(vals)
