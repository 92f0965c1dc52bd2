"""Optimizer parameter/config classes for the compatibility layer.

Counterpart of ``cpp_wrappers/optimization.py`` and
``python_version/optimization.py``: the parameter structs
(GradientDescentParameters / NewtonParameters / LBFGSBParameters /
COBYLAParameters / NullParameters), the optimizer config holders
(NullOptimizer / GradientDescentOptimizer / NewtonOptimizer /
LBFGSBOptimizer / COBYLAOptimizer), and ``multistart_optimize``.

The core parameter dataclasses are re-exported from
cornell_moe_tpu.ops.optimizers (identical field names to the reference,
gpp_optimizer_parameters.hpp).  The optimizer classes pair an
OptimizableInterface objective with a domain and parameters; optimize()
runs the jitted multistart machinery (or scipy for the host-side ones).
"""

from __future__ import annotations

from collections import namedtuple
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cornell_moe_tpu.compat.interfaces import OptimizerInterface
from cornell_moe_tpu.ops import optimizers as opt_mod
from cornell_moe_tpu.ops.optimizers import (  # noqa: F401 (re-exported)
    GradientDescentParameters, NewtonParameters)

__all__ = [
    "GradientDescentParameters", "NewtonParameters", "NullParameters",
    "LBFGSBParameters", "COBYLAParameters", "NullOptimizer",
    "GradientDescentOptimizer", "NewtonOptimizer", "LBFGSBOptimizer",
    "COBYLAOptimizer", "multistart_optimize",
]

NullParameters = namedtuple("NullParameters", [])

LBFGSBParameters = namedtuple(
    "LBFGSBParameters",
    ["approx_grad", "max_func_evals", "max_metric_correc", "factr",
     "pgtol", "epsilon"])

COBYLAParameters = namedtuple(
    "COBYLAParameters", ["rhobeg", "rhoend", "maxfun", "catol"])


class _OptimizerBase(OptimizerInterface):

    def __init__(self, domain, optimizable, optimizer_parameters,
                 num_random_samples=None):
        self.domain = domain
        self.objective_function = optimizable
        self.optimizer_parameters = optimizer_parameters
        self.num_random_samples = num_random_samples

    def _value_and_grad_fn(self):
        obj = self.objective_function

        def vg(x):
            obj.set_current_point(np.asarray(x))
            return (np.asarray(obj.compute_objective_function()),
                    np.asarray(obj.compute_grad_objective_function()))
        return vg


class NullOptimizer(_OptimizerBase):
    """A no-op optimizer (cpp_wrappers/optimization.py:371)."""

    def optimize(self, **kwargs):
        return self.objective_function.get_current_point()


class GradientDescentOptimizer(_OptimizerBase):
    """Restarted SGA on the objective (python_version/optimization.py:392).

    optimize() polishes the objective's current point; use
    :func:`multistart_optimize` for the multistart wrapper.
    """

    def optimize(self, **kwargs):
        obj = self.objective_function
        x0 = np.asarray(obj.get_current_point(), dtype=float)
        core = getattr(self.domain, "core", self.domain)
        x = opt_mod.gradient_ascent(self._host_vg(), core,
                                    jnp.asarray(x0),
                                    self.optimizer_parameters)
        obj.set_current_point(np.asarray(x))
        return np.asarray(x)

    def _host_vg(self):
        obj = self.objective_function
        if hasattr(obj, "value_and_grad_jax"):
            return obj.value_and_grad_jax
        vg = self._value_and_grad_fn()

        def wrapped(x):
            dt = x.dtype
            v, g = jax.pure_callback(
                lambda xv: tuple(np.asarray(t, dtype=dt)
                                 for t in vg(np.asarray(xv))),
                (jax.ShapeDtypeStruct((), dt),
                 jax.ShapeDtypeStruct(x.shape, dt)), x)
            return v, g
        return wrapped


class NewtonOptimizer(_OptimizerBase):
    """Damped-Newton polish (gpp_optimization.hpp Newton counterpart)."""

    def optimize(self, **kwargs):
        obj = self.objective_function
        x0 = jnp.asarray(np.asarray(obj.get_current_point(), dtype=float))
        core = getattr(self.domain, "core", self.domain)
        vg = obj.value_and_grad_jax if hasattr(obj, "value_and_grad_jax") \
            else GradientDescentOptimizer._host_vg(self)
        x = opt_mod.newton_optimize(vg, core, x0,
                                    self.optimizer_parameters)
        obj.set_current_point(np.asarray(x))
        return np.asarray(x)


class _ScipyOptimizer(_OptimizerBase):

    _method = None

    def optimize(self, **kwargs):
        import scipy.optimize

        obj = self.objective_function
        x0 = np.asarray(obj.get_current_point(), dtype=float).ravel()
        bounds = None
        if hasattr(self.domain, "_domain_bounds"):
            bounds = list(self.domain._domain_bounds) * \
                (x0.size // len(self.domain._domain_bounds))

        def neg_obj(x):
            obj.set_current_point(x.reshape(
                np.asarray(obj.get_current_point()).shape))
            return -float(np.asarray(obj.compute_objective_function()))

        res = scipy.optimize.minimize(neg_obj, x0, method=self._method,
                                      bounds=bounds)
        obj.set_current_point(res.x.reshape(
            np.asarray(obj.get_current_point()).shape))
        return res.x


class LBFGSBOptimizer(_ScipyOptimizer):
    """python_version/optimization.py:698 counterpart."""

    _method = "L-BFGS-B"


class COBYLAOptimizer(_ScipyOptimizer):
    """python_version/optimization.py:747 counterpart."""

    _method = "COBYLA"


def multistart_optimize(optimizer, starting_points=None,
                        num_multistarts: Optional[int] = None):
    """Run optimizer.optimize() from each start, return results sorted by
    objective (python_version/optimization.py:187 counterpart).

    Returns an array of the optimized points, best first.
    """
    obj = optimizer.objective_function
    if starting_points is None:
        if num_multistarts is None:
            num_multistarts = getattr(optimizer.optimizer_parameters,
                                      "num_multistarts", 1)
        starting_points = \
            optimizer.domain.generate_latin_hypercube_points(
                num_multistarts)
    results = []
    for x0 in np.atleast_2d(np.asarray(starting_points, dtype=float)):
        obj.set_current_point(x0)
        x = optimizer.optimize()
        results.append((float(np.asarray(
            obj.compute_objective_function())), np.asarray(x)))
    results.sort(key=lambda t: -t[0])
    return np.asarray([x for _, x in results])
