"""Synthetic benchmark objectives.

Counterpart of ``examples/synthetic_functions.py`` in the reference: each
objective carries ``_dim``, ``_search_domain``, ``_num_init_pts``,
``_sample_var``, ``_min_value``, ``_observations`` (derivative-observation
indices), ``_num_fidelity``, and ``evaluate(_true)`` returning
``[value, dvalue/dx_0, ..., dvalue/dx_{d-1}]``.

Values are implemented once in JAX; the gradient channels come from
``jax.grad`` instead of the reference's hand-derived expressions (several of
which contain small errors, e.g. the Branin gradient drops a cosine term).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


class SyntheticFunction:
    """Base: subclasses define ``_value(x) -> scalar`` in jnp."""

    _sample_var = 0.0
    _observations: tuple = ()
    _num_fidelity = 0
    _num_init_pts = 3

    def __init__(self):
        # Objective evaluation is host-side work (the driver calls it once
        # per suggested point); pin it to CPU so it never pays a TPU
        # compile/transfer round-trip.
        cpu = jax.devices("cpu")[0]
        self._cpu = cpu
        self._value_and_grad = jax.jit(
            jax.value_and_grad(lambda x: self._value(x)))
        self._rng = np.random.default_rng(0)

    def evaluate_true(self, x):
        # device_put to CPU pins the jitted computation there (objective
        # evaluation is host-side; a TPU round-trip costs minutes of
        # compile through the remote tunnel)
        x = jax.device_put(np.asarray(x, dtype=float), self._cpu)
        v, g = self._value_and_grad(x)
        return np.concatenate([[float(v)], np.asarray(g)])

    def evaluate(self, x):
        out = self.evaluate_true(x)
        if self._sample_var > 0:
            out = out + self._rng.normal(
                0.0, math.sqrt(self._sample_var), size=out.shape)
        return out

    @property
    def derivative_observations(self):
        return tuple(self._observations)


class Branin(SyntheticFunction):
    """Min 0.397887 at (pi, 2.275) and (9.42478, 2.475)."""

    def __init__(self):
        self._dim = 2
        self._search_domain = np.array([[0.0, 15.0], [-5.0, 15.0]])
        self._min_value = 0.397887
        super().__init__()

    def _value(self, x):
        a, b = 1.0, 5.1 / (4 * math.pi**2)
        c, r = 5.0 / math.pi, 6.0
        s, t = 10.0, 1.0 / (8 * math.pi)
        return (a * (x[1] - b * x[0]**2 + c * x[0] - r) ** 2
                + s * (1 - t) * jnp.cos(x[0]) + s)


class Rosenbrock(SyntheticFunction):
    """Min 0 at (1, ..., 1)."""

    def __init__(self, dim: int = 2):
        self._dim = dim
        self._search_domain = np.repeat([[-2.0, 2.0]], dim, axis=0)
        self._min_value = 0.0
        super().__init__()

    def _value(self, x):
        return jnp.sum((1.0 - x[:-1]) ** 2
                       + 100.0 * (x[1:] - x[:-1] ** 2) ** 2)


_H3_ALPHA = np.array([1.0, 1.2, 3.0, 3.2])
_H3_A = np.array([[3., 10., 30.], [0.1, 10., 35.],
                  [3., 10., 30.], [0.1, 10., 35.]])
_H3_P = 1e-4 * np.array([[3689, 1170, 2673], [4699, 4387, 7470],
                         [1091, 8732, 5547], [381, 5743, 8828]])


class Hartmann3(SyntheticFunction):
    """Min -3.86278 at (0.114614, 0.555649, 0.852547)."""

    def __init__(self):
        self._dim = 3
        self._search_domain = np.repeat([[0.0, 1.0]], 3, axis=0)
        self._min_value = -3.86278
        super().__init__()

    def _value(self, x):
        inner = -jnp.sum(_H3_A * (x[None, :] - _H3_P) ** 2, axis=1)
        return -jnp.sum(_H3_ALPHA * jnp.exp(inner))


_H6_ALPHA = np.array([1.0, 1.2, 3.0, 3.2])
_H6_A = np.array([[10, 3, 17, 3.50, 1.7, 8], [0.05, 10, 17, 0.1, 8, 14],
                  [3, 3.5, 1.7, 10, 17, 8], [17, 8, 0.05, 10, 0.1, 14]])
_H6_P = 1e-4 * np.array(
    [[1312, 1696, 5569, 124, 8283, 5886],
     [2329, 4135, 8307, 3736, 1004, 9991],
     [2348, 1451, 3522, 2883, 3047, 6650],
     [4047, 8828, 8732, 5743, 1091, 381]])


class Hartmann6(SyntheticFunction):
    """Min -3.32237 at (0.20169, 0.150011, 0.476874, 0.275332, 0.311652,
    0.6573)."""

    def __init__(self):
        self._dim = 6
        self._search_domain = np.repeat([[0.0, 1.0]], 6, axis=0)
        self._min_value = -3.32237
        super().__init__()

    def _value(self, x):
        inner = -jnp.sum(_H6_A * (x[None, :] - _H6_P) ** 2, axis=1)
        return -jnp.sum(_H6_ALPHA * jnp.exp(inner))


class Levy4(SyntheticFunction):
    """Min 0 at (1, 1, 1, 1); a difficult case for KG-type methods."""

    def __init__(self):
        self._dim = 4
        self._search_domain = np.repeat([[-5.0, 5.0]], 4, axis=0)
        self._min_value = 0.0
        super().__init__()

    def _value(self, x):
        z = 1.0 + (x - 1.0) / 4.0
        return (jnp.sin(math.pi * z[0]) ** 2
                + jnp.sum((z[:-1] - 1) ** 2
                          * (1 + 10 * jnp.sin(math.pi * z[:-1] + 1) ** 2))
                + (z[-1] - 1) ** 2
                * (1 + jnp.sin(2 * math.pi * z[-1]) ** 2))


class Ackley(SyntheticFunction):
    """Min 0 at the origin (domain scaled by 20 internally, value by 1/6)."""

    def __init__(self, dim: int = 5):
        self._dim = dim
        self._search_domain = np.repeat([[-1.0, 1.0]], dim, axis=0)
        self._min_value = 0.0
        super().__init__()

    def _value(self, x):
        from cornell_moe_tpu.ops.linalg import safe_sqrt
        x = 20.0 * x
        n = x.shape[0]
        first = jnp.sum(x**2) / n
        second = jnp.sum(jnp.cos(2 * math.pi * x)) / n
        # safe_sqrt: the gradient at the origin (a kink) is defined as 0
        return (-20.0 * jnp.exp(-0.2 * safe_sqrt(first))
                - jnp.exp(second) + 20.0 + math.e) / 6.0


class BraninNoisy(Branin):
    """Branin with observation noise (the README q-KG demo setting)."""

    _sample_var = 0.25


class BraninWithDerivatives(Branin):
    """Branin with observed gradients (the d-KG / d-EI setting.

    The reference enables this by setting _observations =
    numpy.arange(dim) on any synthetic function,
    examples/synthetic_functions.py:16)."""

    _observations = (0, 1)


class Hartmann6WithDerivatives(Hartmann6):
    """Noisy Hartmann6 with all six partials observed.

    The d-KG paper's winning regime (Wu et al. NeurIPS'17, cited at
    /root/reference/README.md:261-277): higher-dimensional + noisy +
    small budget.  The reference builds this configuration by setting
    _observations = numpy.arange(dim) and sample_var > 0 on any
    synthetic function (examples/synthetic_functions.py:16)."""

    _observations = (0, 1, 2, 3, 4, 5)
    _sample_var = 0.01


class BraninFidelity(SyntheticFunction):
    """Branin with one continuous-fidelity dimension (last coordinate).

    Low fidelity (s < 1) adds a smooth bias; evaluating at s = 1
    recovers Branin.  Cost of an evaluation is s (the continuous-fidelity
    KG divides VOI by max cost, gpp_kg_mcmc_optimization.cpp:87-104).
    """

    _num_fidelity = 1

    def __init__(self):
        self._dim = 3
        self._search_domain = np.array(
            [[0.0, 15.0], [-5.0, 15.0], [0.05, 1.0]])
        self._min_value = 0.397887
        super().__init__()

    def _value(self, x):
        a, b = 1.0, 5.1 / (4 * math.pi**2)
        c, r = 5.0 / math.pi, 6.0
        s, t = 10.0, 1.0 / (8 * math.pi)
        branin = (a * (x[1] - b * x[0]**2 + c * x[0] - r) ** 2
                  + s * (1 - t) * jnp.cos(x[0]) + s)
        fidelity = x[2]
        bias = 10.0 * (1.0 - fidelity) * jnp.cos(0.5 * x[0]) ** 2
        return branin + bias


SYNTHETIC_FUNCTIONS = {
    "Branin": Branin,
    "BraninNoisy": BraninNoisy,
    "BraninWithDerivatives": BraninWithDerivatives,
    "Hartmann6WithDerivatives": Hartmann6WithDerivatives,
    "BraninFidelity": BraninFidelity,
    "Rosenbrock": Rosenbrock,
    "Hartmann3": Hartmann3,
    "Levy4": Levy4,
    "Hartmann6": Hartmann6,
    "Ackley": Ackley,
}
