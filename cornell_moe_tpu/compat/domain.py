"""Domain wrappers for the compatibility layer.

Counterpart of ``cpp_wrappers/domain.py``: TensorProductDomain /
SimplexIntersectTensorProductDomain built from ClosedInterval lists, with
the reference's ``_domain_type`` tags and host-numpy returns.
"""

from __future__ import annotations

import jax
import numpy as np

from cornell_moe_tpu.compat.interfaces import DomainInterface
from cornell_moe_tpu.ops import domains as dom_mod
from cornell_moe_tpu.utils.constant import (
    SIMPLEX_INTERSECT_TENSOR_PRODUCT_DOMAIN_TYPE,
    TENSOR_PRODUCT_DOMAIN_TYPE)


class _DomainCompat(DomainInterface):

    def __init__(self, domain_bounds, rng_key=None):
        self._domain_bounds = [(float(b[0]), float(b[1]))
                               for b in domain_bounds]
        self._core = self._build()
        self._key = rng_key if rng_key is not None else \
            jax.random.PRNGKey(0)

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    @property
    def dim(self):
        return len(self._domain_bounds)

    @property
    def core(self):
        """The functional pytree domain (TPU-native extension)."""
        return self._core

    def check_point_inside(self, point):
        return bool(self._core.check_point_inside(
            np.asarray(point, dtype=float)))

    def generate_uniform_random_points_in_domain(self, num_points,
                                                 random_source=None):
        key = random_source.next_key() if random_source is not None \
            else self._next_key()
        return np.asarray(
            self._core.generate_uniform_random_points_in_domain(
                key, num_points))

    def generate_latin_hypercube_points(self, num_points,
                                        random_source=None):
        key = random_source.next_key() if random_source is not None \
            else self._next_key()
        return np.asarray(self._core.generate_latin_hypercube_points(
            key, num_points))

    def compute_update_restricted_to_domain(self, max_relative_change,
                                            current_point, update_vector):
        return np.asarray(self._core.limit_update(
            max_relative_change, np.asarray(current_point, dtype=float),
            np.asarray(update_vector, dtype=float)))


class TensorProductDomain(_DomainCompat):
    """cpp_wrappers/domain.py:15 counterpart."""

    _domain_type = TENSOR_PRODUCT_DOMAIN_TYPE

    def _build(self):
        return dom_mod.TensorProductDomain.from_bounds(
            np.asarray(self._domain_bounds))


class SimplexIntersectTensorProductDomain(_DomainCompat):
    """cpp_wrappers/domain.py:107 counterpart."""

    _domain_type = SIMPLEX_INTERSECT_TENSOR_PRODUCT_DOMAIN_TYPE

    def _build(self):
        return dom_mod.SimplexIntersectTensorProductDomain.from_bounds(
            np.asarray(self._domain_bounds))
