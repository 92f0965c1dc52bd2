"""Optimization domains (tensor-product box, simplex-intersect, repeated).

TPU-native counterpart of ``gpp_domain.{hpp,cpp}`` and
``python/cpp_wrappers/domain.py`` in the reference.  Domains are pytrees so
they pass through jit/vmap; all geometry ops are vectorized (the reference
loops per coordinate, gpp_domain.cpp:64-110).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import struct

# Mirrors kInvalidStepScaleFactor (gpp_domain.hpp): when a proposed step
# would exit the domain, fall back to the larger of half the step or half
# the distance to the wall.
_INVALID_STEP_SCALE = 0.5
_RELATIVE_CHANGE_EPSILON_TWEAK = 4.0 * jnp.finfo(jnp.float32).eps


class TensorProductDomain(struct.PyTreeNode):
    """Axis-aligned box domain (gpp_domain.hpp:70)."""

    bounds: jax.Array  # (dim, 2): [:, 0] = min, [:, 1] = max

    @classmethod
    def from_bounds(cls, bounds) -> "TensorProductDomain":
        return cls(bounds=jnp.asarray(bounds, dtype=float).reshape(-1, 2))

    @property
    def dim(self) -> int:
        return self.bounds.shape[0]

    @property
    def lower(self) -> jax.Array:
        return self.bounds[:, 0]

    @property
    def upper(self) -> jax.Array:
        return self.bounds[:, 1]

    def check_point_inside(self, point: jax.Array) -> jax.Array:
        return jnp.all((point >= self.lower) & (point <= self.upper),
                       axis=-1)

    def clip(self, point: jax.Array) -> jax.Array:
        return jnp.clip(point, self.lower, self.upper)

    def generate_uniform_random_points_in_domain(self, key: jax.Array,
                                                 num_points: int
                                                 ) -> jax.Array:
        u = jax.random.uniform(key, (num_points, self.dim),
                               dtype=self.bounds.dtype)
        return self.lower + u * (self.upper - self.lower)

    def generate_latin_hypercube_points(self, key: jax.Array,
                                        num_points: int) -> jax.Array:
        """Stratified LHC sample (geometry_utils.py:12 counterpart)."""
        key_perm, key_u = jax.random.split(key)
        perms = jax.vmap(
            lambda k: jax.random.permutation(k, num_points))(
                jax.random.split(key_perm, self.dim))        # (dim, n)
        u = jax.random.uniform(key_u, (num_points, self.dim),
                               dtype=self.bounds.dtype)
        strata = (perms.T + u) / num_points
        return self.lower + strata * (self.upper - self.lower)

    def limit_update(self, max_relative_change, current_point: jax.Array,
                     update_vector: jax.Array) -> jax.Array:
        """Clamp a proposed step so the new point stays inside the box.

        Vectorized port of TensorProductDomain::LimitUpdate semantics
        (gpp_domain.cpp:64-110): per coordinate, |step| is capped at
        ``max_relative_change * distance_to_nearest_boundary``; if the step
        would still exit (possible when max_relative_change > 1), fall back
        to the larger in-domain option of half the step or half the distance
        to the violated wall.
        """
        x, dx = current_point, update_vector
        dist = jnp.minimum(x - self.lower, self.upper - x)
        cap = max_relative_change * dist
        step = jnp.where(jnp.abs(dx) > cap, jnp.sign(dx) * cap, dx)

        nxt = x + step
        half = step * _INVALID_STEP_SCALE
        # violation below the lower bound
        below = nxt < self.lower
        half_bad_lo = (x + half) < self.lower
        fix_lo = jnp.where(half_bad_lo,
                           (self.lower - x) * _INVALID_STEP_SCALE, half)
        # violation above the upper bound
        above = nxt > self.upper
        half_bad_hi = (x + half) > self.upper
        fix_hi = jnp.where(half_bad_hi,
                           (self.upper - x) * _INVALID_STEP_SCALE, half)
        return jnp.where(below, fix_lo, jnp.where(above, fix_hi, step))


class SimplexIntersectTensorProductDomain(struct.PyTreeNode):
    """Intersection of the unit simplex with a box (gpp_domain.hpp:215)."""

    tensor_product_domain: TensorProductDomain

    @classmethod
    def from_bounds(cls, bounds) -> "SimplexIntersectTensorProductDomain":
        box = TensorProductDomain.from_bounds(bounds)
        # As in the reference ctor, intersect the box with [0, 1]^d.
        clipped = jnp.stack([jnp.clip(box.lower, 0.0, 1.0),
                             jnp.clip(box.upper, 0.0, 1.0)], axis=1)
        return cls(tensor_product_domain=TensorProductDomain(bounds=clipped))

    @property
    def dim(self) -> int:
        return self.tensor_product_domain.dim

    def check_point_inside(self, point: jax.Array) -> jax.Array:
        in_box = self.tensor_product_domain.check_point_inside(point)
        in_simplex = (jnp.sum(point, axis=-1) <= 1.0) & \
            jnp.all(point >= 0.0, axis=-1)
        return in_box & in_simplex

    def clip(self, point: jax.Array) -> jax.Array:
        p = self.tensor_product_domain.clip(point)
        total = jnp.sum(p, axis=-1, keepdims=True)
        scale = jnp.where(total > 1.0, (1.0 - 1e-12) / total, 1.0)
        return p * scale

    def generate_uniform_random_points_in_domain(self, key: jax.Array,
                                                 num_points: int,
                                                 oversample: int = 8
                                                 ) -> jax.Array:
        """Rejection sampling from the box, clipping leftovers to the simplex.

        The reference assumes most box volume lies in the simplex and
        rejection-samples (gpp_domain.cpp:150-210); here we draw a fixed
        oversample (static shape for jit), prefer accepted draws, and repair
        any shortfall by projection so the output shape stays static.
        """
        cand = self.tensor_product_domain.\
            generate_uniform_random_points_in_domain(
                key, num_points * oversample)
        ok = self.check_point_inside(cand)
        order = jnp.argsort(~ok)        # accepted candidates first
        chosen = cand[order[:num_points]]
        return jnp.where(self.check_point_inside(chosen)[:, None], chosen,
                         self.clip(chosen))

    def limit_update(self, max_relative_change, current_point: jax.Array,
                     update_vector: jax.Array) -> jax.Array:
        """Box LimitUpdate, then shrink along the step direction to satisfy
        the simplex constraint (gpp_domain.cpp:234-300 semantics)."""
        max_relative_change = jnp.where(
            max_relative_change == 1.0,
            max_relative_change - _RELATIVE_CHANGE_EPSILON_TWEAK,
            max_relative_change)
        step = self.tensor_product_domain.limit_update(
            max_relative_change, current_point, update_vector)
        nxt = current_point + step
        total = jnp.sum(nxt, axis=-1, keepdims=True)
        step_sum = jnp.sum(step, axis=-1, keepdims=True)
        # scale the step so sum(x + scale * step) == 1 when violating
        denom = jnp.where(jnp.abs(step_sum) > 1e-300, step_sum, 1.0)
        scale = (1.0 - jnp.sum(current_point, axis=-1, keepdims=True)) / denom
        scale = jnp.clip(scale, 0.0, 1.0)
        violate = total > 1.0
        return jnp.where(violate, step * scale, step)


class RepeatedDomain(struct.PyTreeNode):
    """q-point product domain wrapper (repeated_domain.py:9 counterpart).

    Operates on arrays of shape (..., num_repeats, dim); every op broadcasts
    the base domain across the repeat axis.
    """

    domain: TensorProductDomain
    num_repeats: int = struct.field(pytree_node=False)

    @property
    def dim(self) -> int:
        return self.domain.dim

    def check_point_inside(self, points: jax.Array) -> jax.Array:
        return jnp.all(self.domain.check_point_inside(points), axis=-1)

    def clip(self, points: jax.Array) -> jax.Array:
        return self.domain.clip(points)

    def generate_uniform_random_points_in_domain(self, key: jax.Array,
                                                 num_points: int
                                                 ) -> jax.Array:
        pts = self.domain.generate_uniform_random_points_in_domain(
            key, num_points * self.num_repeats)
        return pts.reshape(num_points, self.num_repeats, self.dim)

    def generate_latin_hypercube_points(self, key: jax.Array,
                                        num_points: int) -> jax.Array:
        pts = self.domain.generate_latin_hypercube_points(
            key, num_points * self.num_repeats)
        return pts.reshape(num_points, self.num_repeats, self.dim)

    def limit_update(self, max_relative_change, current_point: jax.Array,
                     update_vector: jax.Array) -> jax.Array:
        return self.domain.limit_update(max_relative_change, current_point,
                                        update_vector)


def tensor_product_domain(bounds) -> TensorProductDomain:
    return TensorProductDomain.from_bounds(bounds)


class DummyDomain(struct.PyTreeNode):
    """Domain containing every point (gpp_domain.hpp:47)."""

    def check_point_inside(self, point: jax.Array) -> jax.Array:
        return jnp.ones(jnp.asarray(point).shape[:-1], dtype=bool)

    def clip(self, point: jax.Array) -> jax.Array:
        return point

    def limit_update(self, max_relative_change, current_point,
                     update_vector):
        del max_relative_change, current_point
        return update_vector
