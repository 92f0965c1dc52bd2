"""Geometry primitives and space-filling designs.

Counterpart of ``python/geometry_utils.py`` and ``cpp/gpp_geometry.hpp``:
ClosedInterval, hypercube/simplex membership, latin-hypercube and grid
point generation.  Functional jnp versions live on the domain classes
(ops/domains.py); these are the standalone host-friendly utilities with
reference-matching names.
"""

from __future__ import annotations

from collections import namedtuple

import numpy as np

ClosedInterval = namedtuple("ClosedInterval", ["min", "max"])
ClosedInterval.length = property(lambda self: self.max - self.min)
ClosedInterval.is_inside = lambda self, value: \
    self.min <= value <= self.max
ClosedInterval.is_empty = lambda self: self.min > self.max


def generate_latin_hypercube_points(num_points, domain_bounds, seed=None):
    """LHC sample over a list of ClosedInterval/(min,max) pairs
    (geometry_utils.py:12)."""
    rng = np.random.default_rng(seed)
    bounds = np.asarray([(b[0], b[1]) for b in domain_bounds], dtype=float)
    dim = bounds.shape[0]
    out = np.empty((num_points, dim))
    for d in range(dim):
        perm = rng.permutation(num_points)
        u = rng.random(num_points)
        out[:, d] = bounds[d, 0] + (perm + u) / num_points * \
            (bounds[d, 1] - bounds[d, 0])
    return out


def generate_grid_points(points_per_dimension, domain_bounds):
    """Tensor-product grid (geometry_utils.py:50)."""
    bounds = np.asarray([(b[0], b[1]) for b in domain_bounds], dtype=float)
    dim = bounds.shape[0]
    per_dim = np.broadcast_to(np.asarray(points_per_dimension), (dim,))
    axes = [np.linspace(bounds[d, 0], bounds[d, 1], int(per_dim[d]))
            for d in range(dim)]
    mesh = np.meshgrid(*axes, indexing="ij")
    return np.stack([m.ravel() for m in mesh], axis=1)


def check_point_inside_hypercube(domain_bounds, point) -> bool:
    """CheckPointInHypercube (gpp_geometry.hpp)."""
    point = np.asarray(point)
    bounds = np.asarray([(b[0], b[1]) for b in domain_bounds])
    return bool(np.all((point >= bounds[:, 0]) & (point <= bounds[:, 1])))


def check_point_in_unit_simplex(point) -> bool:
    """CheckPointInUnitSimplex (gpp_geometry.hpp)."""
    point = np.asarray(point)
    return bool(np.all(point >= 0.0) and point.sum() <= 1.0)
