"""RepeatedDomain compat wrapper (python/repeated_domain.py:9).

Wraps a compat domain so all operations act on (num_points, num_repeats,
dim) blocks, mirroring the reference's q-point product domain.
"""

from __future__ import annotations

import numpy as np

from cornell_moe_tpu.ops import domains as dom_mod


class RepeatedDomain:

    def __init__(self, num_repeats: int, domain):
        self.num_repeats = int(num_repeats)
        self._domain = domain
        self._core = dom_mod.RepeatedDomain(
            domain=getattr(domain, "core", domain),
            num_repeats=self.num_repeats)

    @property
    def core(self):
        return self._core

    @property
    def dim(self):
        return self._domain.dim

    def check_point_inside(self, points):
        return bool(np.all(self._core.check_point_inside(
            np.asarray(points, dtype=float))))

    def generate_uniform_random_points_in_domain(self, num_points,
                                                 random_source=None):
        pts = self._domain.generate_uniform_random_points_in_domain(
            num_points * self.num_repeats, random_source)
        return pts.reshape(num_points, self.num_repeats, self.dim)

    def generate_latin_hypercube_points(self, num_points,
                                        random_source=None):
        pts = self._domain.generate_latin_hypercube_points(
            num_points * self.num_repeats, random_source)
        return pts.reshape(num_points, self.num_repeats, self.dim)

    def compute_update_restricted_to_domain(self, max_relative_change,
                                            current_point, update_vector):
        return np.asarray(self._core.limit_update(
            max_relative_change, np.asarray(current_point, dtype=float),
            np.asarray(update_vector, dtype=float)))
