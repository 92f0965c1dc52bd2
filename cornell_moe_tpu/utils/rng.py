"""Randomness source container.

Counterpart of ``RandomnessSourceContainer`` in the reference bindings
(gpp_python_common.hpp:146-236): one uniform-RNG stream plus per-thread
normal-RNG streams with explicit/time-based seeding and
reset-to-most-recent-seed (the CRN discipline MC estimators rely on).

TPU-native: everything is a counter-based JAX PRNG key; "per-thread"
streams become per-batch-element keys via fold_in, and
ResetToMostRecentSeed is re-deriving the same key — deterministic by
construction.
"""

from __future__ import annotations

import time

import jax


class RandomnessSourceContainer:
    """Uniform + normal PRNG key sources with reference-style seeding."""

    def __init__(self, num_normal_rng_streams: int = 1, seed: int = 0):
        self.num_normal_rng_streams = num_normal_rng_streams
        self._uniform_seed = seed
        self._normal_seed = seed
        self._uniform_counter = 0
        self._normal_counter = 0

    # -- seed management (binding-name parity) ----------------------------
    def set_explicit_uniform_generator_seed(self, seed: int):
        self._uniform_seed = int(seed)
        self._uniform_counter = 0

    def set_randomized_uniform_generator_seed(self, base_seed: int = 0):
        self._uniform_seed = int(base_seed) ^ int(time.time_ns() & 0x7fffffff)
        self._uniform_counter = 0

    def set_explicit_normal_rng_seed(self, seed: int):
        self._normal_seed = int(seed)
        self._normal_counter = 0

    def set_randomized_normal_rng_seed(self, base_seed: int = 0):
        self._normal_seed = int(base_seed) ^ int(time.time_ns() & 0x7fffffff)
        self._normal_counter = 0

    def reset_uniform_generator_seed(self):
        """ResetToMostRecentSeed counterpart (CRN)."""
        self._uniform_counter = 0

    def reset_normal_rng_seed(self):
        self._normal_counter = 0

    # -- key access -------------------------------------------------------
    def uniform_key(self) -> jax.Array:
        key = jax.random.fold_in(jax.random.PRNGKey(self._uniform_seed),
                                 self._uniform_counter)
        self._uniform_counter += 1
        return key

    next_key = uniform_key

    def normal_key(self, stream: int = 0) -> jax.Array:
        key = jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(self._normal_seed),
                               stream), self._normal_counter)
        self._normal_counter += 1
        return key

    def normal_keys(self) -> jax.Array:
        """One key per 'thread' stream (per-batch-element keys)."""
        base = jax.random.fold_in(jax.random.PRNGKey(self._normal_seed),
                                  self._normal_counter)
        self._normal_counter += 1
        return jax.random.split(base, self.num_normal_rng_streams)
