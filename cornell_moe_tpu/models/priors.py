"""Hyperparameter priors (spearmint-style), JAX-native.

Counterpart of ``python/base_prior.py`` and ``python/default_priors.py`` in
the reference.  All ``lnprob`` functions take hyperparameters on a LOG
scale, exactly like the reference (including the spearmint quirk of
evaluating the horseshoe density on the log-space value directly,
base_prior.py:64-82).  Unlike the reference (numpy + scipy.stats on host),
these are pure jnp functions, so the full MCMC log-posterior jits onto
device.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import struct


class TophatPrior(struct.PyTreeNode):
    """Uniform on [min, max] in log space (base_prior.py:80)."""

    min: float = struct.field(pytree_node=False, default=-2.0)
    max: float = struct.field(pytree_node=False, default=3.0)

    def lnprob(self, theta: jax.Array) -> jax.Array:
        inside = jnp.all((theta >= self.min) & (theta <= self.max))
        return jnp.where(inside, 0.0, -jnp.inf)

    def sample_from_prior(self, key: jax.Array, n_samples: int,
                          d: int = 1) -> jax.Array:
        return self.min + jax.random.uniform(key, (n_samples, d)) * \
            (self.max - self.min)


class NormalPrior(struct.PyTreeNode):
    """Gaussian in log space (base_prior.py:321)."""

    mean: float = struct.field(pytree_node=False, default=0.0)
    sigma: float = struct.field(pytree_node=False, default=1.0)

    def lnprob(self, theta: jax.Array) -> jax.Array:
        z = (theta - self.mean) / self.sigma
        return jnp.sum(-0.5 * z * z - math.log(self.sigma)
                       - 0.5 * math.log(2.0 * math.pi))

    def sample_from_prior(self, key: jax.Array, n_samples: int,
                          d: int = 1) -> jax.Array:
        return self.mean + self.sigma * \
            jax.random.normal(key, (n_samples, d))


class HorseshoePrior(struct.PyTreeNode):
    """Horseshoe as used in spearmint (base_prior.py:165).

    lnprob(theta) = log(log(1 + 3 (scale / theta)^2)), with theta the
    log-space value — a reference quirk kept for parity.
    """

    scale: float = struct.field(pytree_node=False, default=0.1)

    def lnprob(self, theta: jax.Array) -> jax.Array:
        safe = jnp.where(theta == 0.0, 1.0, theta)
        val = jnp.log(jnp.log1p(3.0 * (self.scale / safe) ** 2))
        return jnp.sum(jnp.where(theta == 0.0, jnp.inf, val))

    def sample_from_prior(self, key: jax.Array, n_samples: int,
                          d: int = 1) -> jax.Array:
        k1, k2 = jax.random.split(key)
        lamda = jnp.abs(jax.random.cauchy(k1, (n_samples, d)))
        g = jax.random.normal(k2, (n_samples, d))
        return jnp.log(jnp.abs(g * lamda * self.scale))


class LognormalPrior(struct.PyTreeNode):
    """scipy.stats.lognorm.logpdf(theta, sigma, loc=mean) counterpart
    (base_prior.py:244)."""

    sigma: float = struct.field(pytree_node=False, default=1.0)
    mean: float = struct.field(pytree_node=False, default=0.0)

    def lnprob(self, theta: jax.Array) -> jax.Array:
        x = theta - self.mean
        safe = jnp.where(x > 0, x, 1.0)
        val = (-jnp.log(safe) - math.log(self.sigma)
               - 0.5 * math.log(2.0 * math.pi)
               - 0.5 * (jnp.log(safe) / self.sigma) ** 2)
        return jnp.sum(jnp.where(x > 0, val, -jnp.inf))

    def sample_from_prior(self, key: jax.Array, n_samples: int,
                          d: int = 1) -> jax.Array:
        return jnp.exp(self.sigma *
                       jax.random.normal(key, (n_samples, d))) + self.mean


class DefaultPrior(struct.PyTreeNode):
    """The reference's DefaultPrior (default_priors.py:11):

      * Normal(0, 1) on the log covariance amplitude  theta[0]
      * Tophat(-2, 3) on the log length scales        theta[1:-num_noise]
      * Horseshoe(0.1) on each log noise              theta[-num_noise:]
    """

    n_dims: int = struct.field(pytree_node=False)
    num_noise: int = struct.field(pytree_node=False)
    amp_prior: NormalPrior = NormalPrior()
    length_prior: TophatPrior = TophatPrior(min=-2.0, max=3.0)
    noise_prior: HorseshoePrior = HorseshoePrior(scale=0.1)

    def lnprob(self, theta: jax.Array) -> jax.Array:
        lp = self.amp_prior.lnprob(theta[0:1])
        lp += self.length_prior.lnprob(theta[1:self.n_dims - self.num_noise])
        lp += self.noise_prior.lnprob(theta[self.n_dims - self.num_noise:])
        return lp

    def sample_from_prior(self, key: jax.Array, n_samples: int
                          ) -> jax.Array:
        k1, k2, k3 = jax.random.split(key, 3)
        num_lengths = self.n_dims - self.num_noise - 1
        amp = self.amp_prior.sample_from_prior(k1, n_samples, 1)
        lengths = self.length_prior.sample_from_prior(k2, n_samples,
                                                      num_lengths)
        noise = self.noise_prior.sample_from_prior(k3, n_samples,
                                                   self.num_noise)
        return jnp.concatenate([amp, lengths, noise], axis=1)
