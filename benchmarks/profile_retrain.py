"""Phase-level profiling of the MCMC retrain chain step on the real TPU.

Splits one stretch-move chain step's log-posterior evaluation into its
linear-algebra phases at the bench shape (500 obs padded to 512, 8-walker
half-ensemble batch) to locate the sequential-depth cost that the fused
LML kernel / hybrid panel scheme must beat.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from cornell_moe_tpu.models import covariance as cov_mod
from cornell_moe_tpu.models import likelihood as lik_mod
from cornell_moe_tpu.models import mcmc as mcmc_mod
from cornell_moe_tpu.models.priors import DefaultPrior

dtype = jnp.float32
rng = np.random.default_rng(0)
num_obs, dim = 500, 2
W = 8                       # half-ensemble batch per log_prob call
x = jnp.asarray(rng.random((num_obs, dim)), dtype)
y = jnp.asarray(rng.standard_normal(num_obs), dtype)[:, None]

prior = DefaultPrior(n_dims=1 + dim + 1, num_noise=1)
thetas = jnp.asarray(
    np.log(np.stack([0.5 + 1.5 * rng.random(W),
                     0.2 + 0.4 * rng.random(W),
                     0.2 + 0.4 * rng.random(W),
                     np.full(W, 1e-2)], axis=1)), dtype)


def timeit(name, fn, *args, reps=100):
    def scanned(first, rest):
        def body(u, _):
            out = fn(u, *rest)
            leaves = jax.tree_util.tree_leaves(out)
            bump = sum(jnp.sum(l) for l in leaves) * 1e-20
            return u + bump.astype(u.dtype), None
        u, _ = lax.scan(body, first, None, length=reps)
        return u

    f = jax.jit(lambda first: scanned(first, args[1:]))
    t0 = time.time()
    out = jax.block_until_ready(f(args[0]))
    compile_t = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = jax.block_until_ready(f(args[0]))
        ts.append(time.time() - t0)
    per = min(ts) / reps
    print(f"{name:45s} {per*1000:9.3f} ms/iter   (compile {compile_t:.1f}s)",
          flush=True)
    return out


def build_K(thetas):
    """(W, N, N) covariance + noise diagonal."""
    def one(t):
        h = jnp.exp(t)
        cov = cov_mod.MaternNu2p5(hyperparameters=h[:dim + 1])
        return cov_mod.build_covariance_matrix_with_noise(
            cov, x, (), h[dim + 1:])
    return jax.vmap(one)(thetas)


def build_chol(thetas):
    return jnp.linalg.cholesky(build_K(thetas))


def full_lml(thetas):
    def one(t):
        h = jnp.exp(t)
        cov = cov_mod.MaternNu2p5(hyperparameters=h[:dim + 1])
        return lik_mod.log_marginal_likelihood(cov, h[dim + 1:], x, y, ())
    return jax.vmap(one)(thetas)


def log_post(thetas):
    def one(t):
        h = jnp.exp(t)
        cov = cov_mod.MaternNu2p5(hyperparameters=h[:dim + 1])
        lml = lik_mod.log_marginal_likelihood(cov, h[dim + 1:], x, y, ())
        return lml + prior.lnprob(t)
    return jax.vmap(one)(thetas)


def chol_only(k):
    return jnp.linalg.cholesky(k)


k_fixed = jax.jit(build_K)(thetas)
jax.block_until_ready(k_fixed)

timeit("K build only (W=8, 500)", build_K, thetas)
timeit("chol only (pre-built K)", chol_only, k_fixed)
timeit("K build + chol", build_chol, thetas)
timeit("full LML", full_lml, thetas)
timeit("log posterior (LML + prior)", log_post, thetas)

# one full stretch-move step (two half-batches of 8) at chain scale
model_lp = None


def chain_step(key):
    pos = thetas_full
    lp = log_post16(pos)
    pos, lp = mcmc_mod.stretch_move_step(key, pos, lp, log_post16)
    return pos, lp


thetas_full = jnp.concatenate([thetas, thetas + 0.01])


def log_post16(t):
    return log_post(t)


timeit("stretch-move step (16 walkers, incl lp0)", chain_step,
       jax.random.PRNGKey(0), reps=50)
print("# retrain ~= 1000 steps x step-cost + dispatch", flush=True)
