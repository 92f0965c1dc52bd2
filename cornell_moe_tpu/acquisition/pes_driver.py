"""PES experiment driver: hyper sampling, x* sampling, the run_PES loop.

Counterpart of ``pes/run_PES.py`` + ``pes/PES/main.py`` +
``pes/PES/hyper_samples.py`` + ``pes/PES/sample_minimum.py`` +
``pes/PES/utilities.py`` in the reference: iterate (sample hypers by MCMC)
-> (draw approximate global minima via random features) -> (EP
conditioning) -> (maximize the PES acquisition) -> evaluate, appending
each iteration to the resumable Xsamples.txt / Ysamples.txt / guesses.txt
artifacts (pes/PES/utilities.py:84-137).

TPU-native: hyperparameter sampling reuses the on-device ensemble sampler;
x* draws and the acquisition multistart are vmapped/jitted; the Hessian at
x* is the exact autodiff Hessian of the sampled random-feature function
(the reference falls back to L-BFGS's inverse-Hessian approximation).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cornell_moe_tpu.acquisition import pes as pes_mod
from cornell_moe_tpu.models import covariance as cov_mod
from cornell_moe_tpu.models import gp as gp_mod
from cornell_moe_tpu.models import likelihood as lik_mod
from cornell_moe_tpu.models import mcmc as mcmc_mod
from cornell_moe_tpu.models.priors import HorseshoePrior, LognormalPrior
from cornell_moe_tpu.ops import optimizers, random_features
from cornell_moe_tpu.ops.domains import TensorProductDomain


def sample_hypers(key: jax.Array, x: jax.Array, y: jax.Array,
                  num_sets: int, burnin: int = 50,
                  noise_scale: float = 0.1):
    """Posterior samples of (noise, lengths, sigma) for the SE kernel.

    Counterpart of pes/PES/hyper_samples.py:18 (GPy MCMC/HMC): lognormal
    priors on amplitude/lengths, horseshoe on noise, sampled with the
    on-device ensemble sampler over log-hyperparameters.
    """
    dim = x.shape[1]
    amp_prior = LognormalPrior(sigma=1.0)
    len_prior = LognormalPrior(sigma=1.0)
    noise_prior = HorseshoePrior(scale=noise_scale)

    def log_prob_single(theta):
        lp = amp_prior.lnprob(theta[0:1]) + len_prior.lnprob(
            theta[1:1 + dim]) + noise_prior.lnprob(theta[-1:])
        h = jnp.exp(theta)
        cov = cov_mod.SquareExponential(
            hyperparameters=h[:1 + dim])
        lml = lik_mod.log_marginal_likelihood(cov, h[-1:][None][0], x,
                                              y[:, None])
        val = lp + lml
        return jnp.where(jnp.isfinite(val), val, -jnp.inf)

    log_prob = jax.jit(jax.vmap(log_prob_single))

    n_walkers = max(2 * (2 + dim), num_sets)
    if n_walkers % 2:
        n_walkers += 1
    k1, k2, k3 = jax.random.split(key, 3)
    p0 = 0.3 * jax.random.normal(k1, (n_walkers, dim + 2), dtype=x.dtype)
    pos, _ = mcmc_mod.run_ensemble_mcmc(k2, log_prob, p0,
                                        burnin + num_sets)
    pick = jax.random.randint(k3, (num_sets,), 0, n_walkers)
    samples = jnp.exp(pos[pick])
    sigma = samples[:, 0]
    lengths = samples[:, 1:1 + dim]
    noise = samples[:, -1]
    return noise, lengths, sigma


def sample_minimum_with_hessian(key: jax.Array, x: jax.Array, y: jax.Array,
                                sigma, lengths, noise, domain,
                                grid: jax.Array):
    """Draw one approximate global minimum x* and the Hessian there.

    Counterpart of pes/PES/sample_minimum.py:23 — random-feature posterior
    sample, grid-seeded gradient polish, exact autodiff Hessian.
    """
    hypers = jnp.concatenate([jnp.asarray(sigma)[None],
                              jnp.asarray(lengths)])
    cov = cov_mod.SquareExponential(hyperparameters=hypers)
    state = gp_mod.fit_gp(cov, jnp.asarray(noise)[None], x, y[:, None])
    sample = random_features.sample_gp_with_random_features(
        key, state, n_features=1000)
    x_min = random_features.global_optimization_of_gp_approximation(
        sample, domain, grid)

    def f(p):
        return random_features.evaluate_random_feature_sample(
            sample, p[None])[0]

    hess = jax.hessian(f)(x_min)
    return x_min, hess


def run_PES(target_function, x_minimum, x_maximum, dimension,
            number_of_hyperparameter_sets: int = 100,
            number_of_burnin: int = 50,
            sampling_method: str = "mcmc",
            number_of_initial_points: int = 3,
            number_of_experiments: int = 1,
            number_of_iterations: int = 60,
            number_of_features: int = 1000,
            optimization_method: str = "sga",
            seed: Optional[int] = None,
            output_dir: str = ".",
            gridsize: int = 500,
            verbose: bool = True):
    """The full PES loop (pes/PES/main.py:40 signature parity).

    Returns the history of (suggested point, value, recommendation) and
    writes the reference's resumable artifacts per iteration.
    """
    del sampling_method, number_of_features, optimization_method  # fixed
    from cornell_moe_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    key = jax.random.PRNGKey(0 if seed is None else seed)
    bounds = np.stack([np.asarray(x_minimum, float),
                       np.asarray(x_maximum, float)], axis=1)
    domain = TensorProductDomain.from_bounds(bounds)
    d = dimension
    m_sets = number_of_hyperparameter_sets

    def log(msg):
        if verbose:
            print(msg, flush=True)

    def write_artifact(name, arr):
        path = os.path.join(output_dir, name)
        with open(path, "a") as f:
            np.savetxt(f, np.atleast_2d(np.asarray(arr)))

    acq_params = optimizers.GradientDescentParameters(
        num_multistarts=1, max_num_steps=60, max_num_restarts=2,
        gamma=0.7, pre_mult=0.1, max_relative_change=0.5)

    history = []
    for pp in range(number_of_experiments):
        key, k_init = jax.random.split(key)
        xs = np.asarray(domain.generate_latin_hypercube_points(
            k_init, number_of_initial_points))
        ys = np.asarray([float(target_function(p)) for p in xs])
        write_artifact("Xsamples.txt", xs)
        write_artifact("Ysamples.txt", ys[:, None])
        write_artifact("guesses.txt", xs)
        log(f"Best so far in the initial data {ys.min():.6f}")

        for it in range(number_of_iterations):
            log(f"PES, {pp}th job, {it}th iteration")
            xj = jnp.asarray(xs)
            yj = jnp.asarray(ys)
            key, k_h, k_m, k_a, k_g = jax.random.split(key, 5)

            noise_s, len_s, sig_s = sample_hypers(
                k_h, xj, yj, m_sets, number_of_burnin)

            grid = domain.generate_latin_hypercube_points(k_g, gridsize)

            # per hyper-set: x* draw + EP conditioning, vmapped
            def per_set(k, nz, ls, sg):
                x_min, hess = sample_minimum_with_hessian(
                    k, xj, yj, sg, ls, nz, domain, grid)
                return pes_mod.make_pes_state(xj, yj, x_min, hess, sg,
                                              ls, nz)

            keys = jax.random.split(k_m, m_sets)
            states = jax.vmap(per_set)(keys, noise_s, len_s, sig_s)

            # maximize the marginalized acquisition: grid seed + SGA polish
            def acq(p):
                return pes_mod.pes_acquisition_multi(p, states, xj)

            grid_vals = jax.vmap(acq)(grid)
            x0 = grid[jnp.argmax(grid_vals)]
            vg = jax.value_and_grad(acq)
            x_opt = optimizers.gradient_ascent(vg, domain, x0, acq_params)
            x_opt = jnp.where(acq(x_opt) > grid_vals.max(), x_opt, x0)

            optimum = np.asarray(x_opt)
            value = float(target_function(optimum))
            xs = np.vstack([xs, optimum])
            ys = np.append(ys, value)
            write_artifact("Xsamples.txt", optimum)
            write_artifact("Ysamples.txt", [[value]])
            log(f"PES suggests: {optimum}")

            # recommendation: argmin of the hyper-averaged posterior mean
            def neg_post_mean(p):
                def one(nz, ls, sg):
                    cov = cov_mod.SquareExponential(
                        hyperparameters=jnp.concatenate([sg[None], ls]))
                    st = gp_mod.fit_gp(cov, nz[None], jnp.asarray(xs),
                                       jnp.asarray(ys)[:, None])
                    return gp_mod.posterior_mean(st, p[None])[0, 0]
                return -jnp.mean(jax.vmap(one)(noise_s, len_s, sig_s))

            grid_pm = jax.vmap(neg_post_mean)(grid)
            p0 = grid[jnp.argmax(grid_pm)]
            p_opt = optimizers.gradient_ascent(
                jax.value_and_grad(neg_post_mean), domain, p0, acq_params)
            p_opt = jnp.where(neg_post_mean(p_opt) > grid_pm.max(), p_opt,
                              p0)
            rec = np.asarray(p_opt)
            rec_value = float(target_function(rec))
            if rec_value >= ys.min():
                rec = xs[np.argmin(ys)]
                rec_value = float(ys.min())
            write_artifact("guesses.txt", rec)
            log(f"The recommended point {rec}; best so far "
                f"{min(rec_value, float(ys.min())):.6f}")
            history.append({"experiment": pp, "iteration": it,
                            "suggested": optimum, "value": value,
                            "recommended": rec,
                            "best_so_far": float(ys.min())})
    return history
