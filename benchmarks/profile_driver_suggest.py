"""Phase breakdown of the production driver's KG suggest on the real TPU.

The full-iteration bench (bench_suite.py config 9) showed the driver's
suggest phase at the Branin transcript shape costs ~0.73 s while the raw
KG multistart alone runs in ~0.074 s — the seeding protocol (ensemble
q-EI with 10 points + per-model posterior-mean argmins,
examples/main.py:170-200 in the reference) dominates at small shapes.
This script times each sub-phase separately, ungated vs conv_tol-gated,
so solver-schedule decisions are measured rather than guessed.

Run on the TPU: python benchmarks/profile_driver_suggest.py [conv_tol]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from cornell_moe_tpu import bayes_opt as bo_mod
from cornell_moe_tpu.acquisition import expected_improvement as ei_mod
from cornell_moe_tpu.acquisition import knowledge_gradient as kg_mod
from cornell_moe_tpu.models import mcmc as mcmc_mod
from cornell_moe_tpu.ops import optimizers
from cornell_moe_tpu.ops.domains import TensorProductDomain
from cornell_moe_tpu.utils import synthetic_functions as sf

CONV_TOL = float(sys.argv[1]) if len(sys.argv) > 1 else 3e-3


def timeit(fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.time() - t0)
    return min(ts), out


def main():
    f = sf.Branin()
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    domain = TensorProductDomain(
        bounds=jnp.asarray(f._search_domain, dtype))

    # transcript steady-state shape: 43 observations, bucket 16 -> 48
    n_obs = 43
    x = np.stack([rng.uniform(lo, hi, n_obs)
                  for lo, hi in f._search_domain], axis=1)
    y = np.asarray([f.evaluate_true(p)[0] for p in x])[:, None]

    from cornell_moe_tpu.utils.data_containers import HistoricalData
    hist = HistoricalData(2)
    hist.append_historical_data(x, y, np.full((n_obs, 1), 1e-4))
    model = mcmc_mod.GaussianProcessLogLikelihoodMCMC(
        hist, chain_length=500, burnin_steps=500, n_hypers=16,
        noisy=False, rng_key=jax.random.PRNGKey(0), bucket=16)
    model.train()
    states = model.models
    print(f"# ensemble ready: {n_obs} obs bucketed to "
          f"{states.points_sampled.shape[1]}", flush=True)

    q, num_mc = 4, 2**7
    sgd = bo_mod.DEFAULT_SGD_PARAMS_KG
    ps = bo_mod.DEFAULT_SGD_PARAMS_PS
    k_seed, k_sugg = jax.random.PRNGKey(1), jax.random.PRNGKey(2)

    # --- phase A: seeding (q-EI + per-model PS argmin) ------------------
    def seed(k, tol):
        return bo_mod.seed_kg_discretization(
            k, states, domain, qei_params=sgd, ps_params=ps,
            conv_tol=tol)

    seed_u = jax.jit(lambda k: seed(k, None))
    seed_g = jax.jit(lambda k: seed(k, CONV_TOL))
    t_seed_u, disc_u = timeit(seed_u, k_seed)
    t_seed_g, disc_g = timeit(seed_g, k_seed)
    drift = float(jnp.max(jnp.abs(disc_u - disc_g)))
    print(f"seeding ungated {t_seed_u:.3f}s   gated {t_seed_g:.3f}s   "
          f"max|disc drift| {drift:.4f}", flush=True)

    # --- phase A split: q-EI alone vs PS argmins ------------------------
    import jax.random as jr
    k_ei, k_eval = jr.split(k_seed)

    def qei(k, tol):
        return ei_mod.multistart_expected_improvement_mcmc_optimization(
            k, states, domain, 10, sgd, num_mc_iterations=2**10,
            conv_tol=tol)

    t_qei_u, _ = timeit(jax.jit(lambda k: qei(k, None)), k_ei)
    t_qei_g, _ = timeit(jax.jit(lambda k: qei(k, CONV_TOL)), k_ei)
    print(f"  q-EI(10) ungated {t_qei_u:.3f}s   gated {t_qei_g:.3f}s",
          flush=True)

    def ps_argmins(k):
        eval_pts = domain.generate_uniform_random_points_in_domain(
            k, 1000)

        def per_model(s):
            guesses = jnp.concatenate([eval_pts, s.points_sampled],
                                      axis=0)
            pt, _ = kg_mod.compute_optimal_posterior_mean(
                s, domain, guesses, ps, 0)
            return pt

        return jax.vmap(per_model)(states)

    t_ps, _ = timeit(jax.jit(ps_argmins), k_eval)
    print(f"  PS argmins {t_ps:.3f}s", flush=True)

    # --- phase B: KG multistart given the discretization ----------------
    def kg_phase(k, disc, tol):
        return bo_mod._qkg_suggest_arrays(
            k, states, domain, disc, sgd, ps, q, num_mc, 0,
            conv_tol=tol)

    t_kg_u, (pts_u, voi_u) = timeit(
        jax.jit(lambda k: kg_phase(k, disc_u, None)), k_sugg)
    t_kg_g, (pts_g, voi_g) = timeit(
        jax.jit(lambda k: kg_phase(k, disc_u, CONV_TOL)), k_sugg)
    print(f"KG phase ungated {t_kg_u:.3f}s   gated {t_kg_g:.3f}s   "
          f"VOI {float(voi_u):.4f} vs {float(voi_g):.4f}   "
          f"max|pt drift| {float(jnp.max(jnp.abs(pts_u - pts_g))):.4f}",
          flush=True)

    # --- full composite (what the driver jits) --------------------------
    def full(ks, kg, tol):
        disc = bo_mod.seed_kg_discretization(
            ks, states, domain, qei_params=sgd, ps_params=ps,
            conv_tol=tol)
        return bo_mod._qkg_suggest_arrays(
            kg, states, domain, disc, sgd, ps, q, num_mc, 0,
            conv_tol=tol)

    t_full_u, _ = timeit(jax.jit(lambda a, b: full(a, b, None)),
                         k_seed, k_sugg)
    t_full_g, _ = timeit(jax.jit(lambda a, b: full(a, b, CONV_TOL)),
                         k_seed, k_sugg)
    print(f"FULL suggest ungated {t_full_u:.3f}s   gated {t_full_g:.3f}s "
          f"(conv_tol={CONV_TOL})", flush=True)


if __name__ == "__main__":
    main()
