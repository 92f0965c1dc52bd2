"""Sweep suggest-bench configurations (warm start / outer depth / chunk).

Runs the bench.py q-KG suggest workload (500 obs, 16 hypers, q=4, 128 MC,
200 multistarts) under several solver configurations and reports, per
config: wall-clock (min of 3), the best KG value as measured by the COLD
(full-seeding, 6-inner-step) evaluator on the returned multistart
endpoints, and the suggested points.  The cold evaluator and the CRN
normals are shared across configs so the KG values are comparable.

Usage: python benchmarks/sweep_suggest.py [config ...]
where config is "cold,<steps>,<restarts>,<chunk>" or
"warm,<steps>,<restarts>,<chunk>,<warm_inner_steps>[,<conv_tol>]" (pure
warm) or "reseed,<steps>,<restarts>,<chunk>,<warm_inner_steps>
[,<conv_tol>]" (seeded warm); conv_tol enables the per-chunk
convergence-gated early exit (max step-norm over the chunk).
Defaults to the round-3 decision sweep.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from cornell_moe_tpu.config import enable_compilation_cache
enable_compilation_cache()

from cornell_moe_tpu.acquisition import knowledge_gradient as kg_mod
from cornell_moe_tpu.acquisition.expected_improvement import (
    draw_antithetic_normals)
from cornell_moe_tpu.models import mcmc as mcmc_mod
from cornell_moe_tpu.ops import optimizers
from cornell_moe_tpu.ops.domains import RepeatedDomain, TensorProductDomain

dtype = jnp.float32
rng = np.random.default_rng(0)
num_obs, dim, n_ensemble = 500, 2, 16
q, num_mc, n_discrete = 4, 2**7, 11
bounds = np.array([[0.0, 1.0], [0.0, 1.0]])
x = rng.random((num_obs, dim))


def branin(u):
    p0 = u[:, 0] * 15.0
    p1 = u[:, 1] * 20.0 - 5.0
    a, b = 1.0, 5.1 / (4 * np.pi**2)
    c, r, s, t = 5.0 / np.pi, 6.0, 10.0, 1.0 / (8 * np.pi)
    return (a * (p1 - b * p0**2 + c * p0 - r) ** 2
            + s * (1 - t) * np.cos(p0) + s)


y = branin(x)
y = (y - y.mean()) / y.std()
y += 0.01 * rng.standard_normal(num_obs)
hypers = np.stack([0.5 + 1.5 * rng.random(n_ensemble),
                   0.2 + 0.4 * rng.random(n_ensemble),
                   0.2 + 0.4 * rng.random(n_ensemble)], axis=1)
noises = np.full((n_ensemble, 1), 1e-2)
states = mcmc_mod.fit_gp_ensemble(
    "matern_2.5", jnp.asarray(hypers, dtype), jnp.asarray(noises, dtype),
    jnp.asarray(x, dtype), jnp.asarray(y, dtype)[:, None], jitter=1e-5)
jax.block_until_ready(states.chol_K)

domain = TensorProductDomain.from_bounds(bounds)
rep = RepeatedDomain(domain=domain, num_repeats=q)
inner_cold = optimizers.GradientDescentParameters(
    num_multistarts=1, max_num_steps=6, max_num_restarts=1,
    num_steps_averaged=3, gamma=0.0, pre_mult=1.0, max_relative_change=0.1)
discrete = jnp.asarray(
    bounds[:, 0] + rng.random((n_ensemble, n_discrete, dim)) *
    (bounds[:, 1] - bounds[:, 0]), dtype)
best_so_far = jnp.full((n_ensemble,), float(y.min()), dtype)
normals = draw_antithetic_normals(jax.random.PRNGKey(0), num_mc, q,
                                  dtype=dtype)
starts = rep.generate_latin_hypercube_points(jax.random.PRNGKey(1),
                                             200).astype(dtype)


def mk_outer(steps, restarts):
    return optimizers.GradientDescentParameters(
        num_multistarts=200, max_num_steps=steps,
        max_num_restarts=restarts, num_steps_averaged=4, gamma=0.7,
        pre_mult=1.0, max_relative_change=0.5)


def bvg_cold(pts):
    return kg_mod.knowledge_gradient_mcmc_batch_vg_carry(
        states, pts, discrete, normals, domain, inner_cold, best_so_far, q)


def suggest_cold(starts, steps, restarts, chunk):
    def bvg(pts):
        return kg_mod.knowledge_gradient_mcmc_batch_value_and_grad(
            states, pts, discrete, normals, domain, inner_cold,
            best_so_far, q)
    res = optimizers.multistart_optimize_batched(
        bvg, rep, starts, mk_outer(steps, restarts), chunk_size=chunk)
    return res.best_point, res.best_value


def suggest_warm(starts, steps, restarts, chunk, warm_steps,
                 warm_mode="pure", conv_tol=None):
    inner_warm = optimizers.GradientDescentParameters(
        num_multistarts=1, max_num_steps=warm_steps, max_num_restarts=1,
        num_steps_averaged=0, gamma=0.0, pre_mult=1.0,
        max_relative_change=0.1)

    def bvg_warm(pts, carry):
        return kg_mod.knowledge_gradient_mcmc_batch_vg_carry(
            states, pts, discrete, normals, domain, inner_warm,
            best_so_far, q, inner_x0=carry, warm_mode=warm_mode)

    res = optimizers.multistart_optimize_batched_warm(
        bvg_cold, bvg_warm, rep, starts, mk_outer(steps, restarts),
        chunk_size=chunk, conv_tol=conv_tol)
    return res.best_point, res.best_value


def run(cfg):
    parts = cfg.split(",")
    kind = parts[0]
    steps, restarts, chunk = int(parts[1]), int(parts[2]), int(parts[3])
    if kind in ("warm", "reseed"):
        wsteps = int(parts[4])
        conv_tol = float(parts[5]) if len(parts) > 5 else None
        mode = "pure" if kind == "warm" else "reseed"
        fn = jax.jit(lambda s: suggest_warm(s, steps, restarts, chunk,
                                            wsteps, mode, conv_tol))
    else:
        fn = jax.jit(lambda s: suggest_cold(s, steps, restarts, chunk))
    t0 = time.time()
    out = jax.block_until_ready(fn(starts))
    compile_t = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        out = jax.block_until_ready(fn(starts))
        times.append(time.time() - t0)
    pt, val = out
    print(f"{cfg:28s} wall={min(times):7.4f}s  best_KG={float(val):+.6f}  "
          f"(compile {compile_t:.0f}s)  pt={np.asarray(pt).round(4).tolist()}",
          flush=True)


DEFAULT = [
    "cold,50,2,50",
    "warm,50,2,50,2",
    "warm,50,1,50,2",
    "warm,50,1,25,2",
    "warm,50,1,50,1",
    "warm,30,1,50,2",
]

for cfg in (sys.argv[1:] or DEFAULT):
    run(cfg)
