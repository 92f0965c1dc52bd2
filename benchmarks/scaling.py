"""Observation-count scaling of the q-KG suggest step on one TPU chip.

The reference's suggest is O(n^3) dense C++ (gpp_math.cpp:490 block
Cholesky) and took 100.08 s at ~12 observations (README.md:211); its
transcripts never demonstrate large-n operation.  Here the same
MCMC-averaged q-KG program (q=4, 16 hypers, 200 multistarts, 128 MC,
the bench.py solver schedule) is measured at n = 500 / 1000 / 2000
observations: the per-step cost is dominated by (B*M, N_ch) kernel-row
matmuls on the MXU, so wall-clock should grow roughly linearly in n,
not cubically.

Prints one JSON line per n:
  {"metric": "...", "n_obs": n, "value": seconds, "unit": "seconds"}

Run on the TPU tunnel:  python benchmarks/scaling.py [n1 n2 ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def measure(num_obs: int) -> dict:
    import jax
    import jax.numpy as jnp

    from cornell_moe_tpu.acquisition import knowledge_gradient as kg_mod
    from cornell_moe_tpu.acquisition.expected_improvement import (
        draw_antithetic_normals)
    from cornell_moe_tpu.models import mcmc as mcmc_mod
    from cornell_moe_tpu.ops import optimizers
    from cornell_moe_tpu.ops.domains import (RepeatedDomain,
                                             TensorProductDomain)

    dtype = jnp.float32
    rng = np.random.default_rng(0)

    dim, n_ensemble = 2, 16
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
        "matern_2.5", jnp.asarray(hypers, dtype),
        jnp.asarray(noises, dtype), jnp.asarray(x, dtype),
        jnp.asarray(y, dtype)[:, None], jitter=1e-5)
    jax.block_until_ready(states.chol_K)
    assert bool(jnp.all(jnp.isfinite(states.chol_K)))

    domain = TensorProductDomain.from_bounds(bounds)
    rep = RepeatedDomain(domain=domain, num_repeats=q)
    outer_params = optimizers.GradientDescentParameters(
        num_multistarts=200, max_num_steps=30, max_num_restarts=1,
        num_steps_averaged=4, gamma=0.7, pre_mult=1.0,
        max_relative_change=0.5)
    inner_cold = optimizers.GradientDescentParameters(
        num_multistarts=1, max_num_steps=6, max_num_restarts=1,
        num_steps_averaged=3, gamma=0.0, pre_mult=1.0,
        max_relative_change=0.1)
    inner_warm = optimizers.GradientDescentParameters(
        num_multistarts=1, max_num_steps=1, max_num_restarts=1,
        num_steps_averaged=0, gamma=0.0, pre_mult=1.0,
        max_relative_change=0.1)

    discrete = jnp.asarray(
        bounds[:, 0] + rng.random((n_ensemble, n_discrete, dim)) *
        (bounds[:, 1] - bounds[:, 0]), dtype)
    best_so_far = jnp.full((n_ensemble,), float(y.min()), dtype)
    normals = draw_antithetic_normals(jax.random.PRNGKey(0), num_mc, q,
                                      dtype=dtype)
    starts = rep.generate_latin_hypercube_points(
        jax.random.PRNGKey(1), outer_params.num_multistarts).astype(dtype)

    # the GP states are jit ARGUMENTS, not closure constants: at
    # n=2000 the (16, Np, Np) Cholesky alone is ~270 MB, which blows the
    # remote-compile tunnel's request-size cap (and the dispatch cost of
    # big embedded constants) if baked into the program
    def suggest(states, starts, discrete, normals, best_so_far):
        def bvg_cold(pts_batch):
            return kg_mod.knowledge_gradient_mcmc_batch_vg_carry(
                states, pts_batch, discrete, normals, domain, inner_cold,
                best_so_far, q)

        def bvg_warm(pts_batch, carry):
            return kg_mod.knowledge_gradient_mcmc_batch_vg_carry(
                states, pts_batch, discrete, normals, domain, inner_warm,
                best_so_far, q, inner_x0=carry, warm_mode="reseed")

        res = optimizers.multistart_optimize_batched_warm(
            bvg_cold, bvg_warm, rep, starts, outer_params, chunk_size=25)
        return res.best_point, res.best_value

    suggest_jit = jax.jit(suggest)
    args = (states, starts, discrete, normals, best_so_far)
    args = jax.device_put(args)
    t0 = time.time()
    out = jax.block_until_ready(suggest_jit(*args))
    compile_s = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        out = jax.block_until_ready(suggest_jit(*args))
        times.append(time.time() - t0)
    best_point, best_kg = out
    assert bool(np.isfinite(float(best_kg)))
    return {
        "metric": "qKG suggest wall-clock (q=4, 16 hypers, "
                  "200 multistarts, 128 MC)",
        "n_obs": num_obs,
        "value": round(float(min(times)), 4),
        "unit": "seconds",
        "compile_s": round(compile_s, 1),
        "best_kg": round(float(best_kg), 5),
    }


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [500, 1000, 2000]
    for n in sizes:
        print(json.dumps(measure(n)), flush=True)


if __name__ == "__main__":
    main()
