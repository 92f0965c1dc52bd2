"""Benchmark: MCMC-averaged q-KG suggest wall-clock on one TPU chip.

Workload: the reference's headline configuration scaled to the north-star
problem size (BASELINE.json): q=4 suggestion, 500 observations, 16-sample
hyperparameter ensemble, 200 multistarts x 50 GD steps x 2 restarts,
2^7 antithetic MC fantasy draws with a GD-polished inner posterior-mean
optimization per draw — the exact semantics the reference needs 100.08 s
for at ~12 observations on 4 CPU threads (README.md:211).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}, where
vs_baseline is the speedup factor over the reference's 100.08 s.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_SECONDS = 100.08   # reference q-KG suggest (README.md:211)


def main():
    import jax
    import jax.numpy as jnp

    from cornell_moe_tpu.config import enable_compilation_cache
    enable_compilation_cache()

    from cornell_moe_tpu.acquisition import knowledge_gradient as kg_mod
    from cornell_moe_tpu.acquisition.expected_improvement import (
        draw_antithetic_normals)
    from cornell_moe_tpu.models import mcmc as mcmc_mod
    from cornell_moe_tpu.ops import optimizers
    from cornell_moe_tpu.ops.domains import (RepeatedDomain,
                                             TensorProductDomain)

    dtype = jnp.float32
    rng = np.random.default_rng(0)

    # --- problem: Branin (standardized), 500 obs, ensemble of 16 ----------
    # Inputs normalized to the unit box and outputs standardized, as the
    # MCMC-trained hyperparameters would effectively impose; keeps the f32
    # Cholesky well-conditioned at 500 points.
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
    # amplitude ~ U[0.5, 2], lengths ~ U[0.2, 0.6] (unit box scale)
    hypers = np.stack([0.5 + 1.5 * rng.random(n_ensemble),
                       0.2 + 0.4 * rng.random(n_ensemble),
                       0.2 + 0.4 * rng.random(n_ensemble)], axis=1)
    noises = np.full((n_ensemble, 1), 1e-2)   # f32 noise floor

    states = mcmc_mod.fit_gp_ensemble(
        "matern_2.5", jnp.asarray(hypers, dtype),
        jnp.asarray(noises, dtype), jnp.asarray(x, dtype),
        jnp.asarray(y, dtype)[:, None], jitter=1e-5)
    jax.block_until_ready(states.chol_K)
    assert bool(jnp.all(jnp.isfinite(states.chol_K))), \
        "ensemble Cholesky produced NaNs"

    domain = TensorProductDomain.from_bounds(bounds)
    rep = RepeatedDomain(domain=domain, num_repeats=q)
    # reference knobs: examples/main.py:132-140
    outer_params = optimizers.GradientDescentParameters(
        num_multistarts=200, max_num_steps=50, max_num_restarts=2,
        num_steps_averaged=4, gamma=0.7, pre_mult=1.0,
        max_relative_change=0.5)
    inner_params = optimizers.GradientDescentParameters(
        num_multistarts=1, max_num_steps=6, max_num_restarts=1,
        num_steps_averaged=3, gamma=0.0, pre_mult=1.0,
        max_relative_change=0.1)

    discrete = jnp.asarray(
        bounds[:, 0] + rng.random((n_ensemble, n_discrete, dim)) *
        (bounds[:, 1] - bounds[:, 0]), dtype)
    best_so_far = jnp.full((n_ensemble,), float(y.min()), dtype)
    normals = draw_antithetic_normals(jax.random.PRNGKey(0), num_mc, q,
                                      dtype=dtype)
    starts = rep.generate_latin_hypercube_points(
        jax.random.PRNGKey(1), outer_params.num_multistarts).astype(dtype)

    # chunk 25 measured best on v5e (50: 3.05s, 100: 3.45s, 10: 3.09s
    # vs 25: 2.96s at the r2 state): the fused descent kernel serializes
    # over unions anyway, and small chunks pipeline better
    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 25

    def suggest(starts):
        def bvg(pts_batch):
            return kg_mod.knowledge_gradient_mcmc_batch_value_and_grad(
                states, pts_batch, discrete, normals, domain,
                inner_params, best_so_far, q)
        res = optimizers.multistart_optimize_batched(
            bvg, rep, starts, outer_params, chunk_size=chunk)
        return res.best_point, res.best_value

    suggest_jit = jax.jit(suggest)

    t0 = time.time()
    out = jax.block_until_ready(suggest_jit(starts))
    compile_and_first_run = time.time() - t0

    times = []
    for _ in range(3):
        t0 = time.time()
        out = jax.block_until_ready(suggest_jit(starts))
        times.append(time.time() - t0)
    wall = float(min(times))
    best_point, best_kg = out

    result = {
        "metric": "qKG suggest wall-clock (q=4, 500 obs, 16 hypers, "
                  "200 multistarts, 128 MC)",
        "value": round(wall, 4),
        "unit": "seconds",
        "vs_baseline": round(BASELINE_SECONDS / wall, 2),
    }
    print(json.dumps(result), flush=True)
    print(f"# compile+first-run {compile_and_first_run:.1f}s; "
          f"KG at best point {float(best_kg):.5f}; "
          f"device {jax.devices()[0].platform}", file=sys.stderr)


if __name__ == "__main__":
    main()
