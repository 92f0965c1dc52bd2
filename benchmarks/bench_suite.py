"""Benchmark suite over the BASELINE.json config list.

Covers the five reference configurations (BASELINE.json "configs"); each
prints one JSON line with the steady-state (post-compile) wall-clock of
the jitted suggest computation on the current default device.

Usage: python benchmarks/bench_suite.py [--small]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def _timeit(fn, *args, reps=3):
    import jax
    out = jax.block_until_ready(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(fn(*args))
        times.append(time.time() - t0)
    return min(times), out


def _report(name, seconds, extra=None):
    rec = {"metric": name, "value": round(seconds, 4), "unit": "seconds"}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def main(small: bool = False):
    import jax
    import jax.numpy as jnp

    from cornell_moe_tpu.acquisition import expected_improvement as ei_mod
    from cornell_moe_tpu.acquisition import knowledge_gradient as kg_mod
    from cornell_moe_tpu.models import covariance as cov_mod
    from cornell_moe_tpu.models import gp as gp_mod
    from cornell_moe_tpu.models import mcmc as mcmc_mod
    from cornell_moe_tpu.ops import optimizers
    from cornell_moe_tpu.ops.domains import TensorProductDomain
    from cornell_moe_tpu.utils import hesbo
    from cornell_moe_tpu.utils import synthetic_functions as sf

    dtype = jnp.float32
    rng = np.random.default_rng(0)
    scale = 4 if small else 1

    def fit(x, y, hypers, noise=1e-3, derivs=()):
        nch = 1 + len(derivs)
        return gp_mod.fit_gp(
            cov_mod.make_covariance("matern_2.5",
                                    np.asarray(hypers, np.float32)),
            jnp.asarray([noise] * nch, dtype), jnp.asarray(x, dtype),
            jnp.asarray(y, dtype), derivatives=derivs)

    # ---- config 1: analytic EI on Branin, fixed hypers, 1 suggestion ----
    f = sf.Branin()
    n_obs = 40
    x = rng.random((n_obs, 2)) * [15, 20] + [0, -5]
    y = np.array([f.evaluate_true(p)[0] for p in x])
    y_std = (y - y.mean()) / y.std()
    state = fit(x / [15, 20] + [0, 0.25], y_std[:, None], [1.0, 0.3, 0.3])
    dom = TensorProductDomain.from_bounds(
        np.array([[0, 1], [0, 1]], dtype=np.float32))
    params = optimizers.GradientDescentParameters(
        num_multistarts=600 // scale, max_num_steps=500 // scale,
        max_num_restarts=4, gamma=0.6, pre_mult=1.0)

    def ei_suggest(key):
        return ei_mod.multistart_expected_improvement_optimization(
            key, state, dom, 1, params)

    secs, _ = _timeit(jax.jit(ei_suggest), jax.random.PRNGKey(0))
    _report("analytic EI suggest (Branin, 600 multistarts x 500 steps)",
            secs)

    # ---- config 2: q-EI batch=4 MC on Hartmann6 ------------------------
    f6 = sf.Hartmann6()
    x6 = rng.random((60, 6))
    y6 = np.array([f6.evaluate_true(p)[0] for p in x6])
    state6 = fit(x6, ((y6 - y6.mean()) / y6.std())[:, None],
                 [1.0] + [0.4] * 6)
    dom6 = TensorProductDomain.from_bounds(
        np.repeat([[0.0, 1.0]], 6, axis=0).astype(np.float32))
    params_qei = optimizers.GradientDescentParameters(
        num_multistarts=200 // scale, max_num_steps=500 // scale,
        max_num_restarts=4, num_steps_averaged=100 // scale, gamma=0.6,
        pre_mult=1.0)

    def qei_suggest(key):
        return ei_mod.multistart_expected_improvement_optimization(
            key, state6, dom6, 4, params_qei,
            num_mc_iterations=2**10)

    secs, _ = _timeit(jax.jit(qei_suggest), jax.random.PRNGKey(1))
    _report("q-EI suggest (Hartmann6, q=4, 1024 MC, 200 multistarts)",
            secs)

    # ---- config 3: q-KG batch=2, noisy 1-d, MCMC-averaged --------------
    n1, S = 30, 8
    x1 = np.sort(rng.random(n1) * 4 - 2)[:, None]
    y1 = np.sin(2 * x1[:, 0]) + 0.3 * rng.standard_normal(n1)
    hypers = np.stack([0.8 + 0.8 * rng.random(S),
                       0.3 + 0.5 * rng.random(S)], axis=1)
    states = mcmc_mod.fit_gp_ensemble(
        "matern_2.5", jnp.asarray(hypers, dtype),
        jnp.full((S, 1), 0.09, dtype), jnp.asarray(x1, dtype),
        jnp.asarray(y1, dtype)[:, None])
    dom1 = TensorProductDomain.from_bounds(
        np.array([[-2.0, 2.0]], dtype=np.float32))
    inner = optimizers.GradientDescentParameters(
        num_multistarts=1, max_num_steps=6, max_num_restarts=1,
        num_steps_averaged=3, gamma=0.0, pre_mult=1.0,
        max_relative_change=0.1)
    outer = optimizers.GradientDescentParameters(
        num_multistarts=200 // scale, max_num_steps=50 // scale,
        max_num_restarts=2, num_steps_averaged=4, gamma=0.7,
        pre_mult=1.0, max_relative_change=0.5)
    discrete = jnp.asarray(rng.uniform(-2, 2, (S, 11, 1)), dtype)
    bsf = jnp.full((S,), float(y1.min()), dtype)
    normals = ei_mod.draw_antithetic_normals(jax.random.PRNGKey(2), 2**7,
                                             2, dtype=dtype)
    from cornell_moe_tpu.ops.domains import RepeatedDomain
    rep = RepeatedDomain(domain=dom1, num_repeats=2)

    def qkg_suggest(starts):
        def bvg(pts):
            return kg_mod.knowledge_gradient_mcmc_batch_value_and_grad(
                states, pts, discrete, normals, dom1, inner, bsf, 2)
        res = optimizers.multistart_optimize_batched(
            bvg, rep, starts, outer, chunk_size=25 if not small else None)
        return res.best_point

    starts = rep.generate_latin_hypercube_points(
        jax.random.PRNGKey(3), outer.num_multistarts).astype(dtype)
    secs, _ = _timeit(jax.jit(qkg_suggest), starts)
    _report("q-KG suggest (noisy 1-d, q=2, 8 hypers, 128 MC)", secs)

    # ---- config 4: d-KG with derivative observations -------------------
    fd = sf.BraninWithDerivatives()
    nd = 20
    xd = rng.random((nd, 2))
    vals = np.stack([fd.evaluate_true(p * [15, 20] + [0, -5]) for p in xd])
    scale_y = vals[:, 0].std()
    yd = np.column_stack([(vals[:, 0] - vals[:, 0].mean()) / scale_y,
                          vals[:, 1] / scale_y * 15,
                          vals[:, 2] / scale_y * 20])
    state_d = fit(xd, yd, [1.0, 0.3, 0.3], derivs=(0, 1))
    dom_d = TensorProductDomain.from_bounds(
        np.array([[0, 1], [0, 1]], dtype=np.float32))
    discrete_d = jnp.asarray(rng.random((11, 2)), dtype)
    normals_d = ei_mod.draw_antithetic_normals(jax.random.PRNGKey(4),
                                               2**7, 2, dtype=dtype)

    def dkg_value_grad(pts):
        return kg_mod.knowledge_gradient_value_and_grad(
            state_d, pts, None, discrete_d, normals_d, dom_d, inner,
            float(yd[:, 0].min()))

    pts0 = jnp.asarray(rng.random((2, 2)), dtype)
    secs, _ = _timeit(jax.jit(dkg_value_grad), pts0)
    _report("d-KG value+grad (Branin grads observed, q=2, 128 MC)", secs)

    # ---- config 4b: d-KG SUGGEST at the 500-obs bench shape -------------
    # The flagship derivative-observation configuration at the north-star
    # size (VERDICT r4 item 1): the full production warm+gated multistart
    # suggest with both Branin partials observed (N_ch = 3 x 504), the
    # same solver and shapes as bench.py's plain q-KG line, so the
    # vs_plain_qkg ratio reads off the derivative channels' true cost.
    if not small:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from profile_mfu import build_bench_problem
        pb = build_bench_problem(gp_derivatives=(0, 1))
        ds_b = (0, 1)
        normals_dkg = ei_mod.draw_antithetic_normals(
            jax.random.PRNGKey(0), pb["normals"].shape[0],
            pb["q"] * (1 + len(ds_b)), dtype=pb["normals"].dtype)

        def dkg_bvg_cold(st, pts_batch):
            return kg_mod.knowledge_gradient_mcmc_batch_vg_carry(
                st, pts_batch, pb["discrete"], normals_dkg, pb["domain"],
                pb["inner_cold"], pb["best_so_far"], pb["q"],
                derivatives_to_sample=ds_b)

        def dkg_bvg_warm(st, pts_batch, carry):
            return kg_mod.knowledge_gradient_mcmc_batch_vg_carry(
                st, pts_batch, pb["discrete"], normals_dkg, pb["domain"],
                pb["inner_warm"], pb["best_so_far"], pb["q"],
                derivatives_to_sample=ds_b, inner_x0=carry,
                warm_mode="reseed")

        def dkg_suggest(st, starts):
            res = optimizers.multistart_optimize_batched_warm(
                lambda b: dkg_bvg_cold(st, b),
                lambda b, c: dkg_bvg_warm(st, b, c),
                pb["rep"], starts, pb["outer_params"],
                chunk_size=25, conv_tol=3e-3)
            return res.best_point

        secs, _ = _timeit(jax.jit(dkg_suggest), pb["states"],
                          pb["starts"])
        _report("d-KG suggest (500 obs, both partials observed, q=4, "
                "16 hypers, 200 multistarts, 128 MC)", secs)

    # ---- config 5: continuous-fidelity KG + HeSBO ----------------------
    ff = sf.BraninFidelity()
    proj = hesbo.Projection(2, sf.Hartmann6(), seed=0)   # HeSBO embedding
    nf = 25
    xf = rng.random((nf, 3)) * [1, 1, 0.95] + [0, 0, 0.05]
    yf = np.array([ff.evaluate_true(p * [15, 20, 1] + [0, -5, 0])[0]
                   for p in xf])
    state_f = fit(xf, ((yf - yf.mean()) / yf.std())[:, None],
                  [1.0, 0.3, 0.3, 0.5])
    dom_f = TensorProductDomain.from_bounds(
        np.array([[0, 1], [0, 1], [0.05, 1]], dtype=np.float32))
    inner_dom_f = TensorProductDomain(bounds=dom_f.bounds[:2])
    discrete_f = jnp.asarray(rng.random((11, 2)), dtype)
    normals_f = ei_mod.draw_antithetic_normals(jax.random.PRNGKey(5),
                                               2**7, 2, dtype=dtype)

    def fkg_value_grad(pts):
        def f_kg(p):
            return kg_mod.knowledge_gradient(
                state_f, p, discrete_f, normals_f, inner_dom_f, inner,
                float(yf.min()), num_fidelity=1) / \
                kg_mod.fidelity_cost(p, 2, 1)
        return jax.value_and_grad(f_kg)(pts)

    ptsf = jnp.asarray(rng.random((2, 3)) * [1, 1, 0.9] + [0, 0, 0.1],
                       dtype)
    secs, _ = _timeit(jax.jit(fkg_value_grad), ptsf)
    _report("cf-KG value+grad (1 fidelity dim, q=2, 128 MC)", secs,
            {"hesbo_embedding_dim": proj._dim})

    # ---- config 6: PES at the reference scale --------------------------
    # Reference: Hartmann6, M=100 hyper sets, 1000 random features,
    # 113.08 s per suggest (pes/README.md:46).  Suggest = per-hyper-set
    # (x* draw + EP conditioning) + marginalized-acquisition grid + SGA
    # polish, given sampled hyperparameters (their sampling is the
    # reference's separate 73.92 s "retrain" phase).
    from cornell_moe_tpu.acquisition import pes as pes_mod
    from cornell_moe_tpu.acquisition import pes_driver

    h6 = sf.Hartmann6()
    n_pes = 60
    m_sets = 100 // (scale if small else 1)
    xp = rng.random((n_pes, 6))
    yp = np.array([h6.evaluate_true(p)[0] for p in xp])
    xpj = jnp.asarray(xp, jnp.float64 if jax.config.jax_enable_x64
                      else dtype)
    ypj = jnp.asarray(yp, xpj.dtype)
    dom6 = TensorProductDomain.from_bounds(
        np.array([[0.0, 1.0]] * 6, dtype=np.float32))
    sig_s = jnp.asarray(np.abs(rng.standard_normal(m_sets)) + 1.0,
                        xpj.dtype)
    len_s = jnp.asarray(0.3 + 0.4 * rng.random((m_sets, 6)), xpj.dtype)
    noise_s = jnp.full((m_sets,), 1e-3, xpj.dtype)
    grid6 = dom6.generate_latin_hypercube_points(
        jax.random.PRNGKey(11), 500).astype(xpj.dtype)
    pes_params = optimizers.GradientDescentParameters(
        num_multistarts=1, max_num_steps=60, max_num_restarts=2,
        gamma=0.7, pre_mult=0.1, max_relative_change=0.5)

    def pes_suggest(key):
        def per_set(k, nz, ls, sg):
            x_min, hess = pes_driver.sample_minimum_with_hessian(
                k, xpj, ypj, sg, ls, nz, dom6, grid6)
            return pes_mod.make_pes_state(xpj, ypj, x_min, hess, sg, ls,
                                          nz)

        keys = jax.random.split(key, m_sets)
        states = jax.vmap(per_set)(keys, noise_s, len_s, sig_s)

        def acq(p):
            return pes_mod.pes_acquisition_multi(p, states, xpj)

        grid_vals = jax.vmap(acq)(grid6)
        x0 = grid6[jnp.argmax(grid_vals)]
        x_opt = optimizers.gradient_ascent(
            jax.value_and_grad(acq), dom6, x0, pes_params)
        return jnp.where(acq(x_opt) > grid_vals.max(), x_opt, x0)

    secs, _ = _timeit(jax.jit(pes_suggest), jax.random.PRNGKey(12))
    _report(f"PES suggest (Hartmann6, 60 obs, M={m_sets} hyper sets, "
            "1000 features, grid 500 + SGA)", secs,
            {"vs_reference_113.08s": round(113.08 / secs, 2)})

    # ---- config 7: PES retrain + recommend at the reference scale ------
    # Reference retrain = per-iteration GPy MCMC hyperparameter sampling
    # of M=100 sets, 73.92 s (pes/README.md:48); here the on-device
    # stretch-move chain over log-(amp, lengths, noise) via
    # pes_driver.sample_hypers (burnin 50 + M draws, run_PES parity).
    def pes_retrain(key):
        return pes_driver.sample_hypers(key, xpj, ypj, m_sets, burnin=50)

    secs, _ = _timeit(jax.jit(pes_retrain), jax.random.PRNGKey(13))
    _report(f"PES retrain (Hartmann6, 60 obs, M={m_sets} hyper sets, "
            "stretch-move burnin 50)", secs,
            {"vs_reference_73.92s": round(73.92 / secs, 2)})

    # Reference recommend = argmin of the hyper-averaged posterior mean,
    # 3.63 s (pes/README.md:50); here the run_PES recommendation step:
    # 500-point grid seed + SGA polish of the M-set-averaged mean.
    # Time only the recommend phase: fix the hyper sets outside the jit.
    noise_s3, len_s3, sig_s3 = jax.jit(pes_retrain)(jax.random.PRNGKey(14))

    def pes_recommend_fixed():
        def neg_post_mean(p):
            def one(nz, ls, sg):
                cov = cov_mod.SquareExponential(
                    hyperparameters=jnp.concatenate([sg[None], ls]))
                st = gp_mod.fit_gp(cov, nz[None], xpj, ypj[:, None])
                return gp_mod.posterior_mean(st, p[None])[0, 0]
            return -jnp.mean(jax.vmap(one)(noise_s3, len_s3, sig_s3))

        grid_pm = jax.vmap(neg_post_mean)(grid6)
        p0 = grid6[jnp.argmax(grid_pm)]
        p_opt = optimizers.gradient_ascent(
            jax.value_and_grad(neg_post_mean), dom6, p0, pes_params)
        return jnp.where(neg_post_mean(p_opt) > grid_pm.max(), p_opt, p0)

    secs, _ = _timeit(jax.jit(pes_recommend_fixed))
    _report(f"PES recommend (Hartmann6, 60 obs, M={m_sets} hyper-set "
            "averaged posterior-mean argmin, grid 500 + SGA)", secs,
            {"vs_reference_3.63s": round(3.63 / secs, 2)})

    # ---- config 8: q-KG at the reference transcript's exact shape ------
    # Reference: Branin, q=4, 16 MCMC-averaged hyper sets, ~12 obs, 200
    # multistarts, 2^7 MC — 100.08 s (README.md:211).  Same production
    # warm-started solver as bench.py, just at the transcript's tiny
    # observation count instead of the 500-obs north-star shape.
    n_b, s_b, q_b = 12, 16, 4
    xb = rng.random((n_b, 2))
    yb = np.array([sf.Branin().evaluate_true(
        p * [15, 20] + [0, -5])[0] for p in xb])
    yb = (yb - yb.mean()) / yb.std()
    hyp_b = np.stack([0.5 + 1.5 * rng.random(s_b),
                      0.2 + 0.4 * rng.random(s_b),
                      0.2 + 0.4 * rng.random(s_b)], axis=1)
    states_b = mcmc_mod.fit_gp_ensemble(
        "matern_2.5", jnp.asarray(hyp_b, dtype),
        jnp.full((s_b, 1), 1e-2, dtype), jnp.asarray(xb, dtype),
        jnp.asarray(yb, dtype)[:, None], jitter=1e-5)
    dom_b = TensorProductDomain.from_bounds(
        np.array([[0.0, 1.0], [0.0, 1.0]], dtype=np.float32))
    rep_b = RepeatedDomain(domain=dom_b, num_repeats=q_b)
    outer_b = optimizers.GradientDescentParameters(
        num_multistarts=200 // scale, max_num_steps=30 // scale,
        max_num_restarts=1, num_steps_averaged=4, gamma=0.7,
        pre_mult=1.0, max_relative_change=0.5)
    inner_cold_b = optimizers.GradientDescentParameters(
        num_multistarts=1, max_num_steps=6, max_num_restarts=1,
        num_steps_averaged=3, gamma=0.0, pre_mult=1.0,
        max_relative_change=0.1)
    inner_warm_b = optimizers.GradientDescentParameters(
        num_multistarts=1, max_num_steps=1, max_num_restarts=1,
        num_steps_averaged=0, gamma=0.0, pre_mult=1.0,
        max_relative_change=0.1)
    disc_b = jnp.asarray(rng.random((s_b, 11, 2)), dtype)
    bsf_b = jnp.full((s_b,), float(yb.min()), dtype)
    normals_b = ei_mod.draw_antithetic_normals(
        jax.random.PRNGKey(6), 2**7, q_b, dtype=dtype)

    def bvg_cold_b(pts):
        return kg_mod.knowledge_gradient_mcmc_batch_vg_carry(
            states_b, pts, disc_b, normals_b, dom_b, inner_cold_b,
            bsf_b, q_b)

    def bvg_warm_b(pts, carry):
        return kg_mod.knowledge_gradient_mcmc_batch_vg_carry(
            states_b, pts, disc_b, normals_b, dom_b, inner_warm_b,
            bsf_b, q_b, inner_x0=carry, warm_mode="reseed")

    def qkg_ref_suggest(starts):
        # production solver settings: warm reseed + the 3e-3 step-norm
        # convergence gate (the bench.py / driver defaults)
        res = optimizers.multistart_optimize_batched_warm(
            bvg_cold_b, bvg_warm_b, rep_b, starts, outer_b,
            chunk_size=25 if not small else None, conv_tol=3e-3)
        return res.best_point

    starts_b = rep_b.generate_latin_hypercube_points(
        jax.random.PRNGKey(7), outer_b.num_multistarts).astype(dtype)
    secs, _ = _timeit(jax.jit(qkg_ref_suggest), starts_b)
    _report("q-KG suggest at the reference transcript shape (Branin, "
            "q=4, 12 obs, 16 hypers, 200 multistarts, 128 MC)", secs,
            {"vs_reference_100.08s": round(100.08 / secs, 2)})

    # ---- config 9: full BayesianOptimizer iteration, transcript shape ---
    # The end-to-end per-iteration wall-clock of the production driver
    # (suggest + observe/retrain + recommend) at the reference
    # transcript's configuration: Branin, q=4, 12 init points, 16-walker
    # MCMC ensemble, chain 1000 / burn-in 2000, the reference's 2x50
    # outer GD schedule (examples/main.py:132-140).  The reference pays
    # 100.08 + 5.53 + 1.67 = 107.28 s per iteration (README.md:211-220).
    # Iterations 0-1 compile the three jitted phase programs (shape
    # buckets 16 then 32); iterations 2-3 are the steady state.
    from cornell_moe_tpu import bayes_opt as bo_mod
    bo = bo_mod.BayesianOptimizer(
        objective_func=sf.Branin(), method="KG", num_to_sample=4,
        n_hypers=16, chain_length=1000 // scale,
        burnin_steps=2000 // scale, noisy=False, verbose=False, seed=0)
    t0 = time.time()
    bo.initialize(num_init_pts=12)
    init_s = time.time() - t0

    def one_iteration():
        pts, _ = bo.suggest()
        bo.observe(pts)
        bo.recommend()

    iter_times = []
    for _ in range(4 if not small else 2):
        t0 = time.time()
        one_iteration()
        iter_times.append(round(time.time() - t0, 4))
    _report("full BO iteration, production driver (Branin q=4 KG, 16 "
            "hypers, chain 1000, 2x50-step outer GD)",
            min(iter_times[2:]) if not small else iter_times[-1],
            {"vs_reference_107.28s":
             round(107.28 / min(iter_times[2:]), 2) if not small else None,
             "per_iteration_s": iter_times,
             "initial_train_s": round(init_s, 1)})

    print(f"# device: {jax.devices()[0].platform}", file=sys.stderr)


if __name__ == "__main__":
    main(small="--small" in sys.argv)
