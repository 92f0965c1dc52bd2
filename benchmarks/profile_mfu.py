"""Hardware-utilization (MFU) and bottleneck accounting for the bench
programs on the real TPU chip.

SURVEY.md section 5 prescribes JAX-profiler/xprof evidence for the
rebuild; every prior artifact was wall-clock only.  This script measures,
for the production q-KG suggest (bench.py shapes) and the per-iteration
MCMC retrain:

  * FLOPs = XLA cost analysis of the per-chunk objective programs
    MULTIPLIED by measured loop trip counts.  cost_analysis() counts
    every loop body exactly once (verified here: the whole gated
    suggest reports 27.7 GFLOPs while ONE of its >= 16 chunk
    evaluations reports 11 GFLOPs), so whole-program numbers are
    meaningless for looped programs; multistart_optimize_batched_warm
    (return_stats=True) surfaces the executed warm-step counts the
    model needs.  Remaining known undercount: the 6-step inner-descent
    scan inside each cold evaluation is itself counted body-once —
    bounded small by the <= 3% wall difference between the 6-step and
    1-step inner programs;
  * achieved FLOP/s and HBM bytes/s against the chip's peaks, i.e. MFU
    and memory-bandwidth utilization;
  * a decomposition into sequential estimator evaluations (the latency
    structure) so the dominant time sink is named rather than guessed;
  * optionally (--trace) an xprof/xplane capture under
    benchmarks/traces/ for offline inspection.

v5e single-chip peaks used for the ratios (public spec):
  bf16 matmul     197 TFLOP/s
  f32 (HIGHEST)   ~32.8 TFLOP/s   (6-pass bf16 emulation on the MXU;
                                   covariance-path dots pin HIGHEST)
  HBM bandwidth   819 GB/s

Run:  python benchmarks/profile_mfu.py [--trace]
Writes benchmarks/MFU_r05.json and prints one JSON line per program.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

PEAK_BF16 = 197e12
PEAK_F32_HIGHEST = PEAK_BF16 / 6.0
PEAK_HBM = 819e9


def timeit(fn, *args, reps=5):
    import jax
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.time() - t0)
    return float(min(ts)), out


def cost(compiled):
    """Normalize compiled.cost_analysis() across JAX versions."""
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return {
        "flops": float(ca.get("flops", float("nan"))),
        "bytes": float(ca.get("bytes accessed", float("nan"))),
        "transcendentals": float(ca.get("transcendentals", 0.0)),
    }


def build_bench_problem(gp_derivatives=()):
    """The exact bench.py problem (500 obs, 16 hypers, q=4, 128 MC).

    ``gp_derivatives``: observed-derivative channels of the GP itself —
    the d-KG configuration couples the fantasy channels to the GP's
    observed channels (the reference passes the GP's derivative list
    into the KG state, gpp_python_knowledge_gradient_mcmc.cpp:120), so
    the d-KG profile fits a GP on value + gradient observations
    (N_ch = 500 * (1 + len(gp_derivatives)) kernel rows).
    """
    import jax
    import jax.numpy as jnp

    from cornell_moe_tpu.acquisition.expected_improvement import (
        draw_antithetic_normals)
    from cornell_moe_tpu.models import mcmc as mcmc_mod
    from cornell_moe_tpu.ops import optimizers
    from cornell_moe_tpu.ops.domains import (RepeatedDomain,
                                             TensorProductDomain)

    dtype = jnp.float32
    rng = np.random.default_rng(0)
    num_obs, dim, n_ensemble = 500, 2, 16
    q, num_mc, n_discrete = 4, 2**7, 11
    bounds = np.array([[0.0, 1.0], [0.0, 1.0]])
    x = rng.random((num_obs, dim))

    def branin_vg(u):
        p0 = u[:, 0] * 15.0
        p1 = u[:, 1] * 20.0 - 5.0
        a, b = 1.0, 5.1 / (4 * np.pi**2)
        c, r, s, t = 5.0 / np.pi, 6.0, 10.0, 1.0 / (8 * np.pi)
        inner = p1 - b * p0**2 + c * p0 - r
        f = a * inner**2 + s * (1 - t) * np.cos(p0) + s
        g0 = (2 * a * inner * (c - 2 * b * p0)
              - s * (1 - t) * np.sin(p0)) * 15.0
        g1 = 2 * a * inner * 20.0
        return f, g0, g1

    f, g0, g1 = branin_vg(x)
    mu, sd = f.mean(), f.std()
    y = (f - mu) / sd + 0.01 * rng.standard_normal(num_obs)
    gd = tuple(int(i) for i in gp_derivatives)
    if gd:
        grads = {0: g0 / sd, 1: g1 / sd}
        y_cols = [y] + [grads[i] + 0.01 * rng.standard_normal(num_obs)
                        for i in gd]
        y_fit = np.stack(y_cols, axis=1)
    else:
        y_fit = y[:, None]
    hypers = np.stack([0.5 + 1.5 * rng.random(n_ensemble),
                       0.2 + 0.4 * rng.random(n_ensemble),
                       0.2 + 0.4 * rng.random(n_ensemble)], axis=1)
    noises = np.full((n_ensemble, 1 + len(gd)), 1e-2)
    states = mcmc_mod.fit_gp_ensemble(
        "matern_2.5", jnp.asarray(hypers, dtype),
        jnp.asarray(noises, dtype), jnp.asarray(x, dtype),
        jnp.asarray(y_fit, dtype), derivatives=gd, jitter=1e-5)
    jax.block_until_ready(states.chol_K)

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
    return dict(states=states, domain=domain, rep=rep,
                outer_params=outer_params, inner_cold=inner_cold,
                inner_warm=inner_warm, discrete=discrete,
                best_so_far=best_so_far, normals=normals, starts=starts,
                q=q, x=x, y=y, num_obs=num_obs, dim=dim,
                n_ensemble=n_ensemble)


def _profile_one_suggest(p, tag, derivatives_to_sample=()):
    """Trip-count-corrected FLOP/MFU profile of one warm+gated suggest.

    FLOP model: the whole suggest executes, sequentially,
      n_chunks x (1 cold carry-init + W_c gated warm steps + 1 cold
      final scoring)
    chunk evaluations; per-evaluation FLOPs/bytes come from XLA cost
    analysis of the standalone chunk programs, executed counts W_c from
    multistart_optimize_batched_warm(return_stats=True).
    """
    import jax

    from cornell_moe_tpu.acquisition import knowledge_gradient as kg_mod
    from cornell_moe_tpu.acquisition.expected_improvement import (
        draw_antithetic_normals)
    from cornell_moe_tpu.ops import optimizers

    states, q = p["states"], p["q"]
    domain, rep = p["domain"], p["rep"]
    chunk, conv_tol = 25, 3e-3
    ds = tuple(derivatives_to_sample)
    if ds:
        normals = draw_antithetic_normals(
            jax.random.PRNGKey(0), p["normals"].shape[0],
            q * (1 + len(ds)), dtype=p["normals"].dtype)
    else:
        normals = p["normals"]

    # The GP state enters as a jit ARGUMENT, not a closure constant: the
    # d-KG ensemble Cholesky (16 x 1504 x 1504 f32 ~= 144 MB) baked into
    # the program exceeds the remote-compile tunnel's request-size limit
    # (HTTP 413), and big closure constants also carry a per-dispatch
    # cost (CLAUDE.md).  The production driver passes state as an
    # argument for the same reason.
    def bvg_cold(st, pts_batch):
        return kg_mod.knowledge_gradient_mcmc_batch_vg_carry(
            st, pts_batch, p["discrete"], normals, domain,
            p["inner_cold"], p["best_so_far"], q,
            derivatives_to_sample=ds)

    def bvg_warm(st, pts_batch, carry):
        return kg_mod.knowledge_gradient_mcmc_batch_vg_carry(
            st, pts_batch, p["discrete"], normals, domain,
            p["inner_warm"], p["best_so_far"], q,
            derivatives_to_sample=ds, inner_x0=carry,
            warm_mode="reseed")

    def suggest(st, starts):
        res, warm_steps = optimizers.multistart_optimize_batched_warm(
            lambda b: bvg_cold(st, b), lambda b, c: bvg_warm(st, b, c),
            rep, starts, p["outer_params"],
            chunk_size=chunk, conv_tol=conv_tol, return_stats=True)
        return res.best_point, res.best_value, warm_steps

    compiled = jax.jit(suggest).lower(states, p["starts"]).compile()
    wall, out = timeit(compiled, states, p["starts"])
    warm_steps = np.asarray(out[2]).reshape(-1)
    n_chunks = p["outer_params"].num_multistarts // chunk

    # per-evaluation device costs (standalone chunk programs)
    chunk_starts = p["starts"][:chunk]
    cold_c = jax.jit(bvg_cold).lower(states, chunk_starts).compile()
    carry = cold_c(states, chunk_starts)[2]
    warm_c = jax.jit(bvg_warm).lower(states, chunk_starts,
                                     carry).compile()
    cold_ca, warm_ca = cost(cold_c), cost(warm_c)
    n_cold = 2 * n_chunks
    n_warm = int(warm_steps.sum())
    flops = n_cold * cold_ca["flops"] + n_warm * warm_ca["flops"]
    byts = n_cold * cold_ca["bytes"] + n_warm * warm_ca["bytes"]
    n_evals = n_cold + n_warm
    entry = {
        "program": f"{tag} suggest (bench.py: 500 obs, 16 hypers, q=4, "
                   "200 starts, 128 MC, warm+gated)"
                   + (f", derivative fantasy channels {ds}" if ds else ""),
        "wall_s": round(wall, 4),
        "sequential_estimator_evals": n_evals,
        "warm_steps_per_chunk": warm_steps.tolist(),
        "in_program_ms_per_eval": round(wall / n_evals * 1e3, 3),
        "model_flops": flops,
        "model_bytes": byts,
        "achieved_tflops": round(flops / wall / 1e12, 3),
        "achieved_gbps": round(byts / wall / 1e9, 2),
        "mfu_vs_bf16_peak": round(flops / wall / PEAK_BF16, 4),
        "mfu_vs_f32_highest": round(flops / wall / PEAK_F32_HIGHEST, 4),
        "hbm_bw_util": round(byts / wall / PEAK_HBM, 4),
        "per_eval_flops": cold_ca["flops"],
        "per_eval_bytes": cold_ca["bytes"],
        "whole_program_xla_flops_bodyonce": cost(compiled)["flops"],
    }
    print(json.dumps(entry), flush=True)
    return entry


def profile_suggest(p, results):
    results["suggest"] = _profile_one_suggest(p, "qKG")


def profile_suggest_dkg(results):
    """d-KG suggest at the bench shape (verdict item 3 done-criterion:
    500-obs d-KG suggest within ~2x of plain q-KG).

    Same solver as profile_suggest but the GP observes value + both
    gradient channels (1500 kernel rows) and the fantasy observations
    span the same channels (derivatives_to_sample=(0, 1)) — the
    reference's d-KG configuration
    (gpp_python_knowledge_gradient_mcmc.cpp:120 passes the GP's
    derivative list into the KG state).  Round 4 extended the reseed
    warm carry + chunk-wide conv gate to these channels.
    """
    p = build_bench_problem(gp_derivatives=(0, 1))
    entry = _profile_one_suggest(p, "dKG", derivatives_to_sample=(0, 1))
    if "suggest" in results:
        entry["vs_plain_qkg"] = round(
            entry["wall_s"] / results["suggest"]["wall_s"], 3)
        print(json.dumps({"dkg_vs_plain_qkg": entry["vs_plain_qkg"]}),
              flush=True)
    results["suggest_dkg"] = entry


def profile_retrain(p, results):
    import jax

    from cornell_moe_tpu.models.mcmc import GaussianProcessLogLikelihoodMCMC
    from cornell_moe_tpu.utils.data_containers import HistoricalData

    hist = HistoricalData(p["dim"])
    hist.append_historical_data(p["x"], p["y"][:, None],
                                np.full((p["num_obs"], 1), 1e-4))
    model = GaussianProcessLogLikelihoodMCMC(
        hist, chain_length=1000, burnin_steps=2000,
        n_hypers=p["n_ensemble"], noisy=True)
    model.train()                       # burn-in + compile
    t0 = time.time()
    model.train()
    retrain_wall = time.time() - t0

    # cost of the chain program itself (the retrain's device work).
    # XLA cost analysis reports ~0 FLOPs here — the fused LML Pallas
    # kernel is an opaque custom call and the 1000-step scan body is
    # counted once — so the FLOP model is analytic: each stretch-move
    # step proposes for all W walkers (both half-ensembles,
    # models/mcmc.py:95-127), and each log-posterior evaluation is
    # dominated by one (Np, Np) Cholesky:
    #   flops_lml ~= Np^3 / 3  (chol)  +  (dim + 10) Np^2
    #               (kernel-matrix build + triangular solve + logdet)
    chain = model._chain_fn()
    x, y, pn = model._padded_data()
    compiled = chain.lower(jax.random.PRNGKey(0), model.p0, x, y, pn,
                           num_steps=1000).compile()
    t_chain, _ = timeit(compiled, jax.random.PRNGKey(0), model.p0, x, y,
                        pn, reps=2)
    n_padded = x.shape[0]
    n_walkers = int(np.asarray(model.p0).shape[0])
    dim = x.shape[1]
    flops_lml = n_padded**3 / 3 + (dim + 10) * n_padded**2
    n_evals = n_walkers * (1000 + 1)     # +1: initial log-prob batch
    flops = n_evals * flops_lml
    # bytes: each eval streams the (Np, Np) kernel matrix ~3x
    # (build, factor, solve) in f32
    byts = n_evals * 3 * n_padded * n_padded * 4
    entry = {
        "program": f"MCMC retrain chain ({p['num_obs']} obs padded to "
                   f"{n_padded}, {n_walkers} walkers, 1000 stretch-move "
                   "steps, fused Pallas LML)",
        "wall_s": round(t_chain, 4),
        "retrain_total_s": round(retrain_wall, 4),
        "lml_evals": n_evals,
        "model_flops": flops,
        "model_bytes": byts,
        "achieved_tflops": round(flops / t_chain / 1e12, 3),
        "achieved_gbps": round(byts / t_chain / 1e9, 2),
        "mfu_vs_bf16_peak": round(flops / t_chain / PEAK_BF16, 4),
        "mfu_vs_f32_highest": round(
            flops / t_chain / PEAK_F32_HIGHEST, 4),
        "hbm_bw_util": round(byts / t_chain / PEAK_HBM, 4),
        "per_step_ms": round(t_chain / 1000 * 1e3, 4),
        "per_lml_eval_us": round(t_chain / n_evals * 1e6, 2),
    }
    print(json.dumps(entry), flush=True)
    results["retrain"] = entry


def main():
    import jax

    from cornell_moe_tpu.config import enable_compilation_cache
    enable_compilation_cache()

    trace = "--trace" in sys.argv
    results = {"device": jax.devices()[0].device_kind
               if hasattr(jax.devices()[0], "device_kind")
               else jax.devices()[0].platform,
               "peaks": {"bf16_tflops": PEAK_BF16 / 1e12,
                         "f32_highest_tflops": PEAK_F32_HIGHEST / 1e12,
                         "hbm_gbps": PEAK_HBM / 1e9}}
    p = build_bench_problem()
    profile_suggest(p, results)
    profile_suggest_dkg(results)
    profile_retrain(p, results)

    if trace:
        import jax

        from cornell_moe_tpu.acquisition import knowledge_gradient as kg_mod
        from cornell_moe_tpu.ops import optimizers
        trace_dir = os.path.join(os.path.dirname(__file__), "traces",
                                 "r04_suggest")
        os.makedirs(trace_dir, exist_ok=True)

        def bvg_cold(pts_batch):
            return kg_mod.knowledge_gradient_mcmc_batch_vg_carry(
                p["states"], pts_batch, p["discrete"], p["normals"],
                p["domain"], p["inner_cold"], p["best_so_far"], p["q"])

        def bvg_warm(pts_batch, carry):
            return kg_mod.knowledge_gradient_mcmc_batch_vg_carry(
                p["states"], pts_batch, p["discrete"], p["normals"],
                p["domain"], p["inner_warm"], p["best_so_far"], p["q"],
                inner_x0=carry, warm_mode="reseed")

        def suggest(starts):
            res = optimizers.multistart_optimize_batched_warm(
                bvg_cold, bvg_warm, p["rep"], starts, p["outer_params"],
                chunk_size=25, conv_tol=3e-3)
            return res.best_point, res.best_value

        fn = jax.jit(suggest)
        jax.block_until_ready(fn(p["starts"]))      # compile outside trace
        with jax.profiler.trace(trace_dir):
            jax.block_until_ready(fn(p["starts"]))
        results["trace_dir"] = trace_dir
        print(json.dumps({"trace_dir": trace_dir}), flush=True)

    out_path = os.path.join(os.path.dirname(__file__), "MFU_r05.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"# wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
