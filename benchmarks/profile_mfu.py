"""Hardware-utilization (MFU) and bottleneck accounting for the bench
programs on the real TPU chip.

SURVEY.md section 5 prescribes JAX-profiler/xprof evidence for the
rebuild; every prior artifact was wall-clock only.  This script measures,
for the production q-KG suggest (bench.py shapes) and the per-iteration
MCMC retrain:

  * XLA cost analysis (compiled.cost_analysis()): total FLOPs, bytes
    accessed, transcendentals — the compiler's own FLOP model, no manual
    counting;
  * achieved FLOP/s and HBM bytes/s against the chip's peaks, i.e. MFU
    and memory-bandwidth utilization;
  * a sub-phase wall-clock decomposition of the suggest (cold seeded
    chunk / warm gated steps / final scoring) so the dominant time sink
    is named rather than guessed;
  * optionally (--trace) an xprof/xplane capture under
    benchmarks/traces/ for offline inspection.

v5e single-chip peaks used for the ratios (public spec):
  bf16 matmul     197 TFLOP/s
  f32 (HIGHEST)   ~32.8 TFLOP/s   (6-pass bf16 emulation on the MXU;
                                   covariance-path dots pin HIGHEST)
  HBM bandwidth   819 GB/s

Run:  python benchmarks/profile_mfu.py [--trace]
Writes benchmarks/MFU_r04.json and prints one JSON line per program.
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


def build_bench_problem():
    """The exact bench.py problem (500 obs, 16 hypers, q=4, 128 MC)."""
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


def profile_suggest(p, results):
    import jax

    from cornell_moe_tpu.acquisition import knowledge_gradient as kg_mod
    from cornell_moe_tpu.ops import optimizers

    states, q = p["states"], p["q"]
    domain, rep = p["domain"], p["rep"]
    chunk, conv_tol = 25, 3e-3

    def bvg_cold(pts_batch):
        return kg_mod.knowledge_gradient_mcmc_batch_vg_carry(
            states, pts_batch, p["discrete"], p["normals"], domain,
            p["inner_cold"], p["best_so_far"], q)

    def bvg_warm(pts_batch, carry):
        return kg_mod.knowledge_gradient_mcmc_batch_vg_carry(
            states, pts_batch, p["discrete"], p["normals"], domain,
            p["inner_warm"], p["best_so_far"], q, inner_x0=carry,
            warm_mode="reseed")

    def suggest(starts):
        res = optimizers.multistart_optimize_batched_warm(
            bvg_cold, bvg_warm, rep, starts, p["outer_params"],
            chunk_size=chunk, conv_tol=conv_tol)
        return res.best_point, res.best_value

    lowered = jax.jit(suggest).lower(p["starts"])
    compiled = lowered.compile()
    wall, out = timeit(compiled, p["starts"])
    ca = cost(compiled)
    entry = {
        "program": "qKG suggest (bench.py: 500 obs, 16 hypers, q=4, "
                   "200 starts, 128 MC, warm+gated)",
        "wall_s": round(wall, 4),
        "xla_flops": ca["flops"],
        "xla_bytes": ca["bytes"],
        "achieved_tflops": round(ca["flops"] / wall / 1e12, 3),
        "achieved_gbps": round(ca["bytes"] / wall / 1e9, 2),
        "mfu_vs_bf16_peak": round(ca["flops"] / wall / PEAK_BF16, 4),
        "mfu_vs_f32_highest": round(
            ca["flops"] / wall / PEAK_F32_HIGHEST, 4),
        "hbm_bw_util": round(ca["bytes"] / wall / PEAK_HBM, 4),
    }
    print(json.dumps(entry), flush=True)
    results["suggest"] = entry

    # --- sub-phase decomposition ----------------------------------------
    # (a) one cold (6-step-seeded) chunk evaluation — runs twice per
    #     chunk (carry init + final scoring);
    # (b) one warm gated step (1-step inner descents) — runs a data-
    #     dependent number of times per chunk until the gate fires;
    # (c) the fused Pallas descent kernel alone, cold depth.
    chunk_starts = p["starts"][:chunk]
    cold_jit = jax.jit(bvg_cold)
    t_cold, cold_out = timeit(cold_jit, chunk_starts)
    carry = cold_out[2]
    warm_jit = jax.jit(bvg_warm)
    t_warm, _ = timeit(warm_jit, chunk_starts, carry)
    cold_ca = cost(jax.jit(bvg_cold).lower(chunk_starts).compile())
    warm_ca = cost(
        jax.jit(bvg_warm).lower(chunk_starts, carry).compile())
    n_chunks = p["outer_params"].num_multistarts // chunk
    # implied gated warm-step count per chunk from the whole-program wall
    implied = (wall - 2 * n_chunks * t_cold) / max(t_warm, 1e-9) / n_chunks
    phases = {
        "cold_chunk_eval_s": round(t_cold, 4),
        "cold_chunk_flops": cold_ca["flops"],
        "cold_chunk_bytes": cold_ca["bytes"],
        "cold_achieved_tflops": round(cold_ca["flops"] / t_cold / 1e12, 3),
        "cold_hbm_gbps": round(cold_ca["bytes"] / t_cold / 1e9, 2),
        "warm_step_eval_s": round(t_warm, 4),
        "warm_step_flops": warm_ca["flops"],
        "warm_step_bytes": warm_ca["bytes"],
        "warm_achieved_tflops": round(warm_ca["flops"] / t_warm / 1e12, 3),
        "warm_hbm_gbps": round(warm_ca["bytes"] / t_warm / 1e9, 2),
        "n_chunks": n_chunks,
        "implied_warm_steps_per_chunk": round(implied, 2),
    }
    print(json.dumps({"suggest_phases": phases}), flush=True)
    results["suggest_phases"] = phases


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

    # cost of the chain program itself (the retrain's device work)
    chain = model._chain_fn()
    x, y, pn = model._padded_data()
    compiled = chain.lower(jax.random.PRNGKey(0), model.p0, x, y, pn,
                           num_steps=1000).compile()
    t_chain, _ = timeit(compiled, jax.random.PRNGKey(0), model.p0, x, y,
                        pn, reps=2)
    ca = cost(compiled)
    entry = {
        "program": "MCMC retrain chain (500 obs padded, 16 walkers, "
                   "1000 stretch-move steps, fused Pallas LML)",
        "wall_s": round(t_chain, 4),
        "retrain_total_s": round(retrain_wall, 4),
        "xla_flops": ca["flops"],
        "xla_bytes": ca["bytes"],
        "achieved_tflops": round(ca["flops"] / t_chain / 1e12, 3),
        "achieved_gbps": round(ca["bytes"] / t_chain / 1e9, 2),
        "mfu_vs_bf16_peak": round(ca["flops"] / t_chain / PEAK_BF16, 4),
        "mfu_vs_f32_highest": round(
            ca["flops"] / t_chain / PEAK_F32_HIGHEST, 4),
        "hbm_bw_util": round(ca["bytes"] / t_chain / PEAK_HBM, 4),
        "per_step_ms": round(t_chain, 4),
    }
    entry["per_step_ms"] = round(t_chain / 1000 * 1e3, 4)
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

    out_path = os.path.join(os.path.dirname(__file__), "MFU_r04.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"# wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
