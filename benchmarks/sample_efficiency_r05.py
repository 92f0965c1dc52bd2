"""Round-5 sample-efficiency runs (VERDICT r4 items 2 and 9).

(b) BraninFidelity equal-capital: cf-KG (capital accounting, fidelity
    cost) vs full-fidelity q-KG on plain Branin — delegates to the
    round-4 harness (benchmarks/sample_efficiency_r04.py part b, now
    runnable end-to-end with the fit jitter in).

(c) Hartmann6WithDerivatives: the d-KG paper's WINNING regime
    (higher-dimensional + noisy + small budget — Wu et al. NeurIPS'17,
    cited at /root/reference/README.md:261-277): noisy 6-d Hartmann
    with all six partials observed, 12 LHC init + 8 iterations of q=4
    (44 evaluations), 5 seeds.  d-KG (fantasy spans derivative
    channels) vs value-fantasy KG vs q-EI on the SAME derivative-
    trained ensemble.

Collect stdout into benchmarks/SAMPLE_EFF_r05.json.

Usage: python benchmarks/sample_efficiency_r05.py [b|c] [--small]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

H6_TRUE_MIN = -3.32237


def run_part_c(small: bool, seeds=None):
    from cornell_moe_tpu import bayes_opt as bo_mod
    from cornell_moe_tpu.utils import synthetic_functions as sf

    if seeds is None:
        seeds = [0] if small else [0, 1, 2, 3, 4]
    iters = 2 if small else 8
    methods = [
        ("dKG", "KG", True),
        ("KG-value", "KG", False),
        ("EI", "EI", True),
    ]
    finals = {name: [] for name, _, _ in methods}
    trajs = {name: [] for name, _, _ in methods}
    for name, method, sample_derivs in methods:
        for seed in seeds:
            # standardize=True is REQUIRED: the 7-channel block system
            # (value + six partials) is unconditionable in f32 at raw
            # scale (see models/mcmc.py); shape_bucket=64 keeps every
            # iteration (12..44 obs) in ONE compiled-program family.
            bo = bo_mod.BayesianOptimizer(
                objective_func=sf.Hartmann6WithDerivatives(),
                method=method, num_to_sample=4, n_hypers=16,
                chain_length=1000, burnin_steps=2000,
                shape_bucket=64, noisy=True, standardize=True,
                verbose=False, seed=seed,
                kg_sample_derivatives=sample_derivs)
            t0 = time.time()
            history = bo.run(num_iterations=iters, num_init_pts=12)
            traj = [round(h["true_value"], 6) for h in history]
            best_traj = list(np.minimum.accumulate(traj))
            finals[name].append(best_traj[-1])
            trajs[name].append(best_traj)
            print(json.dumps({
                "problem": "Hartmann6WithDerivatives", "method": name,
                "seed": seed,
                "recommended_true_value_per_iteration": traj,
                "best_so_far": best_traj,
                "wall_s": round(time.time() - t0, 1)}), flush=True)
    summary = {
        "metric": f"final gap to true min, Hartmann6WithDerivatives "
                  f"(noisy, 6 partials observed), {iters} iters x q=4, "
                  f"{len(seeds)} seeds (mean +/- std over seeds)"}
    for name in finals:
        gaps = np.asarray(finals[name]) - H6_TRUE_MIN
        summary[name] = {
            "mean_gap": round(float(gaps.mean()), 5),
            "std_gap": round(float(gaps.std()), 5),
            "per_seed": [round(float(g), 5) for g in gaps],
        }
        curve = np.asarray(trajs[name]) - H6_TRUE_MIN
        summary[name]["mean_curve"] = [
            round(float(v), 5) for v in curve.mean(axis=0)]
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    small = "--small" in sys.argv
    part = next((a for a in sys.argv[1:] if a in ("b", "c")), None)
    seeds = None
    for a in sys.argv[1:]:
        if a.startswith("--seeds="):
            seeds = [int(s) for s in a.split("=", 1)[1].split(",")]
    if part in (None, "b"):
        import sample_efficiency_r04 as r04
        r04.run_part_b(small)
    if part in (None, "c"):
        run_part_c(small, seeds=seeds)
