"""Sample-efficiency head-to-head: q-KG vs q-EI on Branin (q=4).

The reference's headline quality claim (README.md:261-277, Wu & Frazier
NeurIPS 2016) is that q-KG finds better points in fewer evaluations than
q-EI, especially for parallel suggestions.  This measures it with the
production driver: both methods run the same campaigns (same seeds, same
initial designs, 16-walker MCMC ensemble, chain 1000 / burn-in 2000,
q=4, 10 iterations) and we record the true value of the recommended
point after every iteration.

Writes one JSON line per (method, seed) campaign with the
recommendation-quality trajectory, then a summary line with the
mean final gap to the true minimum (0.397887).

Usage: python benchmarks/sample_efficiency.py [--small]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

TRUE_MIN = 0.397887


def main(small: bool = False):
    from cornell_moe_tpu import bayes_opt as bo_mod
    from cornell_moe_tpu.utils import synthetic_functions as sf

    seeds = [0, 1, 2] if not small else [0]
    iters = 10 if not small else 2
    problems = [("Branin", sf.Branin, False)]
    if not small:
        # the papers' claimed q-KG advantage regime: noisy observations
        # (sigma^2 = 0.25; EI's best-observed incumbent is corrupted,
        # KG optimizes the posterior mean directly)
        problems.append(("BraninNoisy", sf.BraninNoisy, True))
    for prob_name, prob_cls, noisy in problems:
        finals = {}
        for method in ("KG", "EI"):
            finals[method] = []
            for seed in seeds:
                bo = bo_mod.BayesianOptimizer(
                    objective_func=prob_cls(), method=method,
                    num_to_sample=4, n_hypers=16,
                    chain_length=1000 if not small else 100,
                    burnin_steps=2000 if not small else 200,
                    noisy=noisy, verbose=False, seed=seed)
                t0 = time.time()
                history = bo.run(num_iterations=iters, num_init_pts=12)
                traj = [round(h["true_value"], 6) for h in history]
                best_traj = list(np.minimum.accumulate(traj))
                finals[method].append(best_traj[-1])
                print(json.dumps({
                    "problem": prob_name, "method": method, "seed": seed,
                    "recommended_true_value_per_iteration": traj,
                    "best_so_far": best_traj,
                    "wall_s": round(time.time() - t0, 1)}), flush=True)
        summary = {
            "metric": f"mean final recommendation gap to true min, "
                      f"{iters} iterations x q=4 ({prob_name}, "
                      f"{len(seeds)} seeds)",
            "kg_gap": round(float(np.mean(finals["KG"])) - TRUE_MIN, 4),
            "ei_gap": round(float(np.mean(finals["EI"])) - TRUE_MIN, 4),
        }
        print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main(small="--small" in sys.argv)
