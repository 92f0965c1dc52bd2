"""End-to-end d-KG campaign on the KISSGP hyperparameter objective.

Counterpart of the reference's second real-function workload
(/root/reference/examples/real_functions.py:161): minimize the negative
log marginal likelihood of a KISS-GP (SKI) model over its 3 log
hyperparameters.  The objective reports gradient observation channels
(the reference class declares derivative observations for all dims), so
this is the d-KG-with-derivatives campaign — the Wu et al. NeurIPS'17
headline capability — on a real workload.

Usage: python examples/run_kissgp_campaign.py [iters] [q] [--no-derivs]
Artifacts: examples/artifacts/kissgp_campaign.log + checkpoint .npz.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from cornell_moe_tpu.bayes_opt import BayesianOptimizer
from cornell_moe_tpu.utils.real_functions import KISSGP


def main(argv):
    resume = "--resume" in argv
    with_grads = "--no-derivs" not in argv
    argv = [a for a in argv if not a.startswith("--")]
    iters = int(argv[1]) if len(argv) > 1 else 8
    q = int(argv[2]) if len(argv) > 2 else 2
    art_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "artifacts")
    os.makedirs(art_dir, exist_ok=True)
    tag = "kissgp_campaign" if with_grads else "kissgp_campaign_noderiv"
    ckpt = os.path.join(art_dir, tag + ".npz")
    log_path = os.path.join(art_dir, tag + ".log")

    f = KISSGP(with_gradients=with_grads)
    # standardize: NLZ values span orders of magnitude over the domain
    # and the gradient channels are raw-scale (f32 block-system hygiene,
    # see models/mcmc.GaussianProcessLogLikelihoodMCMC)
    bo = BayesianOptimizer(
        objective_func=f, method="KG", num_to_sample=q, noisy=True,
        standardize=True, seed=1, checkpoint_path=ckpt)
    start_iteration = 0
    if resume:
        meta = bo.resume()
        start_iteration = int(meta["iteration"]) + 1
        print(f"resumed from checkpoint at iteration {meta['iteration']} "
              f"({bo.model._data.num_sampled} observations)")
    t0 = time.time()
    history = bo.run(iters, start_iteration=start_iteration)
    wall = time.time() - t0

    mode = "a" if resume else "w"
    with open(log_path, mode) as fh:
        for h in history:
            fh.write(json.dumps(
                {k: (v.tolist() if hasattr(v, "tolist") else v)
                 for k, v in h.items()}) + "\n")
        fh.write(json.dumps({"wall_s_this_run": round(wall, 1),
                             "from_iteration": start_iteration,
                             "iterations": iters, "q": q,
                             "derivatives": with_grads,
                             "resumed": resume}) + "\n")
    best = min(h["true_value"] for h in history)
    print(f"campaign {'resumed and ' if resume else ''}done in "
          f"{wall:.1f}s; best NLZ {best:.4f}; log -> {log_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
