"""End-to-end BO campaign on the CIFAR10 CNN-hyperparameter objective.

Counterpart of the reference's real-function workload
(/root/reference/examples/real_functions.py:31): tune (log10 lr, batch
size, log2 units x3) of a small CNN with q-KG.  Runs 10 iterations with
checkpointing enabled, proving the driver + checkpoint/resume on a
non-synthetic objective.  The CNN trains on torch-CPU (CIFAR-10 pickles if
CIFAR10_DIR is set, synthetic image data otherwise — this image has no
dataset egress).

Usage: python examples/run_cifar10_campaign.py [iters] [q]
Artifacts: examples/artifacts/cifar10_campaign.log + checkpoint .npz.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from cornell_moe_tpu.bayes_opt import BayesianOptimizer
from cornell_moe_tpu.utils.real_functions import CIFAR10


def main(argv):
    resume = "--resume" in argv
    argv = [a for a in argv if a != "--resume"]
    iters = int(argv[1]) if len(argv) > 1 else 10
    q = int(argv[2]) if len(argv) > 2 else 4
    art_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "artifacts")
    os.makedirs(art_dir, exist_ok=True)
    ckpt = os.path.join(art_dir, "cifar10_campaign.npz")
    log_path = os.path.join(art_dir, "cifar10_campaign.log")

    f = CIFAR10(epochs=1, subset=1500)
    bo = BayesianOptimizer(
        objective_func=f, method="KG", num_to_sample=q, noisy=True,
        seed=1, checkpoint_path=ckpt)
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
                             "resumed": resume}) + "\n")
    best = min(h["true_value"] for h in history)
    print(f"campaign {'resumed and ' if resume else ''}done in "
          f"{wall:.1f}s; best validation error {best:.4f}; "
          f"log -> {log_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
