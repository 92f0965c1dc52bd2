"""Experiment driver CLI.

Counterpart of ``examples/main.py`` in the reference:

    python examples/main.py <obj_func_name> <method KG|EI> <num_to_sample>
                            <job_id> [HeSBO] [effective_dim] [--devices=N]

e.g.  python examples/main.py Branin KG 4 1
      python examples/main.py Hartmann6 KG 2 1 HeSBO 3
      python examples/main.py Branin KG 4 1 --devices=8   # 8-chip mesh
"""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from cornell_moe_tpu.bayes_opt import BayesianOptimizer  # noqa: E402
from cornell_moe_tpu.utils import hesbo  # noqa: E402
from cornell_moe_tpu.utils.synthetic_functions import (  # noqa: E402
    SYNTHETIC_FUNCTIONS)


def main(argv):
    # optional --devices=N anywhere in argv: shard the suggest/retrain
    # programs over a mesh of the first N JAX devices (multi-chip mode)
    n_devices = None
    argv = list(argv)
    for a in list(argv):
        if a.startswith("--devices"):
            if "=" not in a:
                # the space-separated form would silently drop the flag
                # AND shift the positional args — reject it loudly
                print("--devices requires '=': use --devices=N")
                return 1
            n_devices = int(a.split("=", 1)[1])
            argv.remove(a)
    if len(argv) < 5:
        print(__doc__)
        return 1
    obj_func_name, method = argv[1], argv[2]
    num_to_sample, job_id = int(argv[3]), int(argv[4])

    if obj_func_name in SYNTHETIC_FUNCTIONS:
        objective_func = SYNTHETIC_FUNCTIONS[obj_func_name]()
    elif obj_func_name in ("KISSGP", "CIFAR10"):
        # real-function workloads (the reference wires these by editing
        # its obj_func_dict; here they are first-class CLI choices)
        from cornell_moe_tpu.utils import real_functions
        objective_func = getattr(real_functions, obj_func_name)()
    else:
        print(f"unknown objective {obj_func_name!r}; choices: "
              f"{sorted(SYNTHETIC_FUNCTIONS)} + ['KISSGP', 'CIFAR10']")
        return 1
    if len(argv) > 5 and argv[5] == "HeSBO":
        effective_dim = int(argv[6]) if len(argv) > 6 else 2
        objective_func = hesbo.Projection(effective_dim, objective_func,
                                          seed=job_id)

    num_iterations = int(argv[7]) if len(argv) > 7 else 10

    bo = BayesianOptimizer(
        objective_func=objective_func, method=method,
        num_to_sample=num_to_sample, noisy=objective_func._sample_var > 0,
        seed=job_id, n_devices=n_devices)
    history = bo.run(num_iterations)
    best = min(h["true_value"] for h in history)
    print(f"final best recommended value: {best:.6f} "
          f"(true minimum {objective_func._min_value})")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
