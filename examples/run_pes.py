"""PES experiment entry point.

Counterpart of ``pes/run_PES.py`` in the reference: run Predictive
Entropy Search on a named synthetic function.

    python examples/run_pes.py [func=Hartmann6] [iterations=60] [seed=0]
"""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from cornell_moe_tpu.acquisition.pes_driver import run_PES  # noqa: E402
from cornell_moe_tpu.utils.synthetic_functions import (  # noqa: E402
    SYNTHETIC_FUNCTIONS)


def main(argv):
    name = argv[1] if len(argv) > 1 else "Hartmann6"
    iterations = int(argv[2]) if len(argv) > 2 else 60
    seed = int(argv[3]) if len(argv) > 3 else 0
    f = SYNTHETIC_FUNCTIONS[name]()

    def target(x):
        return float(f.evaluate(np.asarray(x))[0])

    bounds = np.asarray(f._search_domain)
    history = run_PES(
        target, bounds[:, 0], bounds[:, 1], f._dim,
        number_of_hyperparameter_sets=100, number_of_burnin=50,
        number_of_initial_points=f._num_init_pts,
        number_of_iterations=iterations, seed=seed)
    best = min(h["best_so_far"] for h in history)
    print(f"final best: {best:.6f} (true minimum {f._min_value})")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
