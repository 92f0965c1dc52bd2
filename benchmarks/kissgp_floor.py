"""Measure the KISSGP objective's global NLZ floor (verdict item 7).

The round-3 campaign artifact carried ``_min_value = 0.0`` while the
objective's observed floor was ~13.6, making its gap-to-optimum column
meaningless.  The objective (utils/real_functions.KISSGP) is a fixed
seeded dataset, so its minimum is a well-defined constant: this script
finds it by multistart L-BFGS-B over the BayesOpt domain [-1, 3]^3
using the objective's own jitted value+grad, and prints the winning
log-hyperparameters + NLZ.

The measured floor is then recorded in ``KISSGP._min_value`` (with this
script as provenance) so campaign artifacts report an interpretable
gap.

Run (CPU-only, ~1 min):  python benchmarks/kissgp_floor.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
from scipy.optimize import minimize


def main():
    # CPU-only workload: force the CPU platform AFTER importing jax
    # (tests/conftest.py convention; env vars are overridden by the
    # ambient sitecustomize) so the objective's closures never allocate
    # on the tunnel device
    import jax
    jax.config.update("jax_platforms", "cpu")

    from cornell_moe_tpu.utils.real_functions import KISSGP

    obj = KISSGP(with_gradients=True)
    bounds = obj._search_domain

    def f_and_g(x):
        out = obj.evaluate_true(x)
        return float(out[0]), np.asarray(out[1:], dtype=float)

    rng = np.random.default_rng(0)
    n_starts = 24
    starts = bounds[:, 0] + rng.random((n_starts, 3)) * (
        bounds[:, 1] - bounds[:, 0])
    # include the domain center and the data-generating hypers
    # (ell=0.5, sf=1, sn=0.1 -> log [-0.693, 0, -2.303]; sn is below the
    # domain's lower bound, so clip into the box)
    extra = np.array([[1.0, 1.0, 1.0],
                      np.clip([-0.693, 0.0, -2.303],
                              bounds[:, 0], bounds[:, 1])])
    starts = np.vstack([extra, starts])

    best = None
    for i, x0 in enumerate(starts):
        res = minimize(f_and_g, x0, jac=True, method="L-BFGS-B",
                       bounds=[tuple(b) for b in bounds],
                       options={"maxiter": 200})
        row = {"start": [round(float(v), 4) for v in x0],
               "x": [round(float(v), 6) for v in res.x],
               "nlz": round(float(res.fun), 6),
               "converged": bool(res.success)}
        print(json.dumps(row), flush=True)
        if best is None or res.fun < best["nlz"]:
            best = row
    print(json.dumps({"metric": "KISSGP global NLZ floor "
                                "(multistart L-BFGS-B, 26 starts)",
                      "min_value": best["nlz"],
                      "argmin_log_hypers": best["x"]}), flush=True)


if __name__ == "__main__":
    main()
