"""Suggestion helpers (reference examples/bayesian_optimization.py shim).

The implementations live in cornell_moe_tpu.bayes_opt; this module keeps
the reference's import path and names.
"""

import sys

sys.path.insert(0, ".")

from cornell_moe_tpu.bayes_opt import (  # noqa: F401,E402
    gen_sample_from_qei, gen_sample_from_qei_mcmc,
    gen_sample_from_qkg_mcmc, seed_kg_discretization,
    best_so_far_from_discretization)
