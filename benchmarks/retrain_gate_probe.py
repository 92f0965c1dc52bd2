"""Gated vs ungated retrain probe at the bench shape (round 5).

Measures the driver's steady-state retrain (500 obs, 16 walkers,
noisy) for chain_gate_tol in (None, 1.0, 2.0): wall, executed chain
steps, and the retained hyperposterior's median/IQR — the statistics-
parity evidence behind the chain_gate_tol=1.0 production default
(docs/retrain_gate_r05.md).

Run on the real chip:  python benchmarks/retrain_gate_probe.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

from cornell_moe_tpu.config import enable_compilation_cache

enable_compilation_cache()

from cornell_moe_tpu.models.mcmc import GaussianProcessLogLikelihoodMCMC  # noqa: E402
from cornell_moe_tpu.utils.data_containers import HistoricalData  # noqa: E402

rng = np.random.default_rng(0)
num_obs, dim = 500, 2
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

for tol in (None, 1.0, 2.0):
    hist = HistoricalData(dim)
    hist.append_historical_data(x, y[:, None],
                                np.full((num_obs, 1), 1e-4))
    model = GaussianProcessLogLikelihoodMCMC(
        hist, chain_length=1000, burnin_steps=2000, n_hypers=16,
        noisy=True, chain_gate_tol=tol)
    t0 = time.time()
    model.train()
    first = time.time() - t0
    walls, steps = [], []
    for _ in range(3):
        t0 = time.time()
        model.train()
        walls.append(time.time() - t0)
        steps.append(model.last_chain_steps)
    hyp = np.exp(np.asarray(model.hypers))
    print(json.dumps({
        "gate_tol": tol, "first_train_s": round(first, 2),
        "retrain_s": [round(w, 4) for w in walls],
        "chain_steps": steps,
        "hyper_median": [round(float(v), 4) for v in np.median(hyp, 0)],
        "hyper_iqr": [round(float(v), 4) for v in
                      (np.percentile(hyp, 75, 0)
                       - np.percentile(hyp, 25, 0))],
    }), flush=True)
