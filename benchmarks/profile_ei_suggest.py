"""Gated-vs-ungated EI suggest probe (VERDICT r4 item 6 measurement).

Round 5 routed method="EI" suggest through the lockstep-batched
multistart with the chunk-wide step-norm gate and mesh sharding (the
same treatment as KG).  This probe measures what the gate buys on the
EI objective at the bench GP shape (500 obs, member-0 single GP,
q=4, 1024 MC, 200 multistarts): wall with conv_tol=None (fixed-depth)
vs the driver default 3e-3, plus suggestion agreement.

Run on the real chip:  python benchmarks/profile_ei_suggest.py
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

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cornell_moe_tpu.acquisition import expected_improvement as ei_mod  # noqa: E402
from cornell_moe_tpu.models import covariance as cov_mod  # noqa: E402
from cornell_moe_tpu.models import gp as gp_mod  # noqa: E402
from cornell_moe_tpu.ops import optimizers  # noqa: E402
from cornell_moe_tpu.ops.domains import TensorProductDomain  # noqa: E402

dtype = jnp.float32
rng = np.random.default_rng(0)
num_obs, dim, q = 500, 2, 4
x = rng.random((num_obs, dim))


def branin(u):
    p0 = u[:, 0] * 15.0
    p1 = u[:, 1] * 20.0 - 5.0
    a, b = 1.0, 5.1 / (4 * np.pi**2)
    c, r, s, t = 5.0 / np.pi, 6.0, 10.0, 1.0 / (8 * np.pi)
    return (a * (p1 - b * p0**2 + c * p0 - r) ** 2
            + s * (1 - t) * np.cos(p0) + s)


y = branin(x)
y = (y - y.mean()) / y.std() + 0.01 * rng.standard_normal(num_obs)
state = gp_mod.fit_gp(
    cov_mod.make_covariance("matern_2.5",
                            np.array([1.0, 0.3, 0.3], np.float32)),
    jnp.asarray([1e-2], dtype), jnp.asarray(x, dtype),
    jnp.asarray(y, dtype)[:, None], jitter=1e-5)
dom = TensorProductDomain(bounds=jnp.asarray([[0.0, 1.0], [0.0, 1.0]],
                                             dtype))
params = optimizers.GradientDescentParameters(
    num_multistarts=200, max_num_steps=50, max_num_restarts=2,
    num_steps_averaged=4, gamma=0.7, pre_mult=1.0,
    max_relative_change=0.5)

results = {}
for tag, tol in (("ungated", None), ("gated_3e-3", 3e-3)):
    def suggest(key, tol=tol):
        return ei_mod.multistart_expected_improvement_optimization(
            key, state, dom, q, params, num_mc_iterations=2**10,
            conv_tol=tol, chunk_size=25)

    f = jax.jit(suggest)
    pts = jax.block_until_ready(f(jax.random.PRNGKey(5)))
    ts = []
    for _ in range(3):
        t0 = time.time()
        pts = jax.block_until_ready(f(jax.random.PRNGKey(5)))
        ts.append(time.time() - t0)
    voi = float(ei_mod.evaluate_expected_improvement_at_point_list(
        state, pts[None], key=jax.random.PRNGKey(6),
        num_mc_iterations=2**10)[0])
    results[tag] = {"wall_s": round(min(ts), 4),
                    "ei_at_suggestion": round(voi, 6),
                    "points": np.asarray(pts).round(5).tolist()}
    print(json.dumps({"tag": tag, **results[tag]}), flush=True)

results["speedup"] = round(results["ungated"]["wall_s"]
                           / results["gated_3e-3"]["wall_s"], 2)
print(json.dumps({"speedup_gated": results["speedup"]}), flush=True)
out = os.path.join(os.path.dirname(__file__), "EI_GATE_r05.json")
with open(out, "w") as fh:
    json.dump(results, fh, indent=1)
print(f"# wrote {out}", file=sys.stderr)
