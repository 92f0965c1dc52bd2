"""Micro-benchmark of the q-EI seeding objective on the real TPU.

The driver's KG seeding runs a 200-start x (2x50)-step GD on the
ensemble-averaged MC q-EI with q=10 and 1024 draws; at the transcript
shape that phase costs ~0.57 s (~5.7 ms per GD step,
profile_driver_suggest.py) and dominates the full-iteration wall.  The
per-step cost is HBM traffic on (200 starts, 16 models, 1024 draws, 10)
intermediates in the fused forward+backward.

This script times the value+grad of that objective (vmapped over the
200 starts, the exact per-step work) for:
  * the production whole-batch estimator, and
  * a chunked-scan variant that accumulates per-chunk value_and_grad
    over the MC axis (valid because the MC mean is additive over
    chunks — scan-of-vjp, no cross-chunk residuals).

Usage: python benchmarks/profile_qei.py [chunks...]   (default 64 128 256)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from cornell_moe_tpu.acquisition import expected_improvement as ei_mod
from cornell_moe_tpu.models import mcmc as mcmc_mod
from cornell_moe_tpu.ops.domains import (RepeatedDomain,
                                         TensorProductDomain)

dtype = jnp.float32
rng = np.random.default_rng(0)

# transcript steady-state-ish shape: 43 obs padded to 48, 16 models
n_obs, dim, s_ens, q, n_starts = 43, 2, 16, 10, 200
n_mc = int(os.environ.get("QEI_MC", 2**10))
x = rng.random((n_obs, dim)) * np.asarray([15.0, 15.0]) + \
    np.asarray([-5.0, 0.0])
y = np.sin(x[:, 0]) + np.cos(x[:, 1]) + 0.1 * rng.standard_normal(n_obs)
hypers = np.stack([1.0 + rng.random(s_ens),
                   2.0 + 2.0 * rng.random(s_ens),
                   2.0 + 2.0 * rng.random(s_ens)], axis=1)
noises = np.full((s_ens, 1), 1e-2)
states = mcmc_mod.fit_gp_ensemble(
    "matern_2.5", jnp.asarray(hypers, dtype), jnp.asarray(noises, dtype),
    jnp.asarray(x, dtype), jnp.asarray(y, dtype)[:, None], bucket=16)

domain = TensorProductDomain.from_bounds(
    np.asarray([[-5.0, 10.0], [0.0, 15.0]]))
rep = RepeatedDomain(domain=domain, num_repeats=q)
starts = rep.generate_latin_hypercube_points(
    jax.random.PRNGKey(0), n_starts).astype(dtype)
normals = ei_mod.draw_normals(jax.random.PRNGKey(1), n_mc, q, dtype=dtype)
bsf = jax.vmap(lambda s: s.best_observed_value)(states)


def ei_sum(pts, z):
    """SUM of per-draw ensemble-mean improvement over the given draws."""
    def one(s, b):
        return ei_mod.monte_carlo_expected_improvement(s, pts, None, b, z)
    return jnp.mean(jax.vmap(one)(states, bsf)) * z.shape[0]


def vg_whole(pts):
    f = lambda p: ei_sum(p, normals) / n_mc
    return jax.value_and_grad(f)(pts)


def vg_chunked(pts, chunk):
    zc = normals.reshape(n_mc // chunk, chunk, q)

    def body(acc, z):
        v, g = jax.value_and_grad(ei_sum)(pts, z)
        return (acc[0] + v, acc[1] + g), None

    (v, g), _ = lax.scan(body, (jnp.zeros((), dtype),
                                jnp.zeros_like(pts)), zc)
    return v / n_mc, g / n_mc


def timeit(fn, reps=50):
    """Per-step cost measured INSIDE one jitted scan (the ~30 ms
    dispatch floor on big-closure programs would otherwise swamp the
    per-step numbers; CLAUDE.md tunnel rules)."""
    vg_b = lambda st: jax.vmap(fn)(st)

    def scanned(st):
        def body(s, _):
            v, g = vg_b(s)
            bump = (jnp.sum(v) + jnp.sum(g)) * 1e-20
            return s + bump, None
        s, _ = lax.scan(body, st, None, length=reps)
        return s

    f = jax.jit(scanned)
    t0 = time.time()
    jax.block_until_ready(f(starts))
    ct = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(f(starts))
        ts.append(time.time() - t0)
    out = jax.jit(vg_b)(starts)
    return min(ts) / reps, ct, out


chunks = [int(a) for a in sys.argv[1:] if a.isdigit()]
if not sys.argv[1:]:
    chunks = [64, 128, 256]


def _posterior_parts(pts):
    """Sub-phase probes: the per-model posterior build vs the chol vs
    the sampling/improvement stage, each with its backward."""
    from cornell_moe_tpu.models import gp
    from cornell_moe_tpu.ops import linalg
    from cornell_moe_tpu import config

    def mu_var(p):
        def one(s):
            mu = gp.posterior_mean(s, p)[:, 0]
            var = gp.posterior_variance(s, p)
            return jnp.sum(mu) + jnp.sum(var)
        return jnp.mean(jax.vmap(one)(states))

    def mu_var_chol(p):
        def one(s):
            mu = gp.posterior_mean(s, p)[:, 0]
            var = gp.posterior_variance(s, p)
            chol = linalg.cholesky(var, jitter=config.EI_VARIANCE_JITTER)
            return jnp.sum(mu) + jnp.sum(chol)
        return jnp.mean(jax.vmap(one)(states))

    return mu_var, mu_var_chol


if os.environ.get("QEI_PARTS"):
    pts0 = starts[0]
    mu_var, mu_var_chol = _posterior_parts(pts0)
    for name, f in (("mu+var build", mu_var),
                    ("mu+var+chol", mu_var_chol)):
        vgf = lambda p, f=f: jax.value_and_grad(f)(p)
        t, c, _ = timeit(vgf)
        print(f"{name:18s} vg: {t*1000:7.2f} ms/step  (compile {c:.0f}s)",
              flush=True)
    t, c, _ = timeit(vg_whole)
    print(f"{'full qEI':18s} vg: {t*1000:7.2f} ms/step", flush=True)
    sys.exit(0)
t0, c0, (v0, g0) = timeit(vg_whole)
print(f"whole-batch vg:      {t0*1000:7.2f} ms/step  (compile {c0:.0f}s)",
      flush=True)
for ch in chunks:
    t, c, (v, g) = timeit(lambda p, ch=ch: vg_chunked(p, ch))
    dv = float(jnp.max(jnp.abs(v - v0)))
    dg = float(jnp.max(jnp.abs(g - g0)))
    print(f"chunked vg (c={ch:4d}): {t*1000:7.2f} ms/step  "
          f"(compile {c:.0f}s)  max|dv| {dv:.2e} max|dg| {dg:.2e}",
          flush=True)
