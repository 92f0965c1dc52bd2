"""Dev check: pallas descent grad (interpret) vs analytic XLA path."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from cornell_moe_tpu.acquisition import knowledge_gradient as kg_mod
from cornell_moe_tpu.models import gp as gp_mod
from cornell_moe_tpu.models.covariance import MaternNu2p5

rng = np.random.default_rng(0)
n, d, b, q, m = 37, 2, 3, 4, 16
x = rng.random((n, d)).astype(np.float32)
y = np.sin(3 * x[:, 0]) + x[:, 1]
state = gp_mod.fit_gp(MaternNu2p5(hyperparameters=jnp.asarray(
    [1.3, 0.4, 0.5], jnp.float32)), jnp.asarray([1e-2], jnp.float32),
    jnp.asarray(x), jnp.asarray(y, jnp.float32)[:, None])

unions = jnp.asarray(rng.random((b, q, d)), jnp.float32)
v = jnp.asarray(rng.standard_normal((b, n, q)) * 0.1, jnp.float32)
betas = jnp.asarray(rng.standard_normal((b, m, q)), jnp.float32)
normals = jnp.asarray(rng.standard_normal((m, q)), jnp.float32)
pts = jnp.asarray(rng.random((b, m, d)), jnp.float32)

bvg_xla = kg_mod._make_descent_grad_fn(state, unions, v, betas, normals)
_, g_xla = bvg_xla(pts)

bvg_pl = kg_mod._pallas_descent_bvg(state, unions, v, betas, normals,
                                    "matern_2.5", interpret=True)
_, g_pl = bvg_pl(pts)

err = float(jnp.max(jnp.abs(g_pl - g_xla)))
ref = float(jnp.max(jnp.abs(g_xla)))
print("max |g|:", ref, " max err:", err, " rel:", err / ref)
assert err / ref < 2e-5, "pallas descent grad mismatch"

# vmap over a stacked ensemble axis (as knowledge_gradient_mcmc_batch does)
from cornell_moe_tpu.models import mcmc as mcmc_mod

hypers = np.abs(rng.standard_normal((4, 1 + d))).astype(np.float32) + 0.5
noises = np.full((4, 1), 1e-2, np.float32)
states = mcmc_mod.fit_gp_ensemble("matern_2.5", jnp.asarray(hypers),
                                  jnp.asarray(noises), jnp.asarray(x),
                                  jnp.asarray(y, jnp.float32)[:, None])


def per_member(s):
    f = kg_mod._pallas_descent_bvg(s, unions, v, betas, normals,
                                   "matern_2.5", interpret=True)
    return f(pts)[1]


g_stack = jax.vmap(per_member)(states)
g_loop = jnp.stack([per_member(mcmc_mod.ensemble_member(states, i))
                    for i in range(4)])
err2 = float(jnp.max(jnp.abs(g_stack - g_loop)))
print("vmap-vs-loop max err:", err2)
assert err2 < 1e-5

# full-descent kernel vs gradient_ascent_batch over the analytic bvg
from cornell_moe_tpu.ops import optimizers
from cornell_moe_tpu.ops.domains import TensorProductDomain

dom = TensorProductDomain.from_bounds(np.asarray([[0.0, 1.0]] * d))
params = optimizers.GradientDescentParameters(
    num_multistarts=1, max_num_steps=6, max_num_restarts=1,
    num_steps_averaged=3, gamma=0.0, pre_mult=1.0, max_relative_change=0.1)
x_ref = optimizers.gradient_ascent_batch(bvg_xla, dom, pts, params)
x_pl = kg_mod._pallas_descent_full(state, unions, v, betas, normals, pts,
                                   dom, params, "matern_2.5",
                                   interpret=True)
err3 = float(jnp.max(jnp.abs(x_ref - x_pl)))
print("full-descent traj max err:", err3)
assert err3 < 5e-5

# vmapped full descent over the ensemble
x_pl_stack = jax.vmap(lambda s: kg_mod._pallas_descent_full(
    s, unions, v, betas, normals, pts, dom, params, "matern_2.5",
    interpret=True))(states)
x_ref_stack = jnp.stack([
    optimizers.gradient_ascent_batch(
        kg_mod._make_descent_grad_fn(mcmc_mod.ensemble_member(states, i),
                                     unions, v, betas, normals),
        dom, pts, params) for i in range(4)])
err4 = float(jnp.max(jnp.abs(x_pl_stack - x_ref_stack)))
print("vmapped full-descent max err:", err4)
assert err4 < 5e-5
print("OK")
