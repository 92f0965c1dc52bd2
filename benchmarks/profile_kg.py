"""Phase-level profiling of the bench KG program on the real TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from cornell_moe_tpu.acquisition import knowledge_gradient as kg_mod
from cornell_moe_tpu.acquisition.expected_improvement import (
    draw_antithetic_normals)
from cornell_moe_tpu.models import mcmc as mcmc_mod
from cornell_moe_tpu.ops import linalg, optimizers
from cornell_moe_tpu.ops.domains import RepeatedDomain, TensorProductDomain

dtype = jnp.float32
rng = np.random.default_rng(0)
num_obs, dim, n_ensemble = 500, 2, 16
q, num_mc, n_discrete = 4, 2**7, 11
bounds = np.array([[0.0, 1.0], [0.0, 1.0]])
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
hypers = np.stack([0.5 + 1.5 * rng.random(n_ensemble),
                   0.2 + 0.4 * rng.random(n_ensemble),
                   0.2 + 0.4 * rng.random(n_ensemble)], axis=1)
noises = np.full((n_ensemble, 1), 1e-2)
states = mcmc_mod.fit_gp_ensemble(
    "matern_2.5", jnp.asarray(hypers, dtype), jnp.asarray(noises, dtype),
    jnp.asarray(x, dtype), jnp.asarray(y, dtype)[:, None], jitter=1e-5)
jax.block_until_ready(states.chol_K)

domain = TensorProductDomain.from_bounds(bounds)
rep = RepeatedDomain(domain=domain, num_repeats=q)
outer_params = optimizers.GradientDescentParameters(
    num_multistarts=200, max_num_steps=50, max_num_restarts=2,
    num_steps_averaged=4, gamma=0.7, pre_mult=1.0, max_relative_change=0.5)
inner_params = optimizers.GradientDescentParameters(
    num_multistarts=1, max_num_steps=6, max_num_restarts=1,
    num_steps_averaged=3, gamma=0.0, pre_mult=1.0, max_relative_change=0.1)
discrete = jnp.asarray(
    bounds[:, 0] + rng.random((n_ensemble, n_discrete, dim)) *
    (bounds[:, 1] - bounds[:, 0]), dtype)
best_so_far = jnp.full((n_ensemble,), float(y.min()), dtype)
normals = draw_antithetic_normals(jax.random.PRNGKey(0), num_mc, q,
                                  dtype=dtype)
starts = rep.generate_latin_hypercube_points(
    jax.random.PRNGKey(1), outer_params.num_multistarts).astype(dtype)


REPS = 20


def timeit(name, fn, *args, reps=None):
    """Time fn inside one jit via lax.scan over REPS iterations.

    The tunnel has a ~30 ms per-dispatch floor, so each phase is scanned
    REPS times inside a single program; the carry perturbs the first arg
    to defeat CSE/loop-invariant hoisting.
    """
    n_reps = reps or REPS

    def scanned(first, rest):
        def body(u, _):
            out = fn(u, *rest)
            leaves = jax.tree_util.tree_leaves(out)
            bump = sum(jnp.sum(l) for l in leaves) * 1e-20
            return u + bump.astype(u.dtype), None
        u, _ = lax.scan(body, first, None, length=n_reps)
        return u

    f = jax.jit(lambda first: scanned(first, args[1:]))
    t0 = time.time()
    out = jax.block_until_ready(f(args[0]))
    compile_t = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = jax.block_until_ready(f(args[0]))
        ts.append(time.time() - t0)
    per = min(ts) / n_reps
    print(f"{name:45s} {per*1000:9.1f} ms/iter   (compile {compile_t:.1f}s)",
          flush=True)
    return out


B = 25  # chunk size used by bench
unions = starts[:B]

# --- phase A: fantasy precompute over ensemble -----------------------------


def precompute(unions):
    def one(s):
        return kg_mod._build_fantasy_model_batch(s, unions, ())
    return jax.vmap(one)(states)


timeit("A precompute (B=25, S=16)", precompute, unions, reps=100)

from cornell_moe_tpu.models import covariance as cov_mod
from cornell_moe_tpu.models import gp as gp_mod


def precompute_a1(unions):
    def one(s):
        b_, q_, dim_ = unions.shape
        flat = unions.reshape(b_ * q_, dim_)
        k_xu_flat = gp_mod._mix_cov(s, flat, ())
        mu_u = (linalg.hdot(k_xu_flat.T, s.K_inv_y)
                .reshape(b_, q_, 1).at[:, :, 0].add(s.mean)
                .reshape(b_, q_))
        va = linalg.solve_lower_with_refinement(
            s.chol_K, s.inv_chol_K, k_xu_flat)
        return mu_u, va
    return jax.vmap(one)(states)


def precompute_a2(unions):
    def one(s):
        b_, q_, dim_ = unions.shape
        flat = unions.reshape(b_ * q_, dim_)
        k_xu_flat = gp_mod._mix_cov(s, flat, ())
        n_ch = k_xu_flat.shape[0]
        va = linalg.solve_lower_with_refinement(
            s.chol_K, s.inv_chol_K, k_xu_flat).reshape(n_ch, b_, q_)
        prior_u = jax.vmap(lambda u: cov_mod.build_block_covariance(
            s.covariance, u, (), u, ()))(unions)
        var_u = prior_u - jnp.einsum("nbi,nbj->bij", va, va,
                                     precision=linalg.HIGHEST)
        return linalg.cholesky_small(linalg.symmetrize(var_u) +
                                     1e-4 * jnp.eye(q_, dtype=dtype))
    return jax.vmap(one)(states)


def live_eval(unions):
    def one(s, dpts, bsf):
        mu_u, chol_u, v, _ne = kg_mod._build_fantasy_model_batch(s, unions, ())
        betas = jnp.swapaxes(linalg.solve_triangular_small(
            chol_u, jnp.broadcast_to(normals.T,
                                     (unions.shape[0], q, num_mc)),
            trans=True), -1, -2)
        x0 = jnp.broadcast_to(unions[:, :1, :],
                              (unions.shape[0], num_mc, unions.shape[2]))
        return kg_mod._fantasy_mean_batch(s, x0, unions, v, betas,
                                          normals, (), 0)
    return jax.vmap(one)(states, discrete, best_so_far)


def precompute_a0(unions):
    def one(s):
        b_, q_, dim_ = unions.shape
        flat = unions.reshape(b_ * q_, dim_)
        k_xu_flat = gp_mod._mix_cov(s, flat, ())
        mu_u = linalg.hdot(k_xu_flat.T, s.K_inv_y)
        return k_xu_flat, mu_u
    return jax.vmap(one)(states)


def precompute_a0b(unions):
    def one(s):
        b_, q_, dim_ = unions.shape
        flat = unions.reshape(b_ * q_, dim_)
        k_xu_flat = gp_mod._mix_cov(s, flat, ())
        mu_u = linalg.hdot(k_xu_flat.T, s.K_inv_y)
        w0 = linalg.hdot(s.inv_chol_K, k_xu_flat)   # unrefined solve
        return w0, mu_u
    return jax.vmap(one)(states)


timeit("A0 kxu+mu only (B=25)", precompute_a0, unions, reps=100)
# timeit("A0b kxu+mu+1 matmul (B=25)", precompute_a0b, unions)
# timeit("A1 kxu+mu+va (B=25)", precompute_a1, unions)
# timeit("A2 a1+var+chol (B=25)", precompute_a2, unions)
timeit("L  precompute+betas+1 live eval", live_eval, unions, reps=100)

# --- phase B: one KG fwd batch (all phases, value only) --------------------


def kg_value(unions):
    return kg_mod.knowledge_gradient_mcmc_batch(
        states, unions, discrete, normals, domain, inner_params,
        best_so_far, q)


# timeit("B kg fwd value (B=25)", kg_value, unions)

# --- phase C: value+grad ---------------------------------------------------


def kg_vg(unions):
    return kg_mod.knowledge_gradient_mcmc_batch_value_and_grad(
        states, unions, discrete, normals, domain, inner_params,
        best_so_far, q)


# timeit("C kg value+grad (B=25)", kg_vg, unions)

# --- phase D: descent-only microbench (library bvg incl. pallas gate) ------


def descent_only(unions):
    def one(s, dpts, bsf):
        ds = ()
        b, qq, dd = unions.shape
        mu_u, chol_u, v, _ne = kg_mod._build_fantasy_model_batch(s, unions, ds)
        betas = jnp.swapaxes(linalg.solve_triangular_small(
            chol_u, jnp.broadcast_to(normals.T, (b, qq, num_mc)),
            trans=True), -1, -2)
        x0 = jnp.broadcast_to(unions[:, :1, :], (b, num_mc, dd))
        bvg = kg_mod._make_descent_grad_fn(s, unions, v, betas, normals)
        return optimizers.gradient_ascent_batch(bvg, domain, x0,
                                                inner_params)

    return jax.vmap(one)(states, discrete, best_so_far)


# timeit("D precompute+descent only (B=25)", descent_only, unions)

# --- phase E: one full outer multistart GD step ----------------------------


def one_outer_step(unions):
    vals, grads = kg_mod.knowledge_gradient_mcmc_batch_value_and_grad(
        states, unions, discrete, normals, domain, inner_params,
        best_so_far, q)
    return unions + 0.01 * grads


inner_params0 = optimizers.GradientDescentParameters(
    num_multistarts=1, max_num_steps=0, max_num_restarts=1,
    num_steps_averaged=0, gamma=0.0, pre_mult=1.0, max_relative_change=0.1)


def one_outer_step_nodescent(unions):
    vals, grads = kg_mod.knowledge_gradient_mcmc_batch_value_and_grad(
        states, unions, discrete, normals, domain, inner_params0,
        best_so_far, q)
    return unions + 0.01 * grads


def kg_fwd_nodescent(unions):
    return kg_mod.knowledge_gradient_mcmc_batch(
        states, unions, discrete, normals, domain, inner_params0,
        best_so_far, q)


timeit("F kg fwd, 0 inner steps (B=25)", kg_fwd_nodescent, unions, reps=100)
timeit("G outer step, 0 inner steps (B=25)", one_outer_step_nodescent,
       unions, reps=100)
timeit("E one outer GD step (B=25)", one_outer_step, unions, reps=100)
# timeit("E one outer GD step (B=50)", one_outer_step, starts[:50])
# timeit("E one outer GD step (B=100)", one_outer_step, starts[:100])
timeit("E one outer GD step (B=200)", one_outer_step, starts[:200], reps=40)

print("# suggest total ~= (50 steps x 2 restarts) x (200/B) x E(B)",
      flush=True)
