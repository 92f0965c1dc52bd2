"""Fused KG inner-descent Pallas kernel tests (interpret mode).

The descent kernel is the bench hot op: per outer GD step it runs every
(union, MC-draw) posterior-mean descent in VMEM with the analytic moment
contraction.  These tests pin it against the XLA einsum oracle
(_make_descent_grad_fn) and against gradient_ascent_batch semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cornell_moe_tpu.acquisition import knowledge_gradient as kg_mod
from cornell_moe_tpu.models import gp as gp_mod
from cornell_moe_tpu.models import mcmc as mcmc_mod
from cornell_moe_tpu.models.covariance import MaternNu2p5
from cornell_moe_tpu.ops import linalg, optimizers
from cornell_moe_tpu.ops.domains import TensorProductDomain


@pytest.fixture
def problem(rng):
    n, d, b, q, m = 37, 2, 3, 4, 16
    x = rng.random((n, d)).astype(np.float32)
    y = np.sin(3 * x[:, 0]) + x[:, 1]
    state = gp_mod.fit_gp(
        MaternNu2p5(hyperparameters=jnp.asarray([1.3, 0.4, 0.5],
                                                jnp.float32)),
        jnp.asarray([1e-2], jnp.float32), jnp.asarray(x),
        jnp.asarray(y, jnp.float32)[:, None])
    unions = jnp.asarray(rng.random((b, q, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, q)) * 0.1, jnp.float32)
    betas = jnp.asarray(rng.standard_normal((b, m, q)), jnp.float32)
    normals = jnp.asarray(rng.standard_normal((m, q)), jnp.float32)
    pts = jnp.asarray(rng.random((b, m, d)), jnp.float32)
    return state, unions, v, betas, normals, pts


def test_pallas_descent_grad_matches_analytic(problem):
    state, unions, v, betas, normals, pts = problem
    _, g_xla = kg_mod._make_descent_grad_fn(
        state, unions, v, betas, normals)(pts)
    _, g_pl = kg_mod._pallas_descent_bvg(
        state, unions, v, betas, normals, "matern_2.5",
        interpret=True)(pts)
    ref = float(jnp.max(jnp.abs(g_xla)))
    assert float(jnp.max(jnp.abs(g_pl - g_xla))) < 2e-5 * max(ref, 1.0)


def test_pallas_descent_run_matches_gradient_ascent(problem):
    state, unions, v, betas, normals, pts = problem
    dom = TensorProductDomain(
        bounds=jnp.asarray([[0.0, 1.0]] * 2, jnp.float32))
    params = optimizers.GradientDescentParameters(
        num_multistarts=1, max_num_steps=6, max_num_restarts=2,
        num_steps_averaged=3, gamma=0.3, pre_mult=1.0,
        max_relative_change=0.1)
    bvg = kg_mod._make_descent_grad_fn(state, unions, v, betas, normals)
    x_ref = optimizers.gradient_ascent_batch(bvg, dom, pts, params)
    x_pl = kg_mod._pallas_descent_full(
        state, unions, v, betas, normals, pts, dom, params, "matern_2.5",
        interpret=True)
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x_ref),
                               atol=5e-5)


def test_pallas_descent_vmapped_over_ensemble(problem, rng):
    state, unions, v, betas, normals, pts = problem
    hypers = (np.abs(rng.standard_normal((4, 3))) + 0.5).astype(np.float32)
    noises = np.full((4, 1), 1e-2, np.float32)
    states = mcmc_mod.fit_gp_ensemble(
        "matern_2.5", jnp.asarray(hypers), jnp.asarray(noises),
        state.points_sampled, state.points_sampled_value)
    dom = TensorProductDomain(
        bounds=jnp.asarray([[0.0, 1.0]] * 2, jnp.float32))
    params = optimizers.GradientDescentParameters(
        num_multistarts=1, max_num_steps=4, max_num_restarts=1,
        num_steps_averaged=2, gamma=0.0, pre_mult=1.0,
        max_relative_change=0.1)

    x_stack = jax.vmap(lambda s: kg_mod._pallas_descent_full(
        s, unions, v, betas, normals, pts, dom, params, "matern_2.5",
        interpret=True))(states)
    x_loop = jnp.stack([
        optimizers.gradient_ascent_batch(
            kg_mod._make_descent_grad_fn(
                mcmc_mod.ensemble_member(states, i), unions, v, betas,
                normals), dom, pts, params) for i in range(4)])
    np.testing.assert_allclose(np.asarray(x_stack), np.asarray(x_loop),
                               atol=5e-5)


def test_analytic_descent_grad_matches_autodiff(problem):
    """The XLA analytic moment gradient equals autodiff of the factored
    fantasy mean (the construction knowledge_gradient_batch falls back
    to for derivative channels)."""
    state, unions, v, betas, normals, pts = problem

    def neg_mu_sum(x):
        return -jnp.sum(kg_mod._fantasy_mean_batch(
            state, x, unions, v, betas, normals, (), 0))

    g_auto = jax.grad(neg_mu_sum)(pts)
    _, g_analytic = kg_mod._make_descent_grad_fn(
        state, unions, v, betas, normals)(pts)
    np.testing.assert_allclose(np.asarray(g_analytic),
                               np.asarray(g_auto), rtol=2e-4, atol=2e-5)


def test_small_cholesky_and_solves(rng):
    a = rng.standard_normal((7, 5, 5))
    spd = jnp.asarray(a @ np.swapaxes(a, -1, -2) +
                      5.0 * np.eye(5)[None])
    chol_ref = jnp.linalg.cholesky(spd)
    chol = linalg.cholesky_small(spd)
    np.testing.assert_allclose(np.asarray(chol), np.asarray(chol_ref),
                               rtol=1e-10, atol=1e-12)

    rhs = jnp.asarray(rng.standard_normal((7, 5, 3)))
    x = linalg.solve_triangular_small(chol, rhs)
    np.testing.assert_allclose(np.asarray(chol @ x), np.asarray(rhs),
                               rtol=1e-10, atol=1e-12)
    xt = linalg.solve_triangular_small(chol, rhs, trans=True)
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(chol, -1, -2) @ xt), np.asarray(rhs),
        rtol=1e-10, atol=1e-12)
