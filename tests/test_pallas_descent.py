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


@pytest.mark.slow
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


def test_pallas_lml_fused_matches_reference(rng):
    """Fused build+Cholesky+solve+logdet kernel vs the numpy reference,
    including padded columns."""
    from cornell_moe_tpu.ops import pallas_kernels as pk

    W, n, d = 8, 37, 2
    np_ = 128
    x = rng.random((n, d)).astype(np.float32)
    lengths = (0.3 + 0.4 * rng.random((W, d))).astype(np.float32)
    alphas = (0.8 + rng.random(W)).astype(np.float32)
    noises = (1e-2 + 1e-2 * rng.random(W)).astype(np.float32)
    y = np.sin(3 * x[:, 0]).astype(np.float32)

    us = np.zeros((W, d, np_), np.float32)
    noise_vec = np.zeros((W, np_), np.float32)
    y_pad = np.zeros((W, np_), np.float32)
    for w in range(W):
        us[w, :, :n] = (x / lengths[w]).T
        us[w, :, n:] = 1e6 * (np.arange(np_ - n) + 1)[None, :]
        noise_vec[w, :n] = noises[w]
        noise_vec[w, n:] = 1e8
        y_pad[w, :n] = y

    quad, logdet = pk.pallas_lml_fused(
        jnp.asarray(us), jnp.asarray(alphas), jnp.asarray(noise_vec),
        jnp.asarray(y_pad), "matern_2.5", n_real=n, wb=4, interpret=True)

    s5 = np.sqrt(5.0)
    for w in range(W):
        diff = (x[:, None, :] - x[None, :, :]) / lengths[w]
        s = np.sum(diff * diff, -1)
        r = np.sqrt(s)
        k = alphas[w] * (1 + s5 * r + 5 * s / 3) * np.exp(-s5 * r) + \
            noises[w] * np.eye(n)
        chol = np.linalg.cholesky(k.astype(np.float64))
        ref_logdet = np.sum(np.log(np.diag(chol)))
        z = np.linalg.solve(chol, y.astype(np.float64))
        np.testing.assert_allclose(float(quad[w]), float(z @ z),
                                   rtol=5e-4)
        np.testing.assert_allclose(float(logdet[w]), ref_logdet,
                                   rtol=5e-4)


@pytest.mark.slow
def test_mcmc_pallas_log_posterior_matches_vmapped(rng, monkeypatch):
    """The batched Pallas log-posterior equals the vmapped XLA path."""
    import functools

    from cornell_moe_tpu.models import mcmc
    from cornell_moe_tpu.ops import pallas_kernels as pk
    from cornell_moe_tpu.utils.data_containers import HistoricalData

    monkeypatch.setattr(mcmc, "LML_PALLAS", "always")
    monkeypatch.setattr(
        pk, "pallas_lml_fused",
        functools.partial(pk.pallas_lml_fused, interpret=True))

    n = 21
    x = rng.random((n, 2)).astype(np.float32)
    y = np.sin(3 * x[:, 0]).astype(np.float32)
    data = HistoricalData(dim=2)
    data.append_historical_data(x, y)
    m = mcmc.GaussianProcessLogLikelihoodMCMC(
        data, noisy=True, bucket=8, rng_key=jax.random.PRNGKey(0))
    xp, yp, pn = m._padded_data()
    xp, yp = xp.astype(jnp.float32), yp.astype(jnp.float32)
    pn = None if pn is None else pn.astype(jnp.float32)
    thetas = jnp.asarray(0.2 * rng.standard_normal((8, 4)), jnp.float32)

    fast = m._log_posterior_with_data()(thetas, xp, yp, pn)
    monkeypatch.setattr(mcmc, "LML_PALLAS", "never")
    slow = m._log_posterior_with_data()(thetas, xp, yp, pn)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_pallas_lml_fused_above_old_cutoff(rng):
    """Np = 1024 (above the round-3 896 cutoff): the round-5 panel-built
    K + slab-wise trailing Schur update is element-identical math, so
    the kernel must match the f64 numpy reference at sizes the old
    whole-matrix build could not compile."""
    from cornell_moe_tpu.ops import pallas_kernels as pk

    W, n, d = 2, 1000, 2
    np_ = 1024
    x = rng.random((n, d)).astype(np.float32)
    lengths = (0.3 + 0.4 * rng.random((W, d))).astype(np.float32)
    alphas = (0.8 + rng.random(W)).astype(np.float32)
    noises = (1e-2 + 1e-2 * rng.random(W)).astype(np.float32)
    y = np.sin(3 * x[:, 0]).astype(np.float32)

    us = np.zeros((W, d, np_), np.float32)
    noise_vec = np.zeros((W, np_), np.float32)
    y_pad = np.zeros((W, np_), np.float32)
    for w in range(W):
        us[w, :, :n] = (x / lengths[w]).T
        us[w, :, n:] = 1e6 * (np.arange(np_ - n) + 1)[None, :]
        noise_vec[w, :n] = noises[w]
        noise_vec[w, n:] = 1e8
        y_pad[w, :n] = y

    quad, logdet = pk.pallas_lml_fused(
        jnp.asarray(us), jnp.asarray(alphas), jnp.asarray(noise_vec),
        jnp.asarray(y_pad), "matern_2.5", n_real=n, wb=1, interpret=True)

    s5 = np.sqrt(5.0)
    for w in range(W):
        diff = (x[:, None, :] - x[None, :, :]) / lengths[w]
        s = np.sum(diff * diff, -1)
        r = np.sqrt(s)
        k = alphas[w] * (1 + s5 * r + 5 * s / 3) * np.exp(-s5 * r) + \
            noises[w] * np.eye(n)
        chol = np.linalg.cholesky(k.astype(np.float64))
        ref_logdet = np.sum(np.log(np.diag(chol)))
        z = np.linalg.solve(chol, y.astype(np.float64))
        np.testing.assert_allclose(float(quad[w]), float(z @ z),
                                   rtol=5e-3)
        np.testing.assert_allclose(float(logdet[w]), ref_logdet,
                                   rtol=5e-4)
