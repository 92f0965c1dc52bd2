"""Tests: synthetic functions, HeSBO, random features, LCB, full BO loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cornell_moe_tpu import bayes_opt
from cornell_moe_tpu.acquisition.lower_confidence_bound import (
    lower_confidence_bound_optimization)
from cornell_moe_tpu.models import covariance as cov_mod
from cornell_moe_tpu.models import gp
from cornell_moe_tpu.ops import optimizers, random_features
from cornell_moe_tpu.ops.domains import TensorProductDomain
from cornell_moe_tpu.utils import hesbo
from cornell_moe_tpu.utils import synthetic_functions as sf


# --- synthetic functions --------------------------------------------------

def test_branin_minimum():
    f = sf.Branin()
    out = f.evaluate_true(np.array([np.pi, 2.275]))
    np.testing.assert_allclose(out[0], 0.397887, atol=1e-5)
    np.testing.assert_allclose(out[1:], 0.0, atol=1e-3)   # gradient ~ 0
    assert out.shape == (3,)


def test_hartmann6_minimum():
    f = sf.Hartmann6()
    x = np.array([0.20169, 0.150011, 0.476874, 0.275332, 0.311652, 0.6573])
    out = f.evaluate_true(x)
    np.testing.assert_allclose(out[0], -3.32237, atol=1e-4)
    np.testing.assert_allclose(out[1:], 0.0, atol=2e-3)


@pytest.mark.parametrize("name", list(sf.SYNTHETIC_FUNCTIONS))
def test_all_synthetic_functions_shapes(name):
    f = sf.SYNTHETIC_FUNCTIONS[name]()
    x = np.mean(f._search_domain, axis=1)
    out = f.evaluate_true(x)
    assert out.shape == (f._dim + 1,)
    assert np.all(np.isfinite(out))
    # gradient channel ping
    eps = 1e-6
    for j in range(f._dim):
        xp, xm = x.copy(), x.copy()
        xp[j] += eps
        xm[j] -= eps
        fd = (f.evaluate_true(xp)[0] - f.evaluate_true(xm)[0]) / (2 * eps)
        np.testing.assert_allclose(out[1 + j], fd, rtol=1e-4, atol=1e-6)


def test_hesbo_projection():
    f = sf.Hartmann6()
    proj = hesbo.Projection(2, f, seed=3)
    assert proj._dim == 2
    x_low = np.array([0.3, 0.8])
    x_high = proj.back_projection(x_low.copy())
    assert x_high.shape == (6,)
    dom = f._search_domain
    assert np.all(x_high >= dom[:, 0] - 1e-9)
    assert np.all(x_high <= dom[:, 1] + 1e-9)
    out = proj.evaluate_true(x_low.copy())
    assert np.isfinite(out[0])
    # determinism
    np.testing.assert_allclose(proj.back_projection(x_low.copy()), x_high)


# --- random features ------------------------------------------------------

def _gp_1d(rng, n=10, noise=1e-3, kernel="square_exponential"):
    cov = cov_mod.make_covariance(kernel, [1.0, 0.6])
    x = np.sort(rng.random(n) * 4 - 2)[:, None]
    y = np.sin(2 * x[:, 0])
    return gp.fit_gp(cov, jnp.asarray([noise]), jnp.asarray(x),
                     jnp.asarray(y)[:, None]), x, y


@pytest.mark.slow
def test_random_feature_sample_approximates_posterior(rng):
    state, x, y = _gp_1d(rng)
    xt = jnp.asarray(np.linspace(-2, 2, 7)[:, None])
    keys = jax.random.split(jax.random.PRNGKey(0), 300)
    draws = jax.vmap(lambda k: random_features.evaluate_random_feature_sample(
        random_features.sample_gp_with_random_features(k, state, 600),
        xt))(keys)
    mu = np.asarray(gp.posterior_mean(state, xt))[:, 0]
    emp_mu = np.asarray(draws).mean(0)
    np.testing.assert_allclose(emp_mu, mu, atol=0.15)
    var = np.diag(np.asarray(gp.posterior_variance(state, xt)))
    emp_var = np.asarray(draws).var(0)
    np.testing.assert_allclose(emp_var, var, atol=0.1)


def test_sample_from_global_optima(rng):
    state, x, y = _gp_1d(rng, n=14, noise=1e-6)
    dom = TensorProductDomain.from_bounds([[-2.0, 2.0]])
    grid = jnp.linspace(-2, 2, 60)[:, None]
    pts = random_features.sample_from_global_optima(
        jax.random.PRNGKey(1), state, dom, grid, 12, n_features=400)
    assert pts.shape == (12, 1)
    # sin(2x) on [-2,2]: minimum at -pi/4; most Thompson draws near it
    frac_near = np.mean(np.abs(np.asarray(pts)[:, 0] + np.pi / 4) < 0.4)
    assert frac_near > 0.5


def test_rff_with_derivative_observations(rng):
    dim = 1
    cov = cov_mod.make_covariance("square_exponential", [1.0, 0.7])
    x = np.linspace(-1.5, 1.5, 6)[:, None]
    y = np.stack([np.sin(2 * x[:, 0]), 2 * np.cos(2 * x[:, 0])], axis=1)
    state = gp.fit_gp(cov, jnp.asarray([1e-4, 1e-4]), jnp.asarray(x),
                      jnp.asarray(y), derivatives=(0,))
    s = random_features.sample_gp_with_random_features(
        jax.random.PRNGKey(2), state, 500)
    vals = random_features.evaluate_random_feature_sample(
        s, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(vals), y[:, 0], atol=0.35)


# --- LCB ------------------------------------------------------------------

def test_lcb_selection(rng):
    state, x, y = _gp_1d(rng)
    cand = jnp.asarray(np.linspace(-2, 2, 41)[:, None])
    pts, val = lower_confidence_bound_optimization(state, cand, 3)
    assert pts.shape == (3, 1)
    assert val == 0.0
    # picks come from the plausible set (LCB below the min-UCB bound)
    mu = gp.posterior_mean(state, cand)[:, 0]
    sd = jnp.sqrt(jax.vmap(
        lambda p: gp.posterior_variance(state, p[None])[0, 0])(cand))
    plausible = cand[(mu - sd) <= jnp.min(mu + sd)]
    for p in np.asarray(pts):
        assert np.min(np.abs(np.asarray(plausible)[:, 0] - p[0])) < 1e-12


# --- end-to-end BO loop ---------------------------------------------------

def _small_bo(method, **kw):
    f = sf.Branin()
    fast = optimizers.GradientDescentParameters(
        num_multistarts=4, max_num_steps=10, max_num_restarts=1,
        num_steps_averaged=2, gamma=0.7, pre_mult=1.0,
        max_relative_change=0.5)
    return bayes_opt.BayesianOptimizer(
        objective_func=f, method=method, num_to_sample=2, num_mc=16,
        n_hypers=8, chain_length=30, burnin_steps=30, noisy=False,
        sgd_params=fast, verbose=False, **kw)


@pytest.mark.slow
def test_bo_loop_ei():
    bo = _small_bo("EI")
    history = bo.run(num_iterations=1)
    assert len(history) == 1
    h = history[0]
    assert h["suggested"].shape == (2, 2)
    assert np.isfinite(h["true_value"])
    assert h["voi"] >= -1e-9
    assert bo.model._data.num_sampled == 3 + 2


@pytest.mark.slow
def test_bo_loop_kg():
    bo = _small_bo("KG")
    history = bo.run(num_iterations=1)
    h = history[0]
    assert h["suggested"].shape == (2, 2)
    assert np.isfinite(h["true_value"])
    dom = bo.domain
    assert bool(jnp.all(dom.check_point_inside(jnp.asarray(
        h["suggested"]))))
