"""GP posterior tests: parity with a numpy reference GP, FD pings of
gradients, derivative-observation interpolation, fantasy-update identity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cornell_moe_tpu.models import covariance as cov_mod
from cornell_moe_tpu.models import gp
from reference_impl import central_difference, gp_posterior, se_kernel


def _simple_gp(rng, n=10, dim=2, noise=1e-3, kernel="square_exponential"):
    hypers = np.concatenate([[1.3], 0.6 + 0.4 * rng.random(dim)])
    cov = cov_mod.make_covariance(kernel, hypers)
    x = rng.standard_normal((n, dim))
    y = np.sin(x.sum(axis=1))
    state = gp.fit_gp(cov, jnp.asarray([noise]), jnp.asarray(x),
                      jnp.asarray(y)[:, None])
    return state, hypers, x, y, noise


def test_posterior_matches_numpy_reference(rng):
    state, hypers, x, y, noise = _simple_gp(rng)
    xt = rng.standard_normal((4, 2))
    mu_ref, cov_ref = gp_posterior(se_kernel, hypers[0], hypers[1:], x, y,
                                   noise, xt, mean=float(np.mean(y)))
    mu = np.asarray(gp.posterior_mean(state, jnp.asarray(xt)))[:, 0]
    var = np.asarray(gp.posterior_variance(state, jnp.asarray(xt)))
    np.testing.assert_allclose(mu, mu_ref, rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(var, cov_ref, rtol=1e-8, atol=1e-10)


def test_posterior_interpolates_training_data(rng):
    state, hypers, x, y, _ = _simple_gp(rng, noise=1e-12)
    mu = np.asarray(gp.posterior_mean(state, jnp.asarray(x)))[:, 0]
    np.testing.assert_allclose(mu, y, rtol=1e-6, atol=1e-7)
    var = np.asarray(gp.posterior_variance(state, jnp.asarray(x)))
    assert np.all(np.diag(var) < 1e-6)


def test_posterior_covariance_cross_consistency(rng):
    state, *_ = _simple_gp(rng)
    a = jnp.asarray(rng.standard_normal((3, 2)))
    b = jnp.asarray(rng.standard_normal((5, 2)))
    cab = np.asarray(gp.posterior_covariance(state, a, b))
    cba = np.asarray(gp.posterior_covariance(state, b, a))
    np.testing.assert_allclose(cab, cba.T, rtol=1e-10, atol=1e-12)
    caa = np.asarray(gp.posterior_covariance(state, a, a))
    vaa = np.asarray(gp.posterior_variance(state, a))
    np.testing.assert_allclose(caa, vaa, rtol=1e-10, atol=1e-12)


def test_grad_posterior_mean_ping(rng):
    state, *_ = _simple_gp(rng)
    pts = rng.standard_normal((2, 2))

    def mean_at(flat):
        p = jnp.asarray(flat.reshape(2, 2))
        return float(gp.posterior_mean(state, p)[0, 0])

    fd = central_difference(mean_at, pts.reshape(-1)).reshape(2, 2)
    jac = np.asarray(gp.grad_posterior_mean(state, jnp.asarray(pts)))
    # jac shape (q, 1, q, dim); mu_0 wrt all points
    np.testing.assert_allclose(jac[0, 0], fd, rtol=1e-6, atol=1e-9)


def test_grad_posterior_variance_ping(rng):
    state, *_ = _simple_gp(rng)
    pts = rng.standard_normal((2, 2))

    def var_entry(flat):
        p = jnp.asarray(flat.reshape(2, 2))
        return float(gp.posterior_variance(state, p)[0, 1])

    fd = central_difference(var_entry, pts.reshape(-1)).reshape(2, 2)
    jac = np.asarray(gp.grad_posterior_variance(state, jnp.asarray(pts)))
    np.testing.assert_allclose(jac[0, 1], fd, rtol=1e-6, atol=1e-9)


def test_grad_cholesky_variance_ping(rng):
    state, *_ = _simple_gp(rng)
    pts = rng.standard_normal((2, 2))

    def chol_entry(flat):
        p = jnp.asarray(flat.reshape(2, 2))
        return float(gp.posterior_cholesky_variance(state, p)[1, 0])

    fd = central_difference(chol_entry, pts.reshape(-1)).reshape(2, 2)
    jac = np.asarray(
        gp.grad_posterior_cholesky_variance(state, jnp.asarray(pts)))
    np.testing.assert_allclose(jac[1, 0], fd, rtol=1e-5, atol=1e-8)


@pytest.mark.parametrize("kernel", ["square_exponential", "matern_2.5"])
def test_derivative_observations_interpolate(kernel, rng):
    """With gradient observations and tiny noise, the posterior reproduces
    both observed values and observed partials at the training points."""
    dim, n = 2, 8
    derivs = (0, 1)
    hypers = np.concatenate([[1.0], 0.8 + 0.2 * rng.random(dim)])
    cov = cov_mod.make_covariance(kernel, hypers)
    x = rng.standard_normal((n, dim))

    def f(p):
        return np.sin(p[0]) * np.cos(p[1])

    def grad_f(p):
        return np.array([np.cos(p[0]) * np.cos(p[1]),
                         -np.sin(p[0]) * np.sin(p[1])])

    y = np.stack([np.array([f(p), *grad_f(p)]) for p in x])
    state = gp.fit_gp(cov, jnp.asarray([1e-10, 1e-10, 1e-10]),
                      jnp.asarray(x), jnp.asarray(y), derivatives=derivs)
    mu = np.asarray(gp.posterior_mean(state, jnp.asarray(x),
                                      derivatives_to_sample=derivs))
    np.testing.assert_allclose(mu, y, rtol=1e-4, atol=1e-5)

    # conditioning on gradients shrinks predictive variance vs values-only
    state_v = gp.fit_gp(cov, jnp.asarray([1e-10]), jnp.asarray(x),
                        jnp.asarray(y[:, 0])[:, None])
    xt = jnp.asarray(rng.standard_normal((5, dim)) * 0.5)
    var_with = np.diag(np.asarray(gp.posterior_variance(state, xt)))
    var_wo = np.diag(np.asarray(gp.posterior_variance(state_v, xt)))
    assert np.all(var_with <= var_wo + 1e-9)


def test_add_sampled_points_matches_refit(rng):
    state, hypers, x, y, noise = _simple_gp(rng, n=7)
    x_new = rng.standard_normal((3, 2))
    y_new = np.cos(x_new.sum(axis=1))

    updated = gp.add_sampled_points(state, jnp.asarray(x_new),
                                    jnp.asarray(y_new)[:, None])
    refit = gp.fit_gp(state.covariance, state.noise_variance,
                      jnp.asarray(np.vstack([x, x_new])),
                      jnp.asarray(np.concatenate([y, y_new]))[:, None])

    xt = jnp.asarray(rng.standard_normal((4, 2)))
    np.testing.assert_allclose(np.asarray(gp.posterior_mean(updated, xt)),
                               np.asarray(gp.posterior_mean(refit, xt)),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(
        np.asarray(gp.posterior_variance(updated, xt)),
        np.asarray(gp.posterior_variance(refit, xt)), rtol=1e-8, atol=1e-11)


def test_fantasy_update_vector_identity(rng):
    """mu'(a) = mu(a) + sigma_tilde(a) @ z  must equal the posterior mean of
    the GP refit with the fantasy observations  y_U = mu_U + C z."""
    state, hypers, x, y, noise = _simple_gp(rng, n=9)
    u = jnp.asarray(rng.standard_normal((3, 2)))   # union points
    a = jnp.asarray(rng.standard_normal((4, 2)))   # eval points

    mu_u = gp.posterior_mean(state, u)[:, 0]
    var_u = gp.posterior_variance(state, u)
    chol_u = jnp.linalg.cholesky(
        var_u + state.noise_variance[0] * jnp.eye(3))
    z = jnp.asarray(rng.standard_normal(3))
    y_u = mu_u + chol_u @ z

    sigma_tilde = gp.fantasy_update_vector(state, u, a, chol_u)
    mu_fast = gp.posterior_mean(state, a)[:, 0] + sigma_tilde @ z

    fantasy = gp.add_sampled_points(state, u, y_u[:, None],
                                    update_mean=False)
    mu_slow = gp.posterior_mean(fantasy, a)[:, 0]
    np.testing.assert_allclose(np.asarray(mu_fast), np.asarray(mu_slow),
                               rtol=1e-8, atol=1e-10)


def test_sampling_moments(rng):
    state, *_ = _simple_gp(rng, n=6, noise=1e-4)
    pts = jnp.asarray(rng.standard_normal((3, 2)))
    keys = jax.random.split(jax.random.PRNGKey(0), 4000)
    draws = jax.vmap(
        lambda k: gp.sample_points_from_gp(k, state, pts))(keys)
    mu = np.asarray(gp.posterior_mean(state, pts))[:, 0]
    var = np.diag(np.asarray(gp.posterior_variance(state, pts)))
    np.testing.assert_allclose(np.asarray(draws.mean(0)), mu, atol=0.08)
    np.testing.assert_allclose(np.asarray(draws.var(0)), var, rtol=0.15,
                               atol=0.02)


def test_best_so_far_helpers(rng):
    state, _, x, y, _ = _simple_gp(rng)
    assert np.isclose(float(state.best_observed_value), y.min())
    np.testing.assert_allclose(np.asarray(state.best_observed_point),
                               x[np.argmin(y)])
