"""End-to-end d-KG (derivative observations) and continuous-fidelity KG."""

import jax.numpy as jnp
import numpy as np
import pytest

from cornell_moe_tpu import bayes_opt
from cornell_moe_tpu.ops import optimizers
from cornell_moe_tpu.utils import synthetic_functions as sf

FAST = optimizers.GradientDescentParameters(
    num_multistarts=4, max_num_steps=8, max_num_restarts=1,
    num_steps_averaged=2, gamma=0.7, pre_mult=1.0, max_relative_change=0.5)


@pytest.mark.slow
def test_dkg_end_to_end():
    """KG loop on Branin with observed gradients (d-KG, Wu et al. 2017)."""
    f = sf.BraninWithDerivatives()
    assert f.derivative_observations == (0, 1)
    bo = bayes_opt.BayesianOptimizer(
        objective_func=f, method="KG", num_to_sample=2, num_mc=8,
        n_hypers=8, chain_length=25, burnin_steps=25, noisy=False,
        sgd_params=FAST, verbose=False)
    history = bo.run(num_iterations=1)
    h = history[0]
    assert h["suggested"].shape == (2, 2)
    assert np.isfinite(h["true_value"])
    # the trained ensemble carries 3 observation channels per point
    assert bo.model.models.points_sampled_value.shape[-1] == 3
    assert bo.model.models.noise_variance.shape[-1] == 3


def test_derivative_observations_sharpen_model():
    """With gradient observations the GP fits Branin better from the same
    points (the d-KG value proposition)."""
    from cornell_moe_tpu.models import covariance as cov_mod
    from cornell_moe_tpu.models import gp

    f_plain = sf.Branin()
    rng = np.random.default_rng(0)
    x = np.column_stack([rng.uniform(0, 15, 12), rng.uniform(-5, 15, 12)])
    vals = np.stack([f_plain.evaluate_true(p) for p in x])   # (12, 3)
    xs = np.column_stack([rng.uniform(2, 13, 40),
                          rng.uniform(-3, 13, 40)])
    truth = np.array([f_plain.evaluate_true(p)[0] for p in xs])

    cov = cov_mod.make_covariance("matern_2.5", [2500.0, 3.0, 4.0])
    gp_v = gp.fit_gp(cov, jnp.asarray([1e-4]), jnp.asarray(x),
                     jnp.asarray(vals[:, :1]))
    gp_d = gp.fit_gp(cov, jnp.asarray([1e-4] * 3), jnp.asarray(x),
                     jnp.asarray(vals), derivatives=(0, 1))
    err_v = np.abs(np.asarray(
        gp.posterior_mean(gp_v, jnp.asarray(xs)))[:, 0] - truth).mean()
    err_d = np.abs(np.asarray(
        gp.posterior_mean(gp_d, jnp.asarray(xs)))[:, 0] - truth).mean()
    assert err_d < err_v


@pytest.mark.slow
def test_continuous_fidelity_end_to_end():
    f = sf.BraninFidelity()
    assert f._num_fidelity == 1
    bo = bayes_opt.BayesianOptimizer(
        objective_func=f, method="KG", num_to_sample=2, num_mc=8,
        n_hypers=8, chain_length=25, burnin_steps=25, noisy=False,
        sgd_params=FAST, verbose=False)
    history = bo.run(num_iterations=1)
    h = history[0]
    assert h["suggested"].shape == (2, 3)
    # suggested fidelities stay inside the fidelity bounds
    assert np.all(h["suggested"][:, 2] >= 0.05 - 1e-9)
    assert np.all(h["suggested"][:, 2] <= 1.0 + 1e-9)
    # capital accounting: max over batch of fidelity product
    assert np.isclose(h["capital"], np.max(h["suggested"][:, 2]))
    # recommendation pins fidelity to 1
    assert np.isclose(h["recommended"][2], 1.0)
    assert np.isfinite(h["true_value"])


@pytest.mark.slow
def test_dei_with_derivative_observations(rng=np.random.default_rng(0)):
    """d-EI: EI machinery over a derivative-observed GP (analytic + MC +
    multistart), the Wu et al. 2017 d-EI setting."""
    import jax
    from cornell_moe_tpu.acquisition import expected_improvement as ei
    from cornell_moe_tpu.models import covariance as cov_mod
    from cornell_moe_tpu.models import gp
    from cornell_moe_tpu.ops.domains import TensorProductDomain

    x = np.linspace(-1.8, 1.8, 7)[:, None]
    y = np.stack([np.sin(2 * x[:, 0]), 2 * np.cos(2 * x[:, 0])], axis=1)
    cov = cov_mod.make_covariance("matern_2.5", [1.0, 0.6])
    state = gp.fit_gp(cov, jnp.asarray([1e-4, 1e-4]), jnp.asarray(x),
                      jnp.asarray(y), derivatives=(0,))
    best = float(y[:, 0].min())

    a = float(ei.analytic_expected_improvement(
        state, jnp.asarray([[0.9]]), best))
    assert a >= 0 and np.isfinite(a)

    normals = ei.draw_normals(jax.random.PRNGKey(0), 20000, 1)
    mc = float(ei.monte_carlo_expected_improvement(
        state, jnp.asarray([[0.9]]), None, best, normals))
    np.testing.assert_allclose(mc, a, rtol=0.1, atol=2e-3)

    dom = TensorProductDomain.from_bounds([[-2.0, 2.0]])
    from cornell_moe_tpu.ops import optimizers
    params = optimizers.GradientDescentParameters(
        num_multistarts=6, max_num_steps=30, max_num_restarts=1,
        gamma=0.7, pre_mult=0.4)
    pt = ei.multistart_expected_improvement_optimization(
        jax.random.PRNGKey(1), state, dom, 1, params)
    assert pt.shape == (1, 1)
    assert float(ei.analytic_expected_improvement(state, pt, best)) > 0
