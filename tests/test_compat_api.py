"""Compatibility-layer tests: the reference class surface works end to end
and matches the functional core."""

import jax
import numpy as np
import pytest

from cornell_moe_tpu.compat import covariance as cov_c
from cornell_moe_tpu.compat import domain as dom_c
from cornell_moe_tpu.compat import expected_improvement as ei_c
from cornell_moe_tpu.compat import expected_improvement_mcmc as eim_c
from cornell_moe_tpu.compat import gaussian_process as gp_c
from cornell_moe_tpu.compat import knowledge_gradient as kg_c
from cornell_moe_tpu.compat import knowledge_gradient_mcmc as kgm_c
from cornell_moe_tpu.compat import log_likelihood as lik_c
from cornell_moe_tpu.compat import misc, optimization as opt_c
from cornell_moe_tpu.compat.repeated_domain import RepeatedDomain
from cornell_moe_tpu.utils import constant as const
from cornell_moe_tpu.utils.data_containers import (HistoricalData,
                                                   SamplePoint)
from cornell_moe_tpu.utils.geometry import (ClosedInterval,
                                            generate_grid_points,
                                            generate_latin_hypercube_points)
from cornell_moe_tpu.utils.rng import RandomnessSourceContainer
from cornell_moe_tpu.exceptions import SingularMatrixError


def _make_gp(rng, n=9, kernel=cov_c.MaternNu2p5):
    cov = kernel([1.0, 0.7])
    data = HistoricalData(dim=1)
    x = np.sort(rng.random(n) * 4 - 2)[:, None]
    y = np.sin(2 * x[:, 0])
    data.append_historical_data(x, y)
    return gp_c.GaussianProcess(cov, [1e-4], data), x, y


def test_covariance_compat(rng):
    cov = cov_c.SquareExponential([2.0, 0.5, 1.5])
    assert cov.num_hyperparameters == 3
    np.testing.assert_allclose(cov.hyperparameters, [2.0, 0.5, 1.5])
    x, y = rng.standard_normal(2), rng.standard_normal(2)
    assert cov.covariance(x, x) == pytest.approx(2.0)
    assert cov.grad_covariance(x, y).shape == (2,)
    assert cov.hyperparameter_grad_covariance(x, y).shape == (3,)
    cov.set_hyperparameters([1.0, 1.0, 1.0])
    assert cov.covariance(x, x) == pytest.approx(1.0)


def test_domain_compat():
    dom = dom_c.TensorProductDomain([ClosedInterval(0.0, 1.0),
                                     ClosedInterval(-1.0, 1.0)])
    assert dom.dim == 2
    assert dom._domain_type == const.TENSOR_PRODUCT_DOMAIN_TYPE
    pts = dom.generate_latin_hypercube_points(20)
    assert pts.shape == (20, 2)
    assert all(dom.check_point_inside(p) for p in pts)
    step = dom.compute_update_restricted_to_domain(
        0.5, np.array([0.9, 0.0]), np.array([0.5, 0.1]))
    assert (np.array([0.9, 0.0]) + step <= [1.0, 1.0]).all()

    sdom = dom_c.SimplexIntersectTensorProductDomain(
        [ClosedInterval(0.0, 1.0)] * 2)
    assert not sdom.check_point_inside(np.array([0.9, 0.9]))


def test_repeated_domain_compat():
    base = dom_c.TensorProductDomain([ClosedInterval(0.0, 1.0)] * 2)
    rep = RepeatedDomain(3, base)
    pts = rep.generate_latin_hypercube_points(4)
    assert pts.shape == (4, 3, 2)
    assert rep.check_point_inside(pts[0])


@pytest.mark.slow
def test_gaussian_process_compat_surface(rng):
    gp, x, y = _make_gp(rng)
    assert gp.dim == 1 and gp.num_sampled == 9
    pts = np.array([[0.3], [0.9]])
    mu = gp.compute_mean_of_points(pts)
    assert mu.shape == (2,)
    var = gp.compute_variance_of_points(pts)
    assert var.shape == (2, 2)
    chol = gp.compute_cholesky_variance_of_points(pts)
    np.testing.assert_allclose(chol @ chol.T, var, atol=1e-10)
    grad_mu = gp.compute_grad_mean_of_points(pts)
    assert grad_mu.shape == (2, 1, 1)
    grad_var = gp.compute_grad_variance_of_points(pts)
    assert grad_var.shape == (2, 2, 2, 1)
    grad_chol = gp.compute_grad_cholesky_variance_of_points(pts)
    assert grad_chol.shape == (2, 2, 2, 1)

    cov_copy, data_copy = gp.get_core_data_copy()
    assert data_copy.num_sampled == 9

    gp.add_sampled_points([SamplePoint(np.array([1.7]), [0.5], 0.0)])
    assert gp.num_sampled == 10

    v = gp.sample_point_from_gp(np.array([0.1]), noise_variance=0.01)
    assert np.isfinite(v)

    optima = gp.sample_global_optima(3, domain_bounds=[[-2.0, 2.0]],
                                     num_grid=30, n_features=200)
    assert optima.shape == (3, 1)


def test_gaussian_process_singular_raises(rng):
    cov = cov_c.SquareExponential([1.0, 1.0])
    data = HistoricalData(dim=1)
    # duplicate points, zero noise -> singular training covariance
    data.append_historical_data(np.array([[0.5], [0.5]]),
                                np.array([1.0, 1.0]))
    with pytest.raises(SingularMatrixError):
        gp_c.GaussianProcess(cov, [0.0], data)


@pytest.mark.slow
def test_expected_improvement_compat(rng):
    gp, x, y = _make_gp(rng)
    ei = ei_c.ExpectedImprovement(gp, points_to_sample=[[0.4]],
                                  num_mc_iterations=500)
    v_analytic = ei.compute_expected_improvement()
    v_mc = ei.compute_expected_improvement(force_monte_carlo=True)
    assert v_analytic >= 0
    np.testing.assert_allclose(v_mc, v_analytic, rtol=0.4, atol=5e-3)
    g = ei.compute_grad_expected_improvement()
    assert g.shape == (1, 1)

    dom = dom_c.TensorProductDomain([ClosedInterval(-2.0, 2.0)])
    params = opt_c.GradientDescentParameters(
        num_multistarts=4, max_num_steps=20, max_num_restarts=1,
        gamma=0.7, pre_mult=0.4)
    optimizer = opt_c.GradientDescentOptimizer(dom, ei, params)
    best = ei_c.multistart_expected_improvement_optimization(
        optimizer, num_to_sample=1)
    assert best.shape == (1, 1)
    ei.set_current_point(best)
    assert ei.compute_expected_improvement() > 0

    vals = ei.evaluate_at_point_list(np.linspace(-2, 2, 7)[:, None])
    assert vals.shape == (7,)


@pytest.mark.slow
def test_posterior_mean_and_kg_compat(rng):
    gp, x, y = _make_gp(rng, n=8)
    ps = kg_c.PosteriorMean(gp)
    ps.set_current_point([0.2])
    v = ps.compute_posterior_mean()
    mu = gp.compute_mean_of_points(np.array([[0.2]]))[0]
    np.testing.assert_allclose(v, -mu, rtol=1e-10)
    g = ps.compute_grad_posterior_mean()
    assert g.shape == (1,)

    inner_params = opt_c.GradientDescentParameters(
        num_multistarts=1, max_num_steps=10, max_num_restarts=1,
        gamma=0.7, pre_mult=0.3)
    discrete = np.linspace(-2, 2, 8)[:, None]
    kg = kg_c.KnowledgeGradient(gp, inner_params, discrete,
                                points_to_sample=[[0.5]],
                                num_mc_iterations=16)
    v = kg.compute_knowledge_gradient()
    assert np.isfinite(v)
    g = kg.compute_grad_knowledge_gradient()
    assert g.shape == (1, 1)

    dom = dom_c.TensorProductDomain([ClosedInterval(-2.0, 2.0)])
    ps_opt = opt_c.GradientDescentOptimizer(dom, ps, inner_params)
    pt = kg_c.posterior_mean_optimization(
        ps_opt, initial_guess=np.linspace(-2, 2, 10)[:, None])
    assert pt.shape == (1,)

    params = opt_c.GradientDescentParameters(
        num_multistarts=3, max_num_steps=6, max_num_restarts=1,
        gamma=0.7, pre_mult=0.4)
    kg_opt = opt_c.GradientDescentOptimizer(dom, kg, params)
    best = kg_c.multistart_knowledge_gradient_optimization(kg_opt)
    assert best.shape == (1, 1)


@pytest.mark.slow
def test_mcmc_classes_compat(rng):
    data = HistoricalData(dim=1)
    x = np.sort(rng.random(8) * 4 - 2)[:, None]
    y = np.sin(2 * x[:, 0])
    data.append_historical_data(x, y)
    hypers = np.abs(rng.standard_normal((3, 2))) + 0.6
    noises = np.full((3, 1), 1e-3)
    gp_mcmc = kgm_c.GaussianProcessMCMC(hypers, noises, data)
    assert gp_mcmc.num_mcmc == 3

    ps = kgm_c.PosteriorMeanMCMC(gp_mcmc)
    ps.set_current_point([0.3])
    assert np.isfinite(ps.compute_objective_function())
    assert ps.compute_grad_objective_function().shape == (1,)

    inner_params = opt_c.GradientDescentParameters(
        num_multistarts=1, max_num_steps=8, max_num_restarts=1,
        gamma=0.7, pre_mult=0.3)
    discrete_list = [np.linspace(-2, 2, 6)[:, None]] * 3
    kg = kgm_c.KnowledgeGradientMCMC(
        gp_mcmc, num_fidelity=0, inner_optimizer=inner_params,
        discrete_pts_list=discrete_list, num_to_sample=1,
        num_mc_iterations=8)
    v = kg.compute_knowledge_gradient_mcmc()
    assert np.isfinite(v)

    ei = eim_c.ExpectedImprovementMCMC(gp_mcmc, num_to_sample=1,
                                       num_mc_iterations=200)
    ei.set_current_point([[0.7]])
    assert ei.compute_expected_improvement_mcmc() >= 0

    dom = dom_c.TensorProductDomain([ClosedInterval(-2.0, 2.0)])
    params = opt_c.GradientDescentParameters(
        num_multistarts=3, max_num_steps=6, max_num_restarts=1,
        gamma=0.7, pre_mult=0.4)
    opt = opt_c.GradientDescentOptimizer(dom, ei, params)
    best = eim_c.multistart_expected_improvement_mcmc_optimization(opt)
    assert best.shape == (1, 1)

    kg_opt = opt_c.GradientDescentOptimizer(dom, kg, params)
    best = kgm_c.multistart_knowledge_gradient_mcmc_optimization(kg_opt)
    assert best.shape == (1, 1)


def test_log_likelihood_compat(rng):
    cov = cov_c.MaternNu2p5([1.0, 1.0])
    data = HistoricalData(dim=1)
    x = np.sort(rng.random(9) * 4 - 2)[:, None]
    y = np.sin(2 * x[:, 0]) + 0.05 * rng.standard_normal(9)
    data.append_historical_data(x, y)

    lml = lik_c.GaussianProcessLogMarginalLikelihood(cov, data,
                                                     noise_variance=[1e-2])
    v0 = lml.compute_log_likelihood()
    assert np.isfinite(v0)
    g = lml.compute_grad_log_likelihood()
    assert g.shape == (2,)

    loo = lik_c.GaussianProcessLeaveOneOutLogLikelihood(
        cov_c.MaternNu2p5([1.0, 1.0]), data, noise_variance=[1e-2])
    assert np.isfinite(loo.compute_log_likelihood())

    vals = lik_c.evaluate_log_likelihood_at_hyperparameter_list(
        lml, np.abs(rng.standard_normal((4, 2))) + 0.5)
    assert vals.shape == (4,)

    params = opt_c.GradientDescentParameters(
        num_multistarts=4, max_num_steps=40, max_num_restarts=2,
        gamma=0.7, pre_mult=0.2, max_relative_change=0.5)
    log_dom = dom_c.TensorProductDomain([ClosedInterval(-3.0, 3.0)] * 2)
    optimizer = opt_c.GradientDescentOptimizer(log_dom, lml, params)
    best = lik_c.multistart_hyperparameter_optimization(optimizer)
    assert best.shape == (2,)
    lml.set_hyperparameters(best)
    assert lml.compute_log_likelihood() >= v0 - 1e-6


def test_misc_utilities():
    a = np.arange(6.0).reshape(2, 3)
    flat = misc.cppify(a)
    assert flat.shape == (6,)
    np.testing.assert_allclose(misc.uncppify(flat, (2, 3)), a)
    assert const.SQUARE_EXPONENTIAL_COVARIANCE_TYPE in \
        misc.COVARIANCE_TYPES_TO_CLASSES
    assert const.LOG_MARGINAL_LIKELIHOOD in \
        misc.LOG_LIKELIHOOD_TYPES_TO_CLASSES

    class Thing(misc.EqualityComparisonMixin):
        def __init__(self, v):
            self.v = v

    assert Thing(1) == Thing(1)
    assert Thing(1) != Thing(2)


def test_geometry_utils():
    iv = ClosedInterval(0.0, 2.0)
    assert iv.length == 2.0
    assert iv.is_inside(1.0) and not iv.is_inside(3.0)
    pts = generate_latin_hypercube_points(10, [(0, 1), (5, 6)], seed=0)
    assert pts.shape == (10, 2)
    assert (pts[:, 1] >= 5).all()
    grid = generate_grid_points([3, 4], [(0, 1), (0, 1)])
    assert grid.shape == (12, 2)


def test_randomness_source_container():
    rsc = RandomnessSourceContainer(num_normal_rng_streams=4, seed=7)
    k1 = rsc.uniform_key()
    k2 = rsc.uniform_key()
    assert not np.array_equal(np.asarray(k1), np.asarray(k2))
    rsc.reset_uniform_generator_seed()
    k1b = rsc.uniform_key()
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k1b))
    ks = rsc.normal_keys()
    assert ks.shape[0] == 4


def test_scipy_optimizers(rng):
    gp, x, y = _make_gp(rng)
    ei = ei_c.ExpectedImprovement(gp, points_to_sample=[[0.0]])
    dom = dom_c.TensorProductDomain([ClosedInterval(-2.0, 2.0)])
    lbfgs = opt_c.LBFGSBOptimizer(dom, ei, opt_c.LBFGSBParameters(
        approx_grad=True, max_func_evals=50, max_metric_correc=10,
        factr=1e7, pgtol=1e-5, epsilon=1e-8))
    x_opt = lbfgs.optimize()
    assert np.isfinite(ei.compute_expected_improvement())
    results = opt_c.multistart_optimize(lbfgs, num_multistarts=3)
    assert results.shape[0] == 3


def test_estimation_policy_classes(rng):
    from cornell_moe_tpu.compat.estimation_policies import (
        ConstantLiarEstimationPolicy, KrigingBelieverEstimationPolicy)
    from cornell_moe_tpu.utils import constant as const

    gp, x, y = _make_gp(rng)
    cl = ConstantLiarEstimationPolicy.from_method(
        const.CONSTANT_LIAR_MAX, y)
    val, noise = cl.compute_estimate(gp, np.array([0.1]))
    assert val == y.max()
    assert noise == const.DEFAULT_CONSTANT_LIAR_LIE_NOISE_VARIANCE

    kb = KrigingBelieverEstimationPolicy(std_deviation_coef=1.0)
    val, noise = kb.compute_estimate(gp, np.array([[0.1]]))
    mu = gp.compute_mean_of_points(np.array([[0.1]]))[0]
    assert float(val) > mu          # mean + 1 sigma
    assert noise == const.DEFAULT_KRIGING_NOISE_VARIANCE


@pytest.mark.slow
def test_mcmc_point_list_evaluators(rng):
    """evaluate_at_point_list on the MCMC classes
    (evaluate_EI_mcmc_at_point_list / evaluate_KG_mcmc_at_point_list
    counterparts)."""
    data = HistoricalData(dim=1)
    x = np.sort(rng.random(8) * 4 - 2)[:, None]
    y = np.sin(2 * x[:, 0])
    data.append_historical_data(x, y)
    hypers = np.abs(rng.standard_normal((3, 2))) + 0.6
    noises = np.full((3, 1), 1e-3)
    gp_mcmc = kgm_c.GaussianProcessMCMC(hypers, noises, data)

    ei = eim_c.ExpectedImprovementMCMC(gp_mcmc, num_to_sample=1,
                                       num_mc_iterations=64)
    cand = np.linspace(-2, 2, 5)[:, None]
    vals = ei.evaluate_at_point_list(cand)
    assert vals.shape == (5,)
    # matches point-by-point objective evaluation
    for i, p in enumerate(cand):
        ei.set_current_point(p[None])
        np.testing.assert_allclose(
            vals[i], ei.compute_expected_improvement_mcmc(), rtol=1e-10)

    inner_params = opt_c.GradientDescentParameters(
        num_multistarts=1, max_num_steps=4, max_num_restarts=1,
        gamma=0.7, pre_mult=0.3)
    discrete_list = [np.linspace(-2, 2, 5)[:, None]] * 3
    kg = kgm_c.KnowledgeGradientMCMC(
        gp_mcmc, num_fidelity=0, inner_optimizer=inner_params,
        discrete_pts_list=discrete_list, num_to_sample=1,
        num_mc_iterations=8)
    kvals = kg.evaluate_at_point_list(cand[:3])
    assert kvals.shape == (3,)
    kg.set_current_point(cand[1][None])
    np.testing.assert_allclose(
        kvals[1], kg.compute_knowledge_gradient_mcmc(), rtol=1e-10)


def test_compat_heuristic_ei_export(rng):
    from cornell_moe_tpu.compat.estimation_policies import (
        ConstantLiarEstimationPolicy)

    gp, x, y = _make_gp(rng)
    ei = ei_c.ExpectedImprovement(gp, num_mc_iterations=64)
    dom = dom_c.TensorProductDomain([ClosedInterval(-2.0, 2.0)])
    params = opt_c.GradientDescentParameters(
        num_multistarts=2, max_num_steps=4, max_num_restarts=1,
        gamma=0.7, pre_mult=0.3)
    opt = opt_c.GradientDescentOptimizer(dom, ei, params)
    status = {}
    pts = ei_c.heuristic_expected_improvement_optimization(
        opt, 3, estimation_policy=ConstantLiarEstimationPolicy(
            lie_value=float(y.min())), status=status)
    assert pts.shape == (3, 1)
    assert np.all(pts >= -2.0) and np.all(pts <= 2.0)
    assert status["heuristic_ei_found_update"]
