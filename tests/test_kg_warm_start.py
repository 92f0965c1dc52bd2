"""Warm-start KG path: closed-form union guard + carry-threaded multistart.

The warm path (knowledge_gradient_batch with inner_x0) replaces the
discretized-set seeding with (a) descents started from the previous outer
step's argmins and (b) a closed-form fantasy-mean guard at the union
points.  These tests pin its algebra to the cold path's machinery and
check the carry-threaded multistart optimizer converges to the same
suggestion quality as the cold path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cornell_moe_tpu.acquisition import knowledge_gradient as kg_mod
from cornell_moe_tpu.acquisition.expected_improvement import (
    draw_antithetic_normals)
from cornell_moe_tpu.models import covariance as cov_mod
from cornell_moe_tpu.models import gp as gp_mod
from cornell_moe_tpu.models import mcmc
from cornell_moe_tpu.ops import linalg, optimizers
from cornell_moe_tpu.ops.domains import RepeatedDomain, TensorProductDomain


@pytest.fixture
def rng():
    return np.random.default_rng(11)


INNER = optimizers.GradientDescentParameters(
    num_multistarts=1, max_num_steps=5, max_num_restarts=1,
    num_steps_averaged=0, gamma=0.0, pre_mult=0.5, max_relative_change=0.2)
INNER_WARM = optimizers.GradientDescentParameters(
    num_multistarts=1, max_num_steps=2, max_num_restarts=1,
    num_steps_averaged=0, gamma=0.0, pre_mult=0.5, max_relative_change=0.2)


def _gp_1d(rng, n=8):
    x = rng.uniform(-2, 2, size=(n, 1))
    y = np.sin(1.3 * x[:, 0]) + 0.05 * rng.standard_normal(n)
    cov = cov_mod.MaternNu2p5(jnp.asarray([1.0, 0.8]))
    state = gp_mod.fit_gp(cov, jnp.asarray([1e-3]), jnp.asarray(x),
                          jnp.asarray(y)[:, None])
    return state, x, y


def test_union_guard_matches_fantasy_mean_at_union(rng):
    """mu'(U) = mu_U + C z - noise_eff*beta must equal the generic
    fantasy-mean evaluation at the union coordinates exactly."""
    state, x, y = _gp_1d(rng)
    normals = draw_antithetic_normals(jax.random.PRNGKey(3), 8, 2)
    unions = jnp.asarray(rng.uniform(-2, 2, size=(3, 2, 1)))
    mu_u, chol_u, v, noise_eff = kg_mod._build_fantasy_model_batch(
        state, unions, ())
    betas = jnp.swapaxes(linalg.solve_triangular_small(
        chol_u, jnp.broadcast_to(normals.T, (3, 2, 8)), trans=True),
        -1, -2)
    cz = jnp.einsum("bij,mj->bim", chol_u, normals)
    closed = mu_u[:, :, None] + cz - \
        noise_eff[:, :, None] * jnp.swapaxes(betas, -1, -2)   # (B, q, M)

    # generic path: evaluate mu' at x = U_j for every draw
    for j in range(2):
        x_eval = jnp.broadcast_to(unions[:, j:j + 1, :], (3, 8, 1))
        generic = kg_mod._fantasy_mean_batch(
            state, x_eval, unions, v, betas, normals, (), 0)   # (B, M)
        np.testing.assert_allclose(np.asarray(closed[:, j, :]),
                                   np.asarray(generic), rtol=1e-9,
                                   atol=1e-11)


@pytest.mark.slow
def test_warm_equals_cold_when_started_at_cold_argmin(rng):
    """Warm KG seeded with the cold path's own descent endpoints and zero
    extra steps must agree with the cold value up to the guard set
    (union-only vs full seeds): warm <= cold + tiny slack, and close."""
    state, x, y = _gp_1d(rng)
    dom = TensorProductDomain.from_bounds([[-2.0, 2.0]])
    discrete = jnp.linspace(-2, 2, 9)[:, None]
    normals = draw_antithetic_normals(jax.random.PRNGKey(7), 16, 2)
    unions = jnp.asarray(rng.uniform(-2, 2, size=(4, 2, 1)))
    bsf = float(y.min())

    cold, x_star = kg_mod.knowledge_gradient_batch(
        state, unions, discrete, normals, dom, INNER, bsf,
        return_x_star=True)
    zero_steps = optimizers.GradientDescentParameters(
        num_multistarts=1, max_num_steps=0, max_num_restarts=1,
        num_steps_averaged=0, gamma=0.0, pre_mult=0.5,
        max_relative_change=0.2)
    warm = kg_mod.knowledge_gradient_batch(
        state, unions, discrete, normals, dom, zero_steps, bsf,
        inner_x0=x_star, warm_mode="pure")
    # same endpoints, so mu_star identical; the warm guard (union points)
    # is a subset of the cold guard (union points + discrete seeds), hence
    # warm KG <= cold KG, and equal when the descent endpoint wins
    assert np.all(np.asarray(warm) <= np.asarray(cold) + 1e-12)
    np.testing.assert_allclose(np.asarray(warm), np.asarray(cold),
                               rtol=0.05, atol=1e-3)


@pytest.mark.slow
def test_warm_multistart_matches_cold_suggestion(rng):
    """Carry-threaded multistart lands on a suggestion whose cold KG value
    matches the cold multistart's within MC/solver tolerance.

    "reseed" mode keeps the full seeding, so its trajectory quality must
    match the cold path tightly; "pure" mode drops the discrete seeds and
    is allowed a looser band (measured ~2-8 pct low on this toy).
    """
    state, x, y = _gp_1d(rng)
    hypers = np.asarray([[1.0, 0.7], [1.3, 0.9]])
    noises = np.full((2, 1), 1e-3)
    states = mcmc.fit_gp_ensemble("matern_2.5", hypers, noises, x,
                                  y[:, None])
    dom = TensorProductDomain.from_bounds([[-2.0, 2.0]])
    rep = RepeatedDomain(domain=dom, num_repeats=2)
    discrete = jnp.tile(jnp.linspace(-2, 2, 7)[None, :, None], (2, 1, 1))
    normals = draw_antithetic_normals(jax.random.PRNGKey(5), 16, 2)
    bsf = jnp.asarray([float(y.min())] * 2)
    outer = optimizers.GradientDescentParameters(
        num_multistarts=8, max_num_steps=12, max_num_restarts=2,
        num_steps_averaged=3, gamma=0.7, pre_mult=0.4,
        max_relative_change=0.5)
    starts = rep.generate_latin_hypercube_points(jax.random.PRNGKey(2), 8)

    def bvg_cold(pts):
        return kg_mod.knowledge_gradient_mcmc_batch_vg_carry(
            states, pts, discrete, normals, dom, INNER, bsf, 2)

    def mk_warm(mode):
        def bvg_warm(pts, carry):
            return kg_mod.knowledge_gradient_mcmc_batch_vg_carry(
                states, pts, discrete, normals, dom, INNER_WARM, bsf, 2,
                inner_x0=carry, warm_mode=mode)
        return bvg_warm

    def bvg(pts):
        return kg_mod.knowledge_gradient_mcmc_batch_value_and_grad(
            states, pts, discrete, normals, dom, INNER, bsf, 2)

    cold_res = optimizers.multistart_optimize_batched(
        bvg, rep, starts, outer)
    cold_val = float(cold_res.best_value)

    reseed_res = optimizers.multistart_optimize_batched_warm(
        bvg_cold, mk_warm("reseed"), rep, starts, outer)
    assert np.isfinite(float(reseed_res.best_value))
    np.testing.assert_allclose(float(reseed_res.best_value), cold_val,
                               rtol=0.03, atol=2e-3)

    pure_res = optimizers.multistart_optimize_batched_warm(
        bvg_cold, mk_warm("pure"), rep, starts, outer)
    assert np.isfinite(float(pure_res.best_value))
    assert float(pure_res.best_value) > 0.85 * cold_val - 1e-3


@pytest.mark.slow
def test_warm_multistart_chunked_matches_unchunked(rng):
    state, x, y = _gp_1d(rng)
    hypers = np.asarray([[1.0, 0.7]])
    noises = np.full((1, 1), 1e-3)
    states = mcmc.fit_gp_ensemble("matern_2.5", hypers, noises, x,
                                  y[:, None])
    dom = TensorProductDomain.from_bounds([[-2.0, 2.0]])
    rep = RepeatedDomain(domain=dom, num_repeats=2)
    discrete = jnp.linspace(-2, 2, 7)[None, :, None]
    normals = draw_antithetic_normals(jax.random.PRNGKey(5), 8, 2)
    bsf = jnp.asarray([float(y.min())])
    outer = optimizers.GradientDescentParameters(
        num_multistarts=6, max_num_steps=6, max_num_restarts=1,
        num_steps_averaged=0, gamma=0.7, pre_mult=0.4,
        max_relative_change=0.5)
    starts = rep.generate_latin_hypercube_points(jax.random.PRNGKey(9), 6)

    def bvg_cold(pts):
        return kg_mod.knowledge_gradient_mcmc_batch_vg_carry(
            states, pts, discrete, normals, dom, INNER, bsf, 2)

    def bvg_warm(pts, carry):
        return kg_mod.knowledge_gradient_mcmc_batch_vg_carry(
            states, pts, discrete, normals, dom, INNER_WARM, bsf, 2,
            inner_x0=carry)

    full = optimizers.multistart_optimize_batched_warm(
        bvg_cold, bvg_warm, rep, starts, outer)
    chunked = optimizers.multistart_optimize_batched_warm(
        bvg_cold, bvg_warm, rep, starts, outer, chunk_size=3)
    np.testing.assert_allclose(np.asarray(full.all_points),
                               np.asarray(chunked.all_points),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(full.all_values),
                               np.asarray(chunked.all_values),
                               rtol=1e-9, atol=1e-12)


@pytest.mark.slow
def test_warm_multistart_convergence_gate(rng):
    """conv_tol gating: with an unreachable tolerance the while-loop path
    is bit-identical to the fixed-depth scan path (incl. the circular
    Polyak buffer); with a realistic tolerance it still lands within the
    solver band of the ungated suggestion."""
    state, x, y = _gp_1d(rng)
    hypers = np.asarray([[1.0, 0.7], [1.3, 0.9]])
    noises = np.full((2, 1), 1e-3)
    states = mcmc.fit_gp_ensemble("matern_2.5", hypers, noises, x,
                                  y[:, None])
    dom = TensorProductDomain.from_bounds([[-2.0, 2.0]])
    rep = RepeatedDomain(domain=dom, num_repeats=2)
    discrete = jnp.tile(jnp.linspace(-2, 2, 7)[None, :, None], (2, 1, 1))
    normals = draw_antithetic_normals(jax.random.PRNGKey(5), 16, 2)
    bsf = jnp.asarray([float(y.min())] * 2)
    outer = optimizers.GradientDescentParameters(
        num_multistarts=8, max_num_steps=12, max_num_restarts=2,
        num_steps_averaged=3, gamma=0.7, pre_mult=0.4,
        max_relative_change=0.5)
    starts = rep.generate_latin_hypercube_points(jax.random.PRNGKey(2), 8)

    def bvg_cold(pts):
        return kg_mod.knowledge_gradient_mcmc_batch_vg_carry(
            states, pts, discrete, normals, dom, INNER, bsf, 2)

    def bvg_warm(pts, carry):
        return kg_mod.knowledge_gradient_mcmc_batch_vg_carry(
            states, pts, discrete, normals, dom, INNER_WARM, bsf, 2,
            inner_x0=carry, warm_mode="reseed")

    ungated = optimizers.multistart_optimize_batched_warm(
        bvg_cold, bvg_warm, rep, starts, outer, chunk_size=4)
    # conv_tol=0.0: norm >= 0 always -> gate can never fire; the
    # while-loop must reproduce the scan exactly (f64 CPU, bit-level)
    gated0 = optimizers.multistart_optimize_batched_warm(
        bvg_cold, bvg_warm, rep, starts, outer, chunk_size=4,
        conv_tol=0.0)
    np.testing.assert_array_equal(np.asarray(ungated.all_points),
                                  np.asarray(gated0.all_points))
    np.testing.assert_array_equal(np.asarray(ungated.all_values),
                                  np.asarray(gated0.all_values))
    # realistic tolerance: early exit allowed after the Polyak window
    # fills; the suggestion quality stays inside the solver band
    gated = optimizers.multistart_optimize_batched_warm(
        bvg_cold, bvg_warm, rep, starts, outer, chunk_size=4,
        conv_tol=5e-3)
    assert np.isfinite(float(gated.best_value))
    np.testing.assert_allclose(float(gated.best_value),
                               float(ungated.best_value),
                               rtol=0.05, atol=3e-3)


@pytest.mark.slow
def test_driver_mcmc_multistart_warm_matches_cold(rng):
    """The production suggest endpoint with warm_start=True (default)
    returns a suggestion of the same cold-evaluated quality as
    warm_start=False."""
    state, x, y = _gp_1d(rng)
    hypers = np.asarray([[1.0, 0.7], [1.3, 0.9]])
    noises = np.full((2, 1), 1e-3)
    states = mcmc.fit_gp_ensemble("matern_2.5", hypers, noises, x,
                                  y[:, None])
    dom = TensorProductDomain.from_bounds([[-2.0, 2.0]])
    discrete = jnp.tile(jnp.linspace(-2, 2, 7)[None, :, None], (2, 1, 1))
    params = optimizers.GradientDescentParameters(
        num_multistarts=6, max_num_steps=10, max_num_restarts=1,
        num_steps_averaged=3, gamma=0.7, pre_mult=0.4,
        max_relative_change=0.5)
    key = jax.random.PRNGKey(4)
    pts_warm = kg_mod.multistart_knowledge_gradient_mcmc_optimization(
        key, states, dom, 2, params, INNER, discrete,
        num_mc_iterations=16, warm_start=True)
    pts_cold = kg_mod.multistart_knowledge_gradient_mcmc_optimization(
        key, states, dom, 2, params, INNER, discrete,
        num_mc_iterations=16, warm_start=False)
    assert pts_warm.shape == (2, 1)
    assert bool(jnp.all(dom.check_point_inside(pts_warm)))

    normals = draw_antithetic_normals(jax.random.PRNGKey(1), 16, 2)
    bsf = jnp.asarray([float(y.min())] * 2)

    def cold_kg(pts):
        return float(kg_mod.knowledge_gradient_mcmc_batch(
            states, pts[None], discrete, normals, dom, INNER, bsf, 2)[0])

    v_warm, v_cold = cold_kg(pts_warm), cold_kg(pts_cold)
    assert v_warm > v_cold - 0.05 * abs(v_cold) - 2e-3, (v_warm, v_cold)


def _gp_ensemble_dkg(rng, n=10):
    """Derivative-observation ensemble (value + d/dx0 channels)."""
    x = rng.uniform(-2, 2, (n, 2))
    f = np.sin(1.3 * x[:, 0]) + 0.5 * x[:, 1] ** 2
    g0 = 1.3 * np.cos(1.3 * x[:, 0])
    y = np.stack([f, g0], axis=1)
    hypers = np.abs(rng.standard_normal((2, 3))) + 0.8
    noises = np.full((2, 2), 1e-3)
    states = mcmc.fit_gp_ensemble("matern_2.5", hypers, noises, x, y,
                                  derivatives=(0,))
    return states, x, f


@pytest.mark.slow
def test_dkg_warm_matches_cold_quality(rng):
    """Round-4 gate lift: the warm reseed carry covers derivative-sampling
    channels (d-KG) — the production endpoint with warm_start=True must
    land on a suggestion of the same cold-evaluated quality.

    The reference's d-KG passes the GP's derivative list into the KG
    state (gpp_python_knowledge_gradient_mcmc.cpp:120), so the fantasy
    covariance blocks span (1 + m) channels per union point."""
    states, x, f = _gp_ensemble_dkg(rng)
    dom = TensorProductDomain.from_bounds([[-2.0, 2.0], [-2.0, 2.0]])
    params = optimizers.GradientDescentParameters(
        num_multistarts=6, max_num_steps=8, max_num_restarts=1,
        num_steps_averaged=3, gamma=0.7, pre_mult=0.4,
        max_relative_change=0.5)
    discrete = jnp.asarray(rng.uniform(-2, 2, (2, 7, 2)))
    key = jax.random.PRNGKey(4)
    pts_warm = kg_mod.multistart_knowledge_gradient_mcmc_optimization(
        key, states, dom, 2, params, INNER, discrete,
        num_mc_iterations=16, derivatives_to_sample=(0,),
        warm_start=True, conv_tol=3e-3)
    pts_cold = kg_mod.multistart_knowledge_gradient_mcmc_optimization(
        key, states, dom, 2, params, INNER, discrete,
        num_mc_iterations=16, derivatives_to_sample=(0,),
        warm_start=False)
    assert pts_warm.shape == (2, 2)
    normals = draw_antithetic_normals(jax.random.PRNGKey(1), 16, 4)
    bsf = jnp.asarray([float(f.min())] * 2)

    def cold_kg(p):
        return float(kg_mod.knowledge_gradient_mcmc_batch(
            states, p[None], discrete, normals, dom, INNER, bsf, 2,
            derivatives_to_sample=(0,))[0])

    v_warm, v_cold = cold_kg(pts_warm), cold_kg(pts_cold)
    assert v_warm > v_cold - 0.05 * abs(v_cold) - 2e-3, (v_warm, v_cold)


@pytest.mark.slow
def test_cfkg_warm_matches_cold_quality(rng):
    """Round-4 gate lift: the warm reseed carry covers fidelity dims
    (cf-KG, gpp_knowledge_gradient_mcmc_optimization.cpp:87-104)."""
    x = rng.uniform(0, 1, (10, 2))        # last coord = fidelity
    y = (np.sin(3 * x[:, 0]) * (0.5 + 0.5 * x[:, 1]))[:, None]
    hypers = np.abs(rng.standard_normal((2, 3))) + 0.8
    states = mcmc.fit_gp_ensemble("matern_2.5", hypers,
                                  np.full((2, 1), 1e-3), x, y)
    dom = TensorProductDomain.from_bounds([[0.0, 1.0], [0.05, 1.0]])
    params = optimizers.GradientDescentParameters(
        num_multistarts=6, max_num_steps=8, max_num_restarts=1,
        num_steps_averaged=3, gamma=0.7, pre_mult=0.4,
        max_relative_change=0.5)
    discrete = jnp.asarray(rng.uniform(0, 1, (2, 7, 1)))
    key = jax.random.PRNGKey(4)
    pw = kg_mod.multistart_knowledge_gradient_mcmc_optimization(
        key, states, dom, 2, params, INNER, discrete,
        num_mc_iterations=16, num_fidelity=1, warm_start=True,
        conv_tol=3e-3)
    pc = kg_mod.multistart_knowledge_gradient_mcmc_optimization(
        key, states, dom, 2, params, INNER, discrete,
        num_mc_iterations=16, num_fidelity=1, warm_start=False)
    assert pw.shape == (2, 2)
    normals = draw_antithetic_normals(jax.random.PRNGKey(1), 16, 2)
    bsf = jnp.asarray([float(y.min())] * 2)
    inner_dom = TensorProductDomain(bounds=dom.bounds[:1])

    def cold_kg(p):
        return float(kg_mod.knowledge_gradient_mcmc_batch(
            states, p[None], discrete, normals, inner_dom, INNER, bsf, 2,
            num_fidelity=1)[0])

    v_warm, v_cold = cold_kg(pw), cold_kg(pc)
    assert v_warm > v_cold - 0.05 * abs(v_cold) - 2e-3, (v_warm, v_cold)
