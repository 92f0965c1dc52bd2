"""KG tests: fantasy-weight identity, nonnegativity, FD gradient ping,
brute-force parity on a tiny case, MCMC averaging, fidelity cost."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cornell_moe_tpu.acquisition import knowledge_gradient as kg_mod
from cornell_moe_tpu.acquisition.expected_improvement import (
    draw_antithetic_normals)
from cornell_moe_tpu.models import covariance as cov_mod
from cornell_moe_tpu.models import gp, mcmc
from cornell_moe_tpu.ops import optimizers
from cornell_moe_tpu.ops.domains import TensorProductDomain
from reference_impl import central_difference

INNER = optimizers.GradientDescentParameters(
    num_multistarts=1, max_num_steps=25, max_num_restarts=1,
    gamma=0.7, pre_mult=0.5, max_relative_change=0.7)


def _gp_1d(rng, n=8, noise=1e-3):
    cov = cov_mod.make_covariance("matern_2.5", [1.0, 0.7])
    x = np.sort(rng.random(n) * 4 - 2)[:, None]
    y = np.sin(2 * x[:, 0])
    return gp.fit_gp(cov, jnp.asarray([noise]), jnp.asarray(x),
                     jnp.asarray(y)[:, None]), x, y


def test_fantasy_model_reproduces_fantasy_gp(rng):
    """mu'_z from the weight trick == posterior mean of a refit GP."""
    state, x, y = _gp_1d(rng)
    union = jnp.asarray([[0.3], [1.4]])
    model = kg_mod._build_fantasy_model(state, union)
    z = jnp.asarray(rng.standard_normal(2))

    from cornell_moe_tpu.ops import linalg
    beta = linalg.solve_triangular(model.chol_union, z, lower=True,
                                   trans=True)
    alpha = state.K_inv_y - model.v @ z
    mu_fn = kg_mod._fantasy_mean_fn(state, model, alpha, beta, (), 0)

    y_u = model.mu_union + model.chol_union @ z
    fantasy = gp.add_sampled_points(state, union, y_u[:, None],
                                    update_mean=False)
    for xt in [-1.2, 0.05, 0.77, 1.9]:
        fast = float(mu_fn(jnp.asarray([xt])))
        slow = float(gp.posterior_mean(fantasy, jnp.asarray([[xt]]))[0, 0])
        np.testing.assert_allclose(fast, slow, rtol=1e-7, atol=1e-9)


def test_kg_nonnegative_and_finite(rng):
    state, x, y = _gp_1d(rng)
    dom = TensorProductDomain.from_bounds([[-2.0, 2.0]])
    discrete = jnp.linspace(-2, 2, 12)[:, None]
    normals = draw_antithetic_normals(jax.random.PRNGKey(0), 64, 2)
    val = float(kg_mod.knowledge_gradient(
        state, jnp.asarray([[0.5], [-0.9]]), discrete, normals, dom,
        INNER, float(y.min())))
    assert np.isfinite(val)
    assert val > -1e-6


@pytest.mark.slow
def test_kg_matches_bruteforce_discrete(rng):
    """With GD disabled (0 steps), KG must equal the brute-force computation
    over the discretized set done in plain numpy."""
    state, x, y = _gp_1d(rng, n=6)
    dom = TensorProductDomain.from_bounds([[-2.0, 2.0]])
    discrete = jnp.linspace(-2, 2, 30)[:, None]
    union = jnp.asarray([[0.25], [-1.1]])
    normals = draw_antithetic_normals(jax.random.PRNGKey(1), 16, 2)
    inner0 = optimizers.GradientDescentParameters(
        num_multistarts=1, max_num_steps=1, max_num_restarts=1,
        gamma=0.7, pre_mult=0.0)   # pre_mult=0: GD is a no-op
    got = float(kg_mod.knowledge_gradient(
        state, union, discrete, normals, dom, inner0, float(y.min())))

    # numpy brute force
    mu_u = np.asarray(gp.posterior_mean(state, union))[:, 0]
    var_u = np.asarray(gp.posterior_variance(state, union))
    c = np.linalg.cholesky(var_u + 1e-3 * np.eye(2))
    best_post = min(y.min(), mu_u.min())
    starts = np.concatenate([np.asarray(discrete),
                             np.asarray(union)], axis=0)
    total = 0.0
    for z in np.asarray(normals):
        y_u = mu_u + c @ z
        fantasy = gp.add_sampled_points(state, union, jnp.asarray(
            y_u)[:, None], update_mean=False)
        mus = np.asarray(gp.posterior_mean(
            fantasy, jnp.asarray(starts)))[:, 0]
        total += best_post - mus.min()
    np.testing.assert_allclose(got, total / len(normals), rtol=1e-6,
                               atol=1e-9)


@pytest.mark.slow
def test_kg_gradient_ping(rng):
    state, x, y = _gp_1d(rng)
    dom = TensorProductDomain.from_bounds([[-2.0, 2.0]])
    discrete = jnp.linspace(-2, 2, 10)[:, None]
    normals = draw_antithetic_normals(jax.random.PRNGKey(2), 32, 2)
    pts0 = np.array([[0.4], [-0.8]])

    val, grad = kg_mod.knowledge_gradient_value_and_grad(
        state, jnp.asarray(pts0), None, discrete, normals, dom, INNER,
        float(y.min()))

    def f(flat):
        return float(kg_mod.knowledge_gradient(
            state, jnp.asarray(flat.reshape(2, 1)), discrete, normals,
            dom, INNER, float(y.min())))

    fd = central_difference(f, pts0.reshape(-1), eps=3e-5).reshape(2, 1)
    # envelope-theorem gradient: FD includes tiny argmin-shift terms, so
    # tolerances are loose-ish but tight enough to catch sign/scale bugs
    np.testing.assert_allclose(np.asarray(grad), fd, rtol=2e-2, atol=2e-4)
    assert float(val) >= 0.0


@pytest.mark.slow
def test_kg_prefers_informative_points(rng):
    """KG at an unexplored region should beat KG at an already-sampled
    point."""
    state, x, y = _gp_1d(rng, n=10)
    dom = TensorProductDomain.from_bounds([[-2.0, 2.0]])
    discrete = jnp.linspace(-2, 2, 20)[:, None]
    normals = draw_antithetic_normals(jax.random.PRNGKey(3), 128, 1)
    gap = float(x[np.argmax(np.diff(x[:, 0]))][0] +
                np.max(np.diff(x[:, 0])) / 2)
    kg_new = float(kg_mod.knowledge_gradient(
        state, jnp.asarray([[gap]]), discrete, normals, dom, INNER,
        float(y.min())))
    kg_old = float(kg_mod.knowledge_gradient(
        state, jnp.asarray(x[:1]), discrete, normals, dom, INNER,
        float(y.min())))
    assert kg_new > kg_old


@pytest.mark.slow
def test_compute_optimal_posterior_mean(rng):
    state, x, y = _gp_1d(rng, n=14, noise=1e-6)
    dom = TensorProductDomain.from_bounds([[-2.0, 2.0]])
    guesses = jnp.linspace(-2, 2, 50)[:, None]
    params = optimizers.GradientDescentParameters(
        num_multistarts=1, max_num_steps=60, max_num_restarts=2,
        gamma=0.7, pre_mult=0.3)
    pt, neg_mu = kg_mod.compute_optimal_posterior_mean(
        state, dom, guesses, params)
    # true minimum of sin(2x) on [-2,2] near x = -pi/4 (or 3pi/4 ~ 2.36>2)
    assert abs(float(pt[0]) - (-np.pi / 4)) < 0.1
    assert float(neg_mu) > 0.9   # -mu ~ 1


def test_fidelity_cost_and_pinning():
    union = jnp.asarray([[0.5, 0.2, 0.8], [0.1, 0.9, 0.5]])
    c = float(kg_mod.fidelity_cost(union, 2, 1))
    np.testing.assert_allclose(c, 0.8)          # max(0.8, 0.5)
    c2 = float(kg_mod.fidelity_cost(union, 2, 2))
    np.testing.assert_allclose(c2, max(0.2 * 0.8, 0.9 * 0.5))
    c0 = float(kg_mod.fidelity_cost(union, 2, 0))
    assert c0 == 1.0
    x = kg_mod._pin_fidelity(jnp.asarray([0.3]), 3, 2)
    np.testing.assert_allclose(np.asarray(x), [0.3, 1.0, 1.0])


@pytest.mark.slow
def test_kg_mcmc_averaging(rng):
    state_a, x, y = _gp_1d(rng)
    hypers = np.asarray([[1.0, 0.7], [1.3, 0.9]])
    noises = np.full((2, 1), 1e-3)
    states = mcmc.fit_gp_ensemble("matern_2.5", hypers, noises, x,
                                  y[:, None])
    dom = TensorProductDomain.from_bounds([[-2.0, 2.0]])
    discrete = jnp.tile(jnp.linspace(-2, 2, 8)[None, :, None], (2, 1, 1))
    union = jnp.asarray([[0.6]])
    normals = draw_antithetic_normals(jax.random.PRNGKey(4), 32, 1)
    bsf = jnp.asarray([float(y.min()), float(y.min())])
    avg = float(kg_mod.knowledge_gradient_mcmc(
        states, union, discrete, normals, dom, INNER, bsf, 1))
    # equals the mean of the member KGs (cost = 1)
    singles = [float(kg_mod.knowledge_gradient(
        mcmc.ensemble_member(states, i), union, discrete[i], normals, dom,
        INNER, float(y.min()))) for i in range(2)]
    np.testing.assert_allclose(avg, np.mean(singles), rtol=1e-8)


@pytest.mark.slow
def test_multistart_kg_optimization_runs(rng):
    state, x, y = _gp_1d(rng, n=6)
    dom = TensorProductDomain.from_bounds([[-2.0, 2.0]])
    discrete = jnp.linspace(-2, 2, 6)[:, None]
    params = optimizers.GradientDescentParameters(
        num_multistarts=3, max_num_steps=8, max_num_restarts=1,
        gamma=0.7, pre_mult=0.4)
    pts = kg_mod.multistart_knowledge_gradient_optimization(
        jax.random.PRNGKey(5), state, dom, 2, params, INNER, discrete,
        num_mc_iterations=16)
    assert pts.shape == (2, 1)
    assert bool(jnp.all(dom.check_point_inside(pts)))


@pytest.mark.slow
def test_batched_kg_matches_single(rng):
    """knowledge_gradient_batch must equal the per-union path exactly."""
    state, x, y = _gp_1d(rng)
    dom = TensorProductDomain.from_bounds([[-2.0, 2.0]])
    discrete = jnp.linspace(-2, 2, 9)[:, None]
    normals = draw_antithetic_normals(jax.random.PRNGKey(7), 16, 2)
    unions = jnp.asarray(np.random.default_rng(3).uniform(
        -2, 2, size=(5, 2, 1)))
    batched = np.asarray(kg_mod.knowledge_gradient_batch(
        state, unions, discrete, normals, dom, INNER, float(y.min())))
    singles = np.asarray([float(kg_mod.knowledge_gradient(
        state, unions[i], discrete, normals, dom, INNER,
        float(y.min()))) for i in range(5)])
    np.testing.assert_allclose(batched, singles, rtol=1e-9, atol=1e-12)


@pytest.mark.slow
def test_batched_kg_mcmc_value_and_grad(rng):
    state_a, x, y = _gp_1d(rng)
    hypers = np.asarray([[1.0, 0.7], [1.3, 0.9]])
    noises = np.full((2, 1), 1e-3)
    states = mcmc.fit_gp_ensemble("matern_2.5", hypers, noises, x,
                                  y[:, None])
    dom = TensorProductDomain.from_bounds([[-2.0, 2.0]])
    discrete = jnp.tile(jnp.linspace(-2, 2, 7)[None, :, None], (2, 1, 1))
    normals = draw_antithetic_normals(jax.random.PRNGKey(8), 8, 2)
    bsf = jnp.asarray([float(y.min())] * 2)
    unions = jnp.asarray(np.random.default_rng(4).uniform(
        -2, 2, size=(3, 2, 1)))
    vals, grads = kg_mod.knowledge_gradient_mcmc_batch_value_and_grad(
        states, unions, discrete, normals, dom, INNER, bsf, 2)
    assert vals.shape == (3,)
    assert grads.shape == (3, 2, 1)
    # against the unbatched mcmc path
    for i in range(3):
        v = float(kg_mod.knowledge_gradient_mcmc(
            states, unions[i], discrete, normals, dom, INNER, bsf, 2))
        np.testing.assert_allclose(float(vals[i]), v, rtol=1e-9)
    # FD ping one gradient entry
    eps = 3e-5
    up = unions.at[1, 0, 0].add(eps)
    dn = unions.at[1, 0, 0].add(-eps)
    v_up = kg_mod.knowledge_gradient_mcmc_batch_value_and_grad(
        states, up, discrete, normals, dom, INNER, bsf, 2)[0][1]
    v_dn = kg_mod.knowledge_gradient_mcmc_batch_value_and_grad(
        states, dn, discrete, normals, dom, INNER, bsf, 2)[0][1]
    fd = (float(v_up) - float(v_dn)) / (2 * eps)
    np.testing.assert_allclose(float(grads[1, 0, 0]), fd, rtol=2e-2,
                               atol=2e-4)


@pytest.mark.slow
def test_batched_kg_lowp_within_tolerance(rng, monkeypatch):
    """KG_FANTASY_LOWP (bf16-streamed fantasy solves, the TPU d-KG byte
    cut) changes batched KG values and gradients by at most bf16-product
    noise — far inside the estimator's MC band — relative to the exact
    f32 path, on both value-only and derivative-channel GPs."""
    from cornell_moe_tpu import config as config_mod

    for derivs in ((), (0,)):
        n, dim = 10, 1
        x = rng.uniform(-2, 2, (n, dim))
        if derivs:
            y = np.column_stack([np.sin(x[:, 0]), np.cos(x[:, 0])])
        else:
            y = np.sin(x[:, 0])[:, None]
        cov = cov_mod.make_covariance(
            "matern_2.5", np.array([1.0, 0.8], np.float32))
        state = gp.fit_gp(
            cov, jnp.asarray([1e-3] * (1 + len(derivs)), jnp.float32),
            jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
            derivatives=derivs)
        # direct constructor: from_bounds canonicalizes to f64 under the
        # suite's x64 config, and this test must stay f32 end-to-end
        dom = TensorProductDomain(
            bounds=jnp.asarray([[-2.0, 2.0]], jnp.float32))
        discrete = jnp.linspace(-2, 2, 9, dtype=jnp.float32)[:, None]
        normals = draw_antithetic_normals(
            jax.random.PRNGKey(7), 16, 2 * (1 + len(derivs)),
            dtype=jnp.float32)
        unions = jnp.asarray(np.random.default_rng(3).uniform(
            -2, 2, size=(5, 2, 1)), jnp.float32)
        bsf = float(y[:, 0].min())

        def vg(pts):
            def f(p):
                return jnp.sum(kg_mod.knowledge_gradient_batch(
                    state, p, discrete, normals, dom, INNER, bsf,
                    derivatives_to_sample=derivs))
            return jax.value_and_grad(f)(pts)

        # the actual numerical contract: the fantasy model the estimator
        # consumes changes by bf16-product-level noise only (va is
        # refined back to f32 grade, so chol_u is tight; v is mean-path)
        monkeypatch.setattr(config_mod, "KG_FANTASY_LOWP", "never")
        mu_ref, chol_ref, v_ref_m, _ = kg_mod._build_fantasy_model_batch(
            state, unions, derivs)
        monkeypatch.setattr(config_mod, "KG_FANTASY_LOWP", "always")
        mu_lp, chol_lp, v_lp_m, _ = kg_mod._build_fantasy_model_batch(
            state, unions, derivs)
        np.testing.assert_allclose(np.asarray(mu_lp), np.asarray(mu_ref),
                                   rtol=0, atol=1e-4)
        # chol_u tolerance: va's ~3e-4 error enters var_u = prior - va^T va
        # and the factorization amplifies it on the small post-subtraction
        # diagonals — measured ~4e-3 relative of the largest entry, the
        # same order as the 1e-3 observation-noise floor baked into it
        np.testing.assert_allclose(
            np.asarray(chol_lp), np.asarray(chol_ref), rtol=0,
            atol=8e-3 * float(jnp.max(jnp.abs(chol_ref))))
        np.testing.assert_allclose(
            np.asarray(v_lp_m), np.asarray(v_ref_m), rtol=0,
            atol=2e-2 * float(jnp.max(jnp.abs(v_ref_m))))

        monkeypatch.setattr(config_mod, "KG_FANTASY_LOWP", "never")
        v_ref, _ = vg(unions)
        # CRN band: the spread of the EXACT estimator under fresh normal
        # draws is the resolution at which KG values are defined; lowp
        # may flip discrete inner-seed selections on a few draws, an
        # estimator-level discontinuity of exactly this size
        crn = []
        for s in range(3):
            nm = draw_antithetic_normals(
                jax.random.PRNGKey(100 + s), 16, 2 * (1 + len(derivs)),
                dtype=jnp.float32)
            def f_nm(p, nm=nm):
                return jnp.sum(kg_mod.knowledge_gradient_batch(
                    state, p, discrete, nm, dom, INNER, bsf,
                    derivatives_to_sample=derivs))
            crn.append(float(f_nm(unions)))
        band = max(np.max(np.abs(np.asarray(crn) - float(v_ref))), 1e-3)

        monkeypatch.setattr(config_mod, "KG_FANTASY_LOWP", "always")
        v_lp, g_lp = vg(unions)
        assert abs(float(v_lp) - float(v_ref)) < 1.5 * band, \
            (derivs, float(v_ref), float(v_lp), band, crn)

        # gradients: finite and same order as the exact path's scale.
        # Neither an exact-path comparison nor an FD ping is meaningful
        # here: the two paths can flip discrete inner-seed selections on
        # a few MC draws (a legitimate estimator-level discontinuity the
        # size of a CRN re-draw), and the bf16 quantization staircase
        # (~4e-3 relative) towers over grad*eps at any FD step small
        # enough to avoid truncation error.  The backward itself is
        # pinned against the exact transpose at the linalg level
        # (test_fantasy_solves_lowp_vjp_tolerance).
        assert np.all(np.isfinite(np.asarray(g_lp))), derivs
        assert float(jnp.max(jnp.abs(g_lp))) < 1e3, derivs
