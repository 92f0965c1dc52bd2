"""EI tests: analytic vs MC agreement, FD gradient pings, optimization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from cornell_moe_tpu.acquisition import expected_improvement as ei
from cornell_moe_tpu.models import covariance as cov_mod
from cornell_moe_tpu.models import gp
from cornell_moe_tpu.ops import optimizers
from cornell_moe_tpu.ops.domains import TensorProductDomain
from reference_impl import central_difference


def _gp_1d(rng, n=8, noise=1e-4):
    cov = cov_mod.make_covariance("matern_2.5", [1.0, 0.7])
    x = np.sort(rng.random(n) * 4 - 2)[:, None]
    y = np.sin(2 * x[:, 0])
    return gp.fit_gp(cov, jnp.asarray([noise]), jnp.asarray(x),
                     jnp.asarray(y)[:, None]), x, y


def test_analytic_ei_matches_closed_form(rng):
    state, x, y = _gp_1d(rng)
    best = y.min()
    pt = jnp.asarray([[0.3]])
    mu = float(gp.posterior_mean(state, pt)[0, 0])
    sigma = float(np.sqrt(gp.posterior_variance(state, pt)[0, 0]))
    u = (best - mu) / sigma
    expected = sigma * (u * scipy.stats.norm.cdf(u) +
                        scipy.stats.norm.pdf(u))
    got = float(ei.analytic_expected_improvement(state, pt, best))
    np.testing.assert_allclose(got, expected, rtol=1e-10)
    assert got >= 0.0


def test_mc_ei_converges_to_analytic(rng):
    state, x, y = _gp_1d(rng)
    best = y.min()
    pt = jnp.asarray([[0.9]])
    analytic = float(ei.analytic_expected_improvement(state, pt, best))
    normals = ei.draw_normals(jax.random.PRNGKey(0), 200000, 1)
    mc = float(ei.monte_carlo_expected_improvement(state, pt, None, best,
                                                   normals))
    # MC jitter adds 1e-6 variance; tolerance accounts for both
    np.testing.assert_allclose(mc, analytic, rtol=2e-2, atol=1e-4)


def test_qei_exceeds_single_ei(rng):
    """q-EI of a set must be >= EI of its best member (more chances)."""
    state, x, y = _gp_1d(rng)
    best = y.min()
    normals2 = ei.draw_normals(jax.random.PRNGKey(1), 50000, 2)
    normals1 = normals2[:, :1]
    pts = jnp.asarray([[0.4], [1.2]])
    q2 = float(ei.monte_carlo_expected_improvement(state, pts, None, best,
                                                   normals2))
    e1 = float(ei.monte_carlo_expected_improvement(state, pts[:1], None,
                                                   best, normals1))
    e2 = float(ei.monte_carlo_expected_improvement(state, pts[1:], None,
                                                   best, normals1))
    assert q2 >= max(e1, e2) - 1e-3


def test_mc_ei_gradient_ping(rng):
    state, x, y = _gp_1d(rng)
    best = y.min()
    normals = ei.draw_normals(jax.random.PRNGKey(2), 4000, 2)
    pts0 = np.array([[0.35], [1.1]])

    val, grad = ei.expected_improvement_value_and_grad(
        state, jnp.asarray(pts0), None, best, normals)

    def f(flat):
        return float(ei.monte_carlo_expected_improvement(
            state, jnp.asarray(flat.reshape(2, 1)), None, best, normals))

    fd = central_difference(f, pts0.reshape(-1), eps=1e-5).reshape(2, 1)
    np.testing.assert_allclose(np.asarray(grad), fd, rtol=5e-4, atol=1e-7)
    assert float(val) >= 0.0


def test_analytic_ei_gradient_ping(rng):
    state, x, y = _gp_1d(rng)
    best = y.min()
    pt0 = np.array([[0.55]])
    g = jax.grad(lambda p: ei.analytic_expected_improvement(
        state, p, best))(jnp.asarray(pt0))

    def f(flat):
        return float(ei.analytic_expected_improvement(
            state, jnp.asarray(flat.reshape(1, 1)), best))

    fd = central_difference(f, pt0.reshape(-1), eps=1e-6)
    np.testing.assert_allclose(np.asarray(g).reshape(-1), fd, rtol=1e-5)


def test_ei_with_points_being_sampled(rng):
    """p > 0: EI near an in-flight point should be suppressed."""
    state, x, y = _gp_1d(rng)
    best = y.min()
    being = jnp.asarray([[0.5]])
    normals = ei.draw_normals(jax.random.PRNGKey(3), 50000, 2)
    near = float(ei.monte_carlo_expected_improvement(
        state, jnp.asarray([[0.501]]), being, best, normals))
    normals1 = normals[:, :1]
    solo = float(ei.monte_carlo_expected_improvement(
        state, jnp.asarray([[0.501]]), None, best, normals1))
    # with a duplicate in-flight point, marginal gain is roughly halved
    assert near < solo + 1e-6


@pytest.mark.slow
def test_multistart_ei_optimization_improves(rng):
    state, x, y = _gp_1d(rng)
    params = optimizers.GradientDescentParameters(
        num_multistarts=12, max_num_steps=60, max_num_restarts=2,
        gamma=0.7, pre_mult=0.5)
    dom = TensorProductDomain.from_bounds([[-2.0, 2.0]])
    pt = ei.multistart_expected_improvement_optimization(
        jax.random.PRNGKey(4), state, dom, 1, params)
    assert pt.shape == (1, 1)
    # optimized point beats 99% of a random grid
    grid = jnp.linspace(-2, 2, 101)[:, None, None]
    grid_ei = np.asarray(ei.evaluate_expected_improvement_at_point_list(
        state, grid))
    best_ei = float(ei.analytic_expected_improvement(
        state, pt, float(y.min())))
    assert best_ei >= np.quantile(grid_ei, 0.99) - 1e-9


@pytest.mark.slow
def test_qei_optimization_spreads_points(rng):
    state, x, y = _gp_1d(rng)
    params = optimizers.GradientDescentParameters(
        num_multistarts=8, max_num_steps=50, max_num_restarts=2,
        gamma=0.7, pre_mult=0.4)
    dom = TensorProductDomain.from_bounds([[-2.0, 2.0]])
    pts = ei.multistart_expected_improvement_optimization(
        jax.random.PRNGKey(5), state, dom, 2, params,
        num_mc_iterations=800)
    assert pts.shape == (2, 1)
    # batch points should not collapse onto each other
    assert abs(float(pts[0, 0] - pts[1, 0])) > 1e-2


def test_kriging_and_constant_liar_policies(rng):
    state, x, y = _gp_1d(rng)
    val, noise = ei.kriging_believer_estimate(state, jnp.asarray([[0.2]]))
    mu = float(gp.posterior_mean(state, jnp.asarray([[0.2]]))[0, 0])
    np.testing.assert_allclose(float(val), mu, rtol=1e-12)
    val, noise = ei.constant_liar_estimate(state, None, 3.25, 0.1)
    assert val == 3.25 and noise == 0.1


@pytest.mark.slow
def test_heuristic_ei_returns_q_distinct_points(rng):
    state, x, y = _gp_1d(rng)
    params = optimizers.GradientDescentParameters(
        num_multistarts=6, max_num_steps=40, max_num_restarts=1,
        gamma=0.7, pre_mult=0.4)
    dom = TensorProductDomain.from_bounds([[-2.0, 2.0]])
    pts = ei.heuristic_expected_improvement_optimization(
        jax.random.PRNGKey(6), state, dom, 2, params)
    assert pts.shape == (2, 1)
    assert abs(float(pts[0, 0] - pts[1, 0])) > 1e-3


def test_heuristic_ei_shape_stable_no_recompiles(rng, monkeypatch):
    """The heuristic q loop must reuse one program set across rounds.

    Regression test for the shape-growth recompile bug: every fantasy
    point used to grow the GP arrays, forcing fresh compiles of every
    downstream program per round (30-300 s per shape on the TPU tunnel).
    Now fantasy points fill pre-padded huge-noise slots, so the per-round
    state shapes are identical — asserted by recording the shapes the EI
    multistart actually sees.
    """
    state, x, y = _gp_1d(rng)
    params = optimizers.GradientDescentParameters(
        num_multistarts=2, max_num_steps=4, max_num_restarts=1,
        gamma=0.7, pre_mult=0.4)
    dom = TensorProductDomain.from_bounds([[-2.0, 2.0]])

    seen_shapes = []
    orig = ei.multistart_expected_improvement_optimization

    def spy(key, st, *args, **kwargs):
        seen_shapes.append((st.points_sampled.shape, st.chol_K.shape))
        return orig(key, st, *args, **kwargs)

    monkeypatch.setattr(
        ei, "multistart_expected_improvement_optimization", spy)
    pts = ei.heuristic_expected_improvement_optimization(
        jax.random.PRNGKey(6), state, dom, 3, params,
        num_mc_iterations=32)
    assert pts.shape == (3, 1)
    assert len(seen_shapes) == 3
    assert len(set(seen_shapes)) == 1, \
        f"per-round shapes changed: {seen_shapes}"


@pytest.mark.slow
def test_heuristic_ei_preserves_bucketed_point_noise(rng):
    """Refits inside the heuristic fantasy loop must keep the state's own
    per-point noise: a shape-bucketed state (PAD_NOISE dummy rows) must
    yield the same selections as the equivalent unbucketed state.

    Regression test for the round-2 advisor finding: the refit used to
    rebuild the GP with zero per-point noise, silently promoting dummy
    rows to full-weight observations.
    """
    from cornell_moe_tpu.models import mcmc as mcmc_mod

    x = rng.uniform(-2, 2, size=(7, 1))
    y = np.sin(1.3 * x[:, 0])
    cov = cov_mod.MaternNu2p5(jnp.asarray([1.0, 0.8]))
    plain = gp.fit_gp(cov, jnp.asarray([1e-3]), jnp.asarray(x),
                      jnp.asarray(y)[:, None])
    xp, yp, pnoise, mean = mcmc_mod.pad_training_data(x, y[:, None], 12)
    bucketed = gp.fit_gp(cov, jnp.asarray([1e-3]), jnp.asarray(xp),
                         jnp.asarray(yp), point_noise=jnp.asarray(pnoise),
                         mean=mean)
    assert bucketed.point_noise is not None

    params = optimizers.GradientDescentParameters(
        num_multistarts=4, max_num_steps=25, max_num_restarts=1,
        gamma=0.7, pre_mult=0.4)
    dom = TensorProductDomain.from_bounds([[-2.0, 2.0]])
    bsf = float(y.min())
    pts_plain = ei.heuristic_expected_improvement_optimization(
        jax.random.PRNGKey(3), plain, dom, 2, params, best_so_far=bsf,
        num_mc_iterations=400)
    pts_bucketed = ei.heuristic_expected_improvement_optimization(
        jax.random.PRNGKey(3), bucketed, dom, 2, params, best_so_far=bsf,
        num_mc_iterations=400)
    np.testing.assert_allclose(np.asarray(pts_bucketed),
                               np.asarray(pts_plain), atol=5e-2)


# ---------------------------------------------------------------------------
# Lockstep-batched ensemble q-EI (the round-4 seeding fast path)
# ---------------------------------------------------------------------------

def _ensemble(rng, n=12, s=3):
    from cornell_moe_tpu.models import mcmc as mcmc_mod
    x = rng.random((n, 2))
    y = np.sin(3 * x[:, 0]) + x[:, 1] ** 2
    hypers = np.abs(rng.standard_normal((s, 3))) + 0.7
    noises = np.full((s, 1), 1e-3)
    states = mcmc_mod.fit_gp_ensemble(
        "matern_2.5", jnp.asarray(hypers), jnp.asarray(noises),
        jnp.asarray(x), jnp.asarray(y)[:, None])
    return states, x, y


@pytest.mark.slow
def test_batched_qei_mcmc_matches_per_start(rng):
    """monte_carlo_expected_improvement_mcmc_batch == vmapped per-start
    estimator (same solve path, same jitter) to rounding."""
    states, x, y = _ensemble(rng)
    normals = ei.draw_normals(jax.random.PRNGKey(1), 64, 2)
    bsf = jax.vmap(lambda s: s.best_observed_value)(states)
    pts = jnp.asarray(rng.random((5, 2, 2)))
    batched = ei.monte_carlo_expected_improvement_mcmc_batch(
        states, pts, None, bsf, normals)
    per = jax.vmap(lambda p: ei.monte_carlo_expected_improvement_mcmc(
        states, p, None, bsf, normals))(pts)
    np.testing.assert_allclose(np.asarray(batched), np.asarray(per),
                               rtol=1e-12, atol=1e-14)

    # with points_being_sampled
    being = jnp.asarray(rng.random((1, 2)))
    normals3 = ei.draw_normals(jax.random.PRNGKey(2), 64, 3)
    b2 = ei.monte_carlo_expected_improvement_mcmc_batch(
        states, pts, being, bsf, normals3)
    p2 = jax.vmap(lambda p: ei.monte_carlo_expected_improvement_mcmc(
        states, p, being, bsf, normals3))(pts)
    np.testing.assert_allclose(np.asarray(b2), np.asarray(p2),
                               rtol=1e-12, atol=1e-14)


@pytest.mark.slow
def test_batched_qei_mcmc_grads_match(rng):
    states, x, y = _ensemble(rng)
    normals = ei.draw_normals(jax.random.PRNGKey(1), 32, 2)
    bsf = jax.vmap(lambda s: s.best_observed_value)(states)
    pts = jnp.asarray(rng.random((4, 2, 2)))
    _, grads = ei.expected_improvement_mcmc_batch_value_and_grad(
        states, pts, None, bsf, normals)
    g_ref = jax.vmap(lambda p: jax.grad(
        lambda q: ei.monte_carlo_expected_improvement_mcmc(
            states, q, None, bsf, normals))(p))(pts)
    np.testing.assert_allclose(np.asarray(grads), np.asarray(g_ref),
                               rtol=1e-10, atol=1e-13)


@pytest.mark.slow
def test_batched_qei_endpoint_matches_vmapped(rng):
    """multistart_expected_improvement_mcmc_optimization use_batched=True
    (round-4 default) lands on the same suggestion as the vmapped path."""
    states, x, y = _ensemble(rng)
    dom = TensorProductDomain.from_bounds([[0.0, 1.0], [0.0, 1.0]])
    params = optimizers.GradientDescentParameters(
        num_multistarts=8, max_num_steps=6, max_num_restarts=1,
        num_steps_averaged=3, gamma=0.7, pre_mult=0.3,
        max_relative_change=0.5)
    a = ei.multistart_expected_improvement_mcmc_optimization(
        jax.random.PRNGKey(5), states, dom, 2, params,
        num_mc_iterations=64, use_batched=True)
    b = ei.multistart_expected_improvement_mcmc_optimization(
        jax.random.PRNGKey(5), states, dom, 2, params,
        num_mc_iterations=64, use_batched=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-9, atol=1e-12)


@pytest.mark.slow
def test_batched_qei_gate_unreachable_tol_is_exact(rng):
    """conv_tol=0.0 can never fire: the gated batched multistart must be
    bit-identical to the ungated one (circular Polyak buffer included)."""
    states, x, y = _ensemble(rng)
    dom = TensorProductDomain.from_bounds([[0.0, 1.0], [0.0, 1.0]])
    params = optimizers.GradientDescentParameters(
        num_multistarts=8, max_num_steps=6, max_num_restarts=2,
        num_steps_averaged=3, gamma=0.7, pre_mult=0.3,
        max_relative_change=0.5)
    a = ei.multistart_expected_improvement_mcmc_optimization(
        jax.random.PRNGKey(5), states, dom, 2, params,
        num_mc_iterations=32, use_batched=True, conv_tol=0.0)
    b = ei.multistart_expected_improvement_mcmc_optimization(
        jax.random.PRNGKey(5), states, dom, 2, params,
        num_mc_iterations=32, use_batched=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# Lockstep-batched single-GP q-EI (the round-5 EI-driver path)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_single_gp_batched_qei_matches_per_start(rng):
    """expected_improvement_batch_value_and_grad == per-start values and
    grads on one GP (the member-0 estimator the EI driver optimizes)."""
    from cornell_moe_tpu.models import mcmc as mcmc_mod
    states, x, y = _ensemble(rng)
    s0 = mcmc_mod.ensemble_member(states, 0)
    bsf = s0.best_observed_value
    normals = ei.draw_normals(jax.random.PRNGKey(1), 64, 2)
    pts = jnp.asarray(rng.random((5, 2, 2)))
    vals, grads = ei.expected_improvement_batch_value_and_grad(
        s0, pts, None, bsf, normals)
    per_vals, per_grads = jax.vmap(
        lambda p: ei.expected_improvement_value_and_grad(
            s0, p, None, bsf, normals))(pts)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(per_vals),
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(grads), np.asarray(per_grads),
                               rtol=1e-10, atol=1e-13)

    # with points_being_sampled
    being = jnp.asarray(rng.random((1, 2)))
    normals3 = ei.draw_normals(jax.random.PRNGKey(2), 64, 3)
    v2, g2 = ei.expected_improvement_batch_value_and_grad(
        s0, pts, being, bsf, normals3)
    pv2, pg2 = jax.vmap(
        lambda p: ei.expected_improvement_value_and_grad(
            s0, p, being, bsf, normals3))(pts)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(pv2),
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(pg2),
                               rtol=1e-10, atol=1e-13)


@pytest.mark.slow
def test_single_gp_batched_endpoint_matches_vmapped(rng):
    """multistart_expected_improvement_optimization use_batched=True (the
    round-5 default) lands on the same suggestion as the vmapped path —
    for both the MC (q=2) and analytic (q=1) objectives."""
    from cornell_moe_tpu.models import mcmc as mcmc_mod
    states, x, y = _ensemble(rng)
    s0 = mcmc_mod.ensemble_member(states, 0)
    dom = TensorProductDomain.from_bounds([[0.0, 1.0], [0.0, 1.0]])
    params = optimizers.GradientDescentParameters(
        num_multistarts=8, max_num_steps=6, max_num_restarts=1,
        num_steps_averaged=3, gamma=0.7, pre_mult=0.3,
        max_relative_change=0.5)
    for q in (1, 2):
        a = ei.multistart_expected_improvement_optimization(
            jax.random.PRNGKey(5), s0, dom, q, params,
            num_mc_iterations=64, use_batched=True)
        b = ei.multistart_expected_improvement_optimization(
            jax.random.PRNGKey(5), s0, dom, q, params,
            num_mc_iterations=64, use_batched=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-12)


@pytest.mark.slow
def test_single_gp_ei_sharded_matches_single_device(rng):
    """The EI suggest multistart sharded over the 8-device mesh (gated,
    chunk matched) == single-device — the EI-mode counterpart of the KG
    sharding consistency tests (VERDICT r4 item 6)."""
    import jax as _jax
    from cornell_moe_tpu.models import mcmc as mcmc_mod
    from cornell_moe_tpu.parallel import sharding as shard_mod
    assert len(_jax.devices()) >= 8
    mesh = shard_mod.default_mesh(8)
    states, x, y = _ensemble(rng)
    s0 = mcmc_mod.ensemble_member(states, 0)
    dom = TensorProductDomain.from_bounds([[0.0, 1.0], [0.0, 1.0]])
    params = optimizers.GradientDescentParameters(
        num_multistarts=16, max_num_steps=6, max_num_restarts=1,
        num_steps_averaged=3, gamma=0.7, pre_mult=0.3,
        max_relative_change=0.5)
    for q in (1, 2):
        single = ei.multistart_expected_improvement_optimization(
            jax.random.PRNGKey(5), s0, dom, q, params,
            num_mc_iterations=64, conv_tol=3e-3, chunk_size=2)
        sharded = ei.multistart_expected_improvement_optimization(
            jax.random.PRNGKey(5), s0, dom, q, params,
            num_mc_iterations=64, conv_tol=3e-3, chunk_size=2,
            mesh=mesh)
        np.testing.assert_allclose(np.asarray(sharded),
                                   np.asarray(single), rtol=1e-11,
                                   atol=1e-12)
