"""PES tests: derivative-operator covariances vs FD, EP sanity,
acquisition behavior, driver smoke test."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cornell_moe_tpu.acquisition import pes as pes_mod
from cornell_moe_tpu.acquisition import pes_driver
from cornell_moe_tpu.ops.domains import TensorProductDomain
from reference_impl import central_difference, se_kernel


def test_cov_deriv_matches_fd(rng):
    sigma, lengths = 1.3, np.array([0.8, 1.2])
    k = pes_mod._se_kernel(jnp.asarray(sigma), jnp.asarray(lengths))
    u = rng.standard_normal(2)
    v = rng.standard_normal(2)

    # first derivative wrt u_0
    g = pes_mod.cov_deriv(k, (0,), ())
    fd = central_difference(lambda a: se_kernel(sigma, lengths, a, v), u)
    np.testing.assert_allclose(float(g(jnp.asarray(u), jnp.asarray(v))),
                               fd[0], rtol=1e-6)

    # mixed second derivative d2k/du0 dv1
    g2 = pes_mod.cov_deriv(k, (0,), (1,))

    def dk_du0(vv):
        return central_difference(
            lambda a: se_kernel(sigma, lengths, a, vv), u)[0]

    fd2 = central_difference(dk_du0, v, eps=1e-5)
    np.testing.assert_allclose(float(g2(jnp.asarray(u), jnp.asarray(v))),
                               fd2[1], rtol=1e-4)

    # 4th order: d4 k / du0 du1 dv0 dv1 finite and symmetric
    g4a = pes_mod.cov_deriv(k, (0, 1), (0, 1))
    g4b = pes_mod.cov_deriv(k, (1, 0), (1, 0))
    va = float(g4a(jnp.asarray(u), jnp.asarray(v)))
    vb = float(g4b(jnp.asarray(u), jnp.asarray(v)))
    np.testing.assert_allclose(va, vb, rtol=1e-10)
    assert np.isfinite(va)


def test_pes_covariance_block_structure(rng):
    x = rng.standard_normal((5, 2))
    x_min = rng.standard_normal(2)
    ch = pes_mod.build_pes_covariance(
        jnp.asarray(x), jnp.asarray(x_min), jnp.asarray(1.0),
        jnp.asarray([1.0, 1.0]), jnp.asarray(1e-3))
    n_ch = 5 + 2 + 1 + 2 + 1
    assert ch.K.shape == (n_ch, n_ch)
    kk = np.asarray(ch.K)
    np.testing.assert_allclose(kk, kk.T, atol=1e-12)
    # observation block diag = sigma + noise + jitter
    np.testing.assert_allclose(np.diag(kk)[:5], 1.0 + 1e-3 + 1e-10,
                               rtol=1e-9)
    # value/f* covariance is the plain kernel
    np.testing.assert_allclose(
        kk[0, -1], se_kernel(1.0, [1.0, 1.0], x[0], x_min), rtol=1e-9)
    eigs = np.linalg.eigvalsh(kk)
    assert eigs.min() > -1e-8


def _pes_state_1d(rng, n=6):
    x = np.sort(rng.random(n) * 4 - 2)[:, None]
    y = np.sin(2 * x[:, 0])
    x_min_true = np.array([-np.pi / 4])
    hess = np.array([[4.0]])   # f'' of sin(2x) at min = 4
    state = pes_mod.make_pes_state(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(x_min_true),
        jnp.asarray(hess), 1.0, jnp.asarray([0.7]), 1e-3)
    return state, x, y, x_min_true


def test_ep_outputs_finite(rng):
    state, x, y, x_min = _pes_state_1d(rng)
    assert np.all(np.isfinite(np.asarray(state.k_plus_w_inv)))
    assert np.all(np.isfinite(np.asarray(state.c_and_m)))
    assert np.isfinite(float(state.m_f_min))
    assert np.isfinite(float(state.v_f_min))
    assert float(state.v_f_min) > 0
    # conditioned mean at the minimum should sit at/below the data min
    assert float(state.m_f_min) <= y.min() + 0.5


def test_pes_acquisition_positive_and_informative(rng):
    state, x, y, x_min = _pes_state_1d(rng, n=8)
    xj = jnp.asarray(x)

    def acq(p):
        return float(pes_mod.pes_acquisition(jnp.asarray([p]), state, xj))

    # acquisition at an already-sampled point ~ 0; away from data > that
    at_data = acq(float(x[3, 0]))
    gaps = np.linspace(-2, 2, 41)
    vals = np.array([acq(g) for g in gaps])
    assert np.all(np.isfinite(vals))
    assert vals.max() > at_data
    # entropy reduction is nonnegative up to EP error
    assert vals.max() > 0


def test_pes_acquisition_multi_nan_robust(rng):
    state, x, y, x_min = _pes_state_1d(rng)
    xj = jnp.asarray(x)
    # stack a valid state with a corrupted one (NaN EP output)
    bad = state._replace(m_f_min=jnp.asarray(jnp.nan))
    stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), state, bad)
    v_multi = float(pes_mod.pes_acquisition_multi(
        jnp.asarray([0.5]), stacked, xj))
    v_single = float(pes_mod.pes_acquisition(jnp.asarray([0.5]), state,
                                             xj))
    np.testing.assert_allclose(v_multi, v_single, rtol=1e-10)


def test_sample_hypers_shapes(rng):
    x = jnp.asarray(rng.random((8, 2)))
    y = jnp.asarray(rng.standard_normal(8))
    noise, lengths, sigma = pes_driver.sample_hypers(
        jax.random.PRNGKey(0), x, y, num_sets=6, burnin=20)
    assert noise.shape == (6,)
    assert lengths.shape == (6, 2)
    assert sigma.shape == (6,)
    assert bool(jnp.all(noise > 0)) and bool(jnp.all(sigma > 0))


@pytest.mark.slow
def test_run_pes_smoke(tmp_path):
    def quad(p):
        return float(np.sum((np.asarray(p) - 0.3) ** 2))

    history = pes_driver.run_PES(
        quad, [0.0], [1.0], 1, number_of_hyperparameter_sets=4,
        number_of_burnin=10, number_of_initial_points=3,
        number_of_iterations=2, gridsize=40, seed=0,
        output_dir=str(tmp_path), verbose=False)
    assert len(history) == 2
    assert history[-1]["best_so_far"] <= history[0]["best_so_far"] + 1e-12
    xs = np.loadtxt(tmp_path / "Xsamples.txt")
    assert xs.shape[0] == 5   # 3 init + 2 suggested
    assert (tmp_path / "guesses.txt").exists()
    assert (tmp_path / "Ysamples.txt").exists()


@pytest.mark.slow
def test_closed_form_blocks_match_autodiff_oracle(rng):
    """The broadcasted SE block builder equals the nested-autodiff oracle
    (which itself replaces the reference's compute_covariance.py table)."""
    import jax.numpy as jnp
    from cornell_moe_tpu.acquisition import pes as pes_mod

    n, d = 7, 3
    x = jnp.asarray(rng.random((n, d)))
    x_min = jnp.asarray(rng.random(d))
    sigma, noise = 1.7, 1e-3
    lengths = jnp.asarray(0.4 + rng.random(d))

    fast = pes_mod.build_pes_covariance(x, x_min, sigma, lengths, noise)
    oracle = pes_mod._build_pes_covariance_autodiff(
        x, x_min, sigma, lengths, noise)
    np.testing.assert_allclose(np.asarray(fast.K), np.asarray(oracle.K),
                               rtol=1e-10, atol=1e-12)
    assert (fast.n, fast.d, fast.n_off) == (oracle.n, oracle.d,
                                            oracle.n_off)

    xs = jnp.asarray(rng.random((4, d)))
    got = pes_mod.pes_cross_matrix(xs, x, x_min, sigma, lengths)
    k = pes_mod._se_kernel(sigma, lengths)
    for r in range(4):
        row = [pes_mod.cov_deriv(k, (), ())(xs[r], x[i])
               for i in range(n)]
        row += [pes_mod.cov_deriv(k, (), (i,))(xs[r], x_min)
                for i in range(d)]
        row += [pes_mod.cov_deriv(k, (), (i, j))(xs[r], x_min)
                for (i, j) in pes_mod._offdiag_indices(d)]
        row += [pes_mod.cov_deriv(k, (), (i, i))(xs[r], x_min)
                for i in range(d)]
        row += [k(xs[r], x_min)]
        np.testing.assert_allclose(np.asarray(got[r]), np.asarray(row),
                                   rtol=1e-10, atol=1e-12)


def test_ep_reaches_moment_matching_fixed_point(rng):
    """The damped fixed-schedule EP must land on the moment-matching fixed
    point the reference's tolerance-driven loop iterates to (EP.py:23):
    at convergence each site's tilted moments equal the approximate
    posterior marginals."""
    import math as _math

    import jax.numpy as jnp
    from jax.scipy.special import log_ndtr

    from cornell_moe_tpu.acquisition import pes as pes_mod

    n, d = 8, 2
    x = jnp.asarray(rng.random((n, d)))
    y = jnp.asarray(np.sin(4 * rng.random(n)) + 0.5)
    x_min = jnp.asarray(rng.random(d))
    sigma, noise = 1.4, 1e-3
    lengths = jnp.asarray(0.5 + 0.3 * rng.random(d))
    channels = pes_mod.build_pes_covariance(x, x_min, sigma, lengths,
                                            noise)
    hess_off = jnp.asarray(rng.standard_normal(d * (d - 1) // 2) * 0.1)

    kw, cm, (m_tilde, v_tilde_inv) = pes_mod.expectation_propagation(
        channels, y, hess_off, noise, num_iterations=200)

    # (a) the fixed schedule has converged: doubling the iteration count
    # does not move the sites or the conditioned posterior (the reference
    # loop iterates to a 1e-20 delta tolerance instead, EP.py:23)
    kw2, cm2, (m_t2, v_ti2) = pes_mod.expectation_propagation(
        channels, y, hess_off, noise, num_iterations=400)
    np.testing.assert_allclose(np.asarray(m_tilde), np.asarray(m_t2),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(v_tilde_inv), np.asarray(v_ti2),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(kw), np.asarray(kw2),
                               rtol=1e-8, atol=1e-10)

    # (b) the diagonal-Hessian positivity sites satisfy the EP
    # moment-matching condition: each site's truncated-Gaussian tilted
    # moments equal the approximate posterior marginals (independent
    # re-derivation, not the update code's formulas)
    kk = channels.K
    nc = channels.n + channels.d + channels.n_off
    for j in range(d):
        row = kk[nc + j]
        m_j = float(row @ kw @ cm)
        v_j = float(kk[nc + j, nc + j] - row @ kw @ row)
        vti = float(v_tilde_inv[j])
        mt = float(m_tilde[j])
        v_cav = 1.0 / (1.0 / v_j - vti)
        m_cav = v_cav * (m_j / v_j - mt * vti)
        alpha = m_cav / _math.sqrt(v_cav)
        ratio = _math.exp(-0.5 * alpha**2
                          - 0.5 * _math.log(2 * _math.pi)
                          - float(log_ndtr(alpha)))
        m_tilt = m_cav + ratio * _math.sqrt(v_cav)
        v_tilt = v_cav * (1.0 - ratio * (ratio + alpha))
        assert abs(m_tilt - m_j) < 5e-6 * max(1.0, abs(m_j)), \
            f"site {j}: tilted mean {m_tilt} != posterior {m_j}"
        assert abs(v_tilt - v_j) < 5e-6 * max(1.0, abs(v_j)), \
            f"site {j}: tilted var {v_tilt} != posterior {v_j}"
