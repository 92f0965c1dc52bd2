"""Covariance kernel tests: values vs numpy, FD pings of every block.

Methodology mirrors the reference's PingDerivative finite-difference checks
(gpp_test_utils.hpp:554, gpp_covariance_test.cpp).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cornell_moe_tpu.models import covariance as cov_mod
from reference_impl import (central_difference, matern52_kernel, se_kernel)

KERNELS = [
    ("square_exponential", se_kernel),
    ("matern_2.5", matern52_kernel),
]


def make_cov(name, dim, rng):
    hypers = np.concatenate([[1.0 + rng.random()],
                             0.5 + rng.random(dim)])
    return cov_mod.make_covariance(name, hypers), hypers


@pytest.mark.parametrize("name,ref_kernel", KERNELS)
def test_kernel_value_matches_numpy(name, ref_kernel, rng):
    dim = 3
    cov, hypers = make_cov(name, dim, rng)
    for _ in range(5):
        x, y = rng.standard_normal(dim), rng.standard_normal(dim)
        expected = ref_kernel(hypers[0], hypers[1:], x, y)
        got = cov.covariance(jnp.asarray(x), jnp.asarray(y))
        np.testing.assert_allclose(got, expected, rtol=1e-12)
    # coincident points: k(x, x) = alpha
    x = rng.standard_normal(dim)
    np.testing.assert_allclose(cov.covariance(jnp.asarray(x),
                                              jnp.asarray(x)),
                               hypers[0], rtol=1e-12)


@pytest.mark.parametrize("name,ref_kernel", KERNELS)
def test_grad_covariance_ping(name, ref_kernel, rng):
    dim = 4
    cov, hypers = make_cov(name, dim, rng)
    for _ in range(5):
        x, y = rng.standard_normal(dim), rng.standard_normal(dim)
        fd = central_difference(
            lambda xv: ref_kernel(hypers[0], hypers[1:], xv, y), x)
        got = cov.grad_covariance(jnp.asarray(x), jnp.asarray(y))
        np.testing.assert_allclose(got, fd, rtol=1e-6, atol=1e-9)


@pytest.mark.parametrize("name,_", KERNELS)
def test_hyperparameter_grad_ping(name, _, rng):
    dim = 3
    cov, hypers = make_cov(name, dim, rng)
    x, y = rng.standard_normal(dim), rng.standard_normal(dim)

    def k_of_h(h):
        return np.asarray(
            cov_mod.make_covariance(name, h).covariance(
                jnp.asarray(x), jnp.asarray(y)))

    fd = central_difference(k_of_h, hypers)
    got = cov.hyperparameter_grad_covariance(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(got, fd, rtol=1e-6, atol=1e-9)
    # at coincident points the hyper-gradient is [1, 0, ..., 0]
    got0 = cov.hyperparameter_grad_covariance(jnp.asarray(x), jnp.asarray(x))
    np.testing.assert_allclose(got0, np.eye(dim + 1)[0], atol=1e-12)
    assert np.all(np.isfinite(got0))


@pytest.mark.parametrize("name,ref_kernel", KERNELS)
def test_block_covariance_derivative_channels(name, ref_kernel, rng):
    """FD-validate the k10 / k01 / k11 blocks of the block builder."""
    dim = 3
    derivs = (0, 2)
    cov, hypers = make_cov(name, dim, rng)
    x = rng.standard_normal(dim)
    y = rng.standard_normal(dim)

    block = np.asarray(cov_mod.build_block_covariance(
        cov, jnp.asarray(x)[None], derivs, jnp.asarray(y)[None], derivs))
    assert block.shape == (3, 3)

    def k(xv, yv):
        return ref_kernel(hypers[0], hypers[1:], xv, yv)

    np.testing.assert_allclose(block[0, 0], k(x, y), rtol=1e-12)
    # k10: d/dx rows
    gx = central_difference(lambda xv: k(xv, y), x)
    np.testing.assert_allclose(block[1:, 0], gx[list(derivs)], rtol=1e-6)
    # k01: d/dy cols
    gy = central_difference(lambda yv: k(x, yv), y)
    np.testing.assert_allclose(block[0, 1:], gy[list(derivs)], rtol=1e-6)
    # k11: d2/dx dy via nested FD
    for a, da in enumerate(derivs):
        def dk_dxa(yv, da=da):
            return central_difference(lambda xv: k(xv, yv), x)[da]
        g2 = central_difference(dk_dxa, y, eps=1e-5)
        np.testing.assert_allclose(block[1 + a, 1:], g2[list(derivs)],
                                   rtol=1e-4, atol=1e-7)


@pytest.mark.parametrize("name,_", KERNELS)
def test_block_covariance_coincident_is_finite_and_correct(name, _, rng):
    """Diagonal blocks (x == y) must be finite; k11 diag = P(0)/l_i^2."""
    dim = 3
    derivs = (0, 1, 2)
    cov, hypers = make_cov(name, dim, rng)
    x = jnp.asarray(rng.standard_normal(dim))
    block = np.asarray(cov_mod.build_block_covariance(
        cov, x[None], derivs, x[None], derivs))
    assert np.all(np.isfinite(block))
    np.testing.assert_allclose(block[0, 1:], 0.0, atol=1e-14)
    np.testing.assert_allclose(block[1:, 0], 0.0, atol=1e-14)
    scale = 5.0 / 3.0 if name == "matern_2.5" else 1.0
    expected_diag = scale * hypers[0] / hypers[1:]**2
    np.testing.assert_allclose(np.diag(block)[1:], expected_diag,
                               rtol=1e-12)

    # first-order autodiff through the block at coincidence stays finite
    def f(pt):
        return jnp.sum(cov_mod.build_block_covariance(
            cov, pt[None], derivs, x[None], derivs))
    g = jax.grad(f)(x)
    assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.parametrize("name,_", KERNELS)
def test_covariance_matrix_spd_and_symmetric(name, _, rng):
    dim, n = 2, 12
    derivs = (0, 1)
    cov, _h = make_cov(name, dim, rng)
    pts = jnp.asarray(rng.standard_normal((n, dim)))
    k = np.asarray(cov_mod.build_covariance_matrix_with_noise(
        cov, pts, derivs, jnp.asarray([1e-4, 1e-4, 1e-4])))
    assert k.shape == (n * 3, n * 3)
    np.testing.assert_allclose(k, k.T, atol=1e-12)
    eigs = np.linalg.eigvalsh(k)
    assert eigs.min() > 0


@pytest.mark.parametrize("name,_", KERNELS)
def test_hyperparameter_grad_matrix_ping(name, _, rng):
    dim, n = 2, 5
    derivs = (1,)
    cov, hypers = make_cov(name, dim, rng)
    pts = jnp.asarray(rng.standard_normal((n, dim)))

    grad = np.asarray(cov_mod.hyperparameter_grad_covariance_matrix(
        cov, pts, derivs))
    assert grad.shape == (dim + 1, n * 2, n * 2)

    eps = 1e-6
    for h_idx in range(dim + 1):
        hp, hm = hypers.copy(), hypers.copy()
        hp[h_idx] += eps
        hm[h_idx] -= eps
        kp = np.asarray(cov_mod.build_covariance_matrix(
            cov_mod.make_covariance(name, hp), pts, derivs))
        km = np.asarray(cov_mod.build_covariance_matrix(
            cov_mod.make_covariance(name, hm), pts, derivs))
        np.testing.assert_allclose(grad[h_idx], (kp - km) / (2 * eps),
                                   rtol=1e-5, atol=1e-8)
