"""Pallas covariance-kernel tests (interpret mode on the CPU suite)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cornell_moe_tpu.models import covariance as cov_mod
from cornell_moe_tpu.ops import pallas_kernels as pk


@pytest.mark.parametrize("kernel", ["square_exponential", "matern_2.5"])
def test_pallas_covariance_full_matches_builder(kernel, rng):
    n, d = 200, 3
    hypers = np.concatenate([[1.2], 0.5 + rng.random(d)]).astype(
        np.float32)
    x = rng.standard_normal((n, d)).astype(np.float32)
    noise = (1e-3 + rng.random(n)).astype(np.float32)

    got = np.asarray(pk.pallas_covariance_with_noise_full(
        jnp.asarray(x), jnp.asarray(hypers), jnp.asarray(noise), kernel,
        interpret=True))
    cov = cov_mod.make_covariance(kernel, hypers.astype(np.float64))
    expected = np.asarray(cov_mod.build_block_covariance(
        cov, jnp.asarray(x, jnp.float64), (), jnp.asarray(x, jnp.float64),
        ())) + np.diag(noise)
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-5)


def test_pallas_gate_logic(rng):
    x64 = jnp.asarray(rng.standard_normal((300, 2)))
    # CPU backend in the test suite -> gated off
    assert not pk.pallas_available_for(x64, ())


def test_builder_with_noise_pallas_flag(rng):
    """use_pallas='never' must be the default on CPU; results identical."""
    hypers = np.array([1.0, 0.8, 1.2])
    cov = cov_mod.make_covariance("matern_2.5", hypers)
    pts = jnp.asarray(rng.standard_normal((20, 2)))
    a = cov_mod.build_covariance_matrix_with_noise(
        cov, pts, (), jnp.asarray([1e-3]))
    b = cov_mod.build_covariance_matrix_with_noise(
        cov, pts, (), jnp.asarray([1e-3]), use_pallas="never")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_builder_with_noise_pallas_per_point_noise(rng, monkeypatch):
    """Bucket-padded (n, 1) per-point noise must survive the Pallas branch.

    Regression test: the fast path used to collapse noise to noise[0],
    silently dropping the PAD_NOISE=1e8 on shape-bucket dummy points.
    """
    import functools

    monkeypatch.setattr(
        pk, "pallas_covariance_with_noise_full",
        functools.partial(pk.pallas_covariance_with_noise_full,
                          interpret=True))
    hypers = np.array([1.0, 0.8, 1.2], dtype=np.float32)
    cov = cov_mod.make_covariance("matern_2.5", hypers)
    pts = jnp.asarray(rng.standard_normal((48, 2)), jnp.float32)
    noise = jnp.full((48, 1), 1e-3, jnp.float32).at[-8:].set(1e8)

    got = cov_mod.build_covariance_matrix_with_noise(
        cov, pts, (), noise, use_pallas="always")
    expected = cov_mod.build_covariance_matrix_with_noise(
        cov, pts, (), noise, use_pallas="never")
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-5)
    # the padded points kept their huge noise on the diagonal
    assert float(got[-1, -1]) > 1e7
