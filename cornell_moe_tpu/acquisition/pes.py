"""Predictive Entropy Search (PES), JAX-native.

Counterpart of the reference's standalone ``pes/`` side-package
(/root/reference/pes/PES/*.py — Hernandez-Lobato, Hoffman & Ghahramani
2014): condition the GP on "x* is a global minimum" (zero gradient,
positive-definite Hessian, f(x*) below every observation) via Expectation
Propagation, and score candidates by the entropy reduction

    alpha(x) = 0.5 log(v_n(x) + noise) - 0.5 log(v_n(x | x* min) + noise)

averaged over hyperparameter samples.

TPU-native design
-----------------
* The reference hand-codes every SE-kernel covariance among values,
  gradients, and Hessian entries in a 738-line table
  (pes/PES/compute_covariance.py).  Here a single nested-autodiff operator
  kernel (:func:`cov_deriv`) generates all blocks — the SE kernel is
  analytic, so 4th-order forward-mode derivatives are exact.
* EP runs as a fixed-iteration ``lax.scan`` (the reference iterates to a
  1e-20 tolerance with an eigenvalue-guarded damping loop; a damped fixed
  schedule converges to the same fixed point and jits).
* The M hyperparameter sets are a vmapped batch axis; invalid sets
  contribute NaN and are dropped by nan-averaging, mirroring the
  reference's try/except-skip accounting (pes/PES/PES.py:40-57).
* Sampling x* uses the shared random-feature module; the Hessian at the
  sampled minimum is the exact autodiff Hessian of the sampled function
  (the reference substitutes L-BFGS's inverse-Hessian estimate).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.special import log_ndtr

from cornell_moe_tpu.ops import linalg


# ---------------------------------------------------------------------------
# Derivative-operator covariances by nested autodiff
# ---------------------------------------------------------------------------

def _se_kernel(sigma, lengths):
    def k(a, b):
        d = (a - b) / lengths
        return sigma * jnp.exp(-0.5 * jnp.dot(d, d))
    return k


def cov_deriv(kernel, du: Sequence[int], dv: Sequence[int]):
    """Return (u, v) -> d^{du}_u d^{dv}_v k(u, v) for partial-index tuples.

    Replaces the reference's per-combination closed forms (e.g.
    cov_devdevY_devdevX for Hessian-Hessian terms,
    compute_covariance.py:380-420) with nested forward-mode autodiff.
    """
    f = kernel
    for idx in du:
        f = (lambda g, i: lambda a, b: jax.jacfwd(g, argnums=0)(a, b)[i])(
            f, idx)
    for idx in dv:
        f = (lambda g, i: lambda a, b: jax.jacfwd(g, argnums=1)(a, b)[i])(
            f, idx)
    return f


def _offdiag_indices(d: int):
    return [(i, j) for i in range(d) for j in range(i + 1, d)]


class PESChannels(NamedTuple):
    """Joint covariance over [y_n, grad*, offdiagH*, diagH*, f*]."""
    K: jax.Array          # (n_ch, n_ch) joint prior covariance
    n: int                # observations
    d: int                # dimension
    n_off: int            # d(d-1)/2


def _build_pes_covariance_autodiff(x_samples: jax.Array, x_min: jax.Array,
                                   sigma, lengths, noise) -> PESChannels:
    """Autodiff oracle for :func:`build_pes_covariance` (test use only).

    Traces O(n_ch^2) nested-jacfwd scalar kernels — exact but
    trace-explosive at reference scale; kept as the independent check for
    the closed-form block builder below.
    """
    n, d = x_samples.shape
    off = _offdiag_indices(d)
    k = _se_kernel(sigma, lengths)

    points = [x_samples[i] for i in range(n)]
    ops = [((), p) for p in points]
    ops += [((i,), x_min) for i in range(d)]
    ops += [((i, j), x_min) for (i, j) in off]
    ops += [((i, i), x_min) for i in range(d)]
    ops += [((), x_min)]

    n_ch = len(ops)
    rows = []
    for (du, u) in ops:
        row = []
        for (dv, v) in ops:
            row.append(cov_deriv(k, du, dv)(u, v))
        rows.append(jnp.stack(row))
    big_k = jnp.stack(rows)

    noise_diag = jnp.concatenate([
        jnp.full((n,), noise), jnp.zeros((n_ch - n - 1,)),
        jnp.full((1,), noise)]).astype(big_k.dtype)
    big_k = big_k + jnp.diag(noise_diag) + \
        sigma * 1e-10 * jnp.eye(n_ch, dtype=big_k.dtype)
    return PESChannels(K=big_k, n=n, d=d, n_off=len(off))


def build_pes_covariance(x_samples: jax.Array, x_min: jax.Array, sigma,
                         lengths, noise) -> PESChannels:
    """Joint prior covariance over the PES conditioning channels.

    Channel order follows the reference (compute_K / compute_cov_xPrime_cz,
    compute_covariance.py:626-726): [values at X_n (+noise diag),
    grad(x*) (d), offdiag Hess(x*) (d(d-1)/2), diag Hess(x*) (d),
    f(x*) (+noise)], with sigma*1e-10 diagonal jitter.

    All SE derivative blocks are closed forms in the scaled differences
    w = (X - x*)/l (the reference's 738-line table and the autodiff oracle
    above compute the same polynomials-times-Gaussian entries): trace size
    is O(1) in n, and the whole build is a handful of broadcasted ops.
    """
    n, d = x_samples.shape
    off = _offdiag_indices(d)
    dtype = x_samples.dtype
    inv_l = 1.0 / lengths
    inv_l2 = inv_l * inv_l

    w = (x_samples - x_min) * inv_l                       # (n, d)
    gk = sigma * jnp.exp(-0.5 * jnp.sum(w * w, axis=-1))  # (n,) sigma*g

    # AA: plain SE among observations
    dw = (x_samples[:, None, :] - x_samples[None, :, :]) * inv_l
    aa = sigma * jnp.exp(-0.5 * jnp.sum(dw * dw, axis=-1))

    # cross blocks obs x (grad*, offdiagH*, diagH*, f*)
    ab = gk[:, None] * w * inv_l[None, :]                 # (n, d)
    if off:
        oi = jnp.asarray([i for (i, j) in off])
        oj = jnp.asarray([j for (i, j) in off])
        ac = gk[:, None] * w[:, oi] * w[:, oj] * \
            (inv_l[oi] * inv_l[oj])[None, :]              # (n, n_off)
    else:
        ac = jnp.zeros((n, 0), dtype)
    ad = gk[:, None] * (w * w - 1.0) * inv_l2[None, :]    # (n, d)
    ae = gk[:, None]                                      # (n, 1)

    # x*-side blocks (all at w = 0)
    bb = sigma * jnp.diag(inv_l2)                         # (d, d)
    if off:
        cc = sigma * jnp.diag(inv_l2[oi] * inv_l2[oj])    # (n_off, n_off)
    else:
        cc = jnp.zeros((0, 0), dtype)
    dd = sigma * jnp.outer(inv_l2, inv_l2) * \
        (1.0 + 2.0 * jnp.eye(d, dtype=dtype))             # (d, d)
    de = (-sigma * inv_l2)[:, None]                       # (d, 1)
    ee = jnp.asarray(sigma, dtype).reshape(1, 1)

    n_off = len(off)
    z = lambda r, c: jnp.zeros((r, c), dtype)             # noqa: E731
    big_k = jnp.block([
        [aa,     ab,           ac,             ad,     ae],
        [ab.T,   bb,           z(d, n_off),    z(d, d), z(d, 1)],
        [ac.T,   z(n_off, d),  cc,             z(n_off, d), z(n_off, 1)],
        [ad.T,   z(d, d),      z(d, n_off),    dd,     de],
        [ae.T,   z(1, d),      z(1, n_off),    de.T,   ee],
    ])

    n_ch = big_k.shape[0]
    noise_diag = jnp.concatenate([
        jnp.full((n,), noise), jnp.zeros((n_ch - n - 1,)),
        jnp.full((1,), noise)]).astype(big_k.dtype)
    big_k = big_k + jnp.diag(noise_diag) + \
        sigma * 1e-10 * jnp.eye(n_ch, dtype=big_k.dtype)
    return PESChannels(K=big_k, n=n, d=d, n_off=n_off)


def pes_cross_matrix(xs: jax.Array, x_samples: jax.Array,
                     x_min: jax.Array, sigma, lengths) -> jax.Array:
    """Cross-covariances of f(xs) with the conditioning channels, batched.

    xs: (m, d) -> (m, n + d + n_off + d + 1).  Closed-form counterpart of
    compute_cov_xPrime_cz (compute_covariance.py), vectorized over xs.
    """
    n, d = x_samples.shape
    off = _offdiag_indices(d)
    inv_l = 1.0 / lengths
    inv_l2 = inv_l * inv_l

    dw = (xs[:, None, :] - x_samples[None, :, :]) * inv_l
    vals = sigma * jnp.exp(-0.5 * jnp.sum(dw * dw, axis=-1))  # (m, n)

    w = (xs - x_min) * inv_l                                  # (m, d)
    gk = sigma * jnp.exp(-0.5 * jnp.sum(w * w, axis=-1))      # (m,)
    grad = gk[:, None] * w * inv_l[None, :]
    if off:
        oi = jnp.asarray([i for (i, j) in off])
        oj = jnp.asarray([j for (i, j) in off])
        offd = gk[:, None] * w[:, oi] * w[:, oj] * \
            (inv_l[oi] * inv_l[oj])[None, :]
    else:
        offd = jnp.zeros((xs.shape[0], 0), xs.dtype)
    diag = gk[:, None] * (w * w - 1.0) * inv_l2[None, :]
    return jnp.concatenate([vals, grad, offd, diag, gk[:, None]], axis=-1)


def pes_cross_vector(x: jax.Array, x_samples: jax.Array, x_min: jax.Array,
                     sigma, lengths) -> jax.Array:
    """k(f(x), [y_n, grad*, offdiagH*, diagH*, f*]) — compute_cov_xPrime_cz."""
    return pes_cross_matrix(x[None], x_samples, x_min, sigma, lengths)[0]


# ---------------------------------------------------------------------------
# Expectation Propagation (pes/PES/EP.py counterpart)
# ---------------------------------------------------------------------------

class PESState(NamedTuple):
    """Per-hyperparameter-set precompute for acquisition evaluation."""
    k_plus_w_inv: jax.Array   # (n_ch, n_ch)
    c_and_m: jax.Array        # (n_ch,)
    k_star_min: jax.Array     # (n_ch,)
    m_f_min: jax.Array        # scalar
    v_f_min: jax.Array        # scalar
    x_min: jax.Array          # (d,)
    sigma: jax.Array
    lengths: jax.Array
    noise: jax.Array
    chol_kn: jax.Array        # (n, n) chol of K_n + noise I


def _phi_over_ndtr(alpha):
    """phi(a) / Phi(a), computed in log space (EP.py log_Phi)."""
    return jnp.exp(-0.5 * alpha**2 - 0.5 * math.log(2 * math.pi)
                   - log_ndtr(alpha))


def expectation_propagation(channels: PESChannels, y: jax.Array,
                            hess_offdiag: jax.Array, noise,
                            num_iterations: int = 60,
                            damping: float = 0.5) -> tuple:
    """EP for the d positive-diagonal-Hessian factors and the soft
    f(x*) <= min(y) factor (EP.py:23-217 semantics, fixed iterations)."""
    kk, n, d, n_off = channels
    nc = n + d + n_off                 # c-channel count
    nz = d + 1                         # z-channel count

    k_c = kk[:nc, :nc]
    k_z = kk[nc:, nc:]
    k_zc = kk[nc:, :nc]

    c = jnp.concatenate([y, jnp.zeros((d,), y.dtype), hess_offdiag])
    chol_c = linalg.cholesky(k_c)
    kc_inv_c = linalg.cho_solve(chol_c, c)
    m_0 = k_zc @ kc_inv_c
    v_0 = k_z - k_zc @ linalg.cho_solve(chol_c, k_zc.T)
    v_0 = linalg.symmetrize(v_0)
    v_0_inv = linalg.cho_solve(linalg.cholesky(v_0),
                               jnp.eye(nz, dtype=y.dtype))

    min_y = jnp.min(y)

    def ep_iter(carry, damp):
        m, v_inv, m_tilde, v_tilde_inv = carry
        v_bar = 1.0 / (v_inv - v_tilde_inv)
        m_bar = v_bar * (m * v_inv - m_tilde * v_tilde_inv)

        # diag-Hessian positivity factors (first d z-channels)
        mb_d, vb_d = m_bar[:d], v_bar[:d]
        alpha = mb_d / jnp.sqrt(vb_d)
        ratio = _phi_over_ndtr(alpha)
        beta = ratio * (ratio + alpha) / vb_d
        kappa = (ratio + alpha) / jnp.sqrt(vb_d)
        m_new_d = mb_d + 1.0 / kappa
        v_new_d_inv = beta / (1.0 - beta * vb_d)

        # soft "f(x*) <= min y" factor (last z-channel)
        mb_l = min_y - m_bar[-1]
        vb_l = v_bar[-1] + noise
        alpha_l = mb_l / jnp.sqrt(vb_l)
        ratio_l = _phi_over_ndtr(alpha_l)
        beta_l = ratio_l * (ratio_l + alpha_l) / vb_l
        kappa_l = -(ratio_l + alpha_l) / jnp.sqrt(vb_l)
        m_new_l = mb_l + 1.0 / kappa_l
        v_new_l_inv = beta_l / (1.0 - beta_l * vb_l)

        m_tilde_new = jnp.concatenate([m_new_d, m_new_l[None]])
        v_tilde_new_inv = jnp.concatenate([v_new_d_inv, v_new_l_inv[None]])

        # stability guards as in the reference (EP.py:139-143)
        v_tilde_new_inv = jnp.where(
            jnp.abs(v_tilde_new_inv) < 1e-300, 1e-300, v_tilde_new_inv)
        neg_cavity = v_inv < 0
        m_tilde_new = jnp.where(neg_cavity, m_tilde, m_tilde_new)
        v_tilde_new_inv = jnp.where(neg_cavity, v_tilde_inv,
                                    v_tilde_new_inv)
        # NaN guard (failed site update keeps the old site)
        bad = ~jnp.isfinite(m_tilde_new) | ~jnp.isfinite(v_tilde_new_inv)
        m_tilde_new = jnp.where(bad, m_tilde, m_tilde_new)
        v_tilde_new_inv = jnp.where(bad, v_tilde_inv, v_tilde_new_inv)

        m_tilde = damp * m_tilde_new + (1 - damp) * m_tilde
        v_tilde_inv = damp * v_tilde_new_inv + (1 - damp) * v_tilde_inv

        a = jnp.diag(v_tilde_inv) + v_0_inv
        v_new = jnp.linalg.inv(linalg.symmetrize(a))
        m = v_new @ (v_tilde_inv * m_tilde + v_0_inv @ m_0)
        v_inv = 1.0 / jnp.diag(v_new)
        return (m, v_inv, m_tilde, v_tilde_inv), None

    init = (m_0, 1.0 / jnp.diag(v_0), jnp.zeros((nz,), y.dtype),
            jnp.zeros((nz,), y.dtype))
    damps = damping * 0.99 ** jnp.arange(num_iterations, dtype=y.dtype)
    (m, v_inv, m_tilde, v_tilde_inv), _ = lax.scan(ep_iter, init, damps)

    v_tilde = 1.0 / v_tilde_inv
    w_diag = jnp.concatenate([jnp.zeros((nc,), y.dtype), v_tilde])
    k_plus_w_inv = jnp.linalg.inv(linalg.symmetrize(kk + jnp.diag(w_diag)))
    c_and_m = jnp.concatenate([c, m_tilde])
    return k_plus_w_inv, c_and_m, (m_tilde, v_tilde_inv)


def make_pes_state(x_samples: jax.Array, y: jax.Array, x_min: jax.Array,
                   hess_at_min: jax.Array, sigma, lengths, noise,
                   num_ep_iterations: int = 60) -> PESState:
    """Full per-hyper-set precompute (EP + cross terms at x_min)."""
    sigma = jnp.asarray(sigma, y.dtype)
    lengths = jnp.asarray(lengths, y.dtype)
    noise = jnp.asarray(noise, y.dtype)
    channels = build_pes_covariance(x_samples, x_min, sigma, lengths,
                                    noise)
    d = channels.d
    off_idx = _offdiag_indices(d)
    hess_off = jnp.stack([hess_at_min[i, j] for (i, j) in off_idx]) \
        if off_idx else jnp.zeros((0,), y.dtype)

    k_plus_w_inv, c_and_m, _sites = expectation_propagation(
        channels, y, hess_off, noise, num_ep_iterations)

    k_star_min = pes_cross_vector(x_min, x_samples, x_min, sigma, lengths)
    m_f_min = k_star_min @ k_plus_w_inv @ c_and_m
    v_f_min = sigma - k_star_min @ k_plus_w_inv @ k_star_min

    k_n = channels.K[:channels.n, :channels.n]     # already + noise diag
    chol_kn = linalg.cholesky(k_n)
    return PESState(k_plus_w_inv=k_plus_w_inv, c_and_m=c_and_m,
                    k_star_min=k_star_min, m_f_min=m_f_min,
                    v_f_min=v_f_min, x_min=x_min, sigma=sigma,
                    lengths=lengths, noise=noise, chol_kn=chol_kn)


# ---------------------------------------------------------------------------
# Acquisition (pes/PES/PES.py counterpart)
# ---------------------------------------------------------------------------

def pes_acquisition(x: jax.Array, state: PESState,
                    x_samples: jax.Array) -> jax.Array:
    """Entropy-reduction acquisition for one hyper-set (to MAXIMIZE)."""
    k_star = pes_cross_vector(x, x_samples, state.x_min, state.sigma,
                              state.lengths)
    kw = state.k_plus_w_inv
    m_f = k_star @ kw @ state.c_and_m
    v_f = state.sigma - k_star @ kw @ k_star
    cov_x_min = k_star[-1]
    v_f_cross = cov_x_min - k_star @ kw @ state.k_star_min

    # conditioned variance given f(x) > f(x_min) (truncated-Gaussian moment)
    v_sum = v_f - 2.0 * (1 - 1e-4) * v_f_cross + state.v_f_min
    v_sum = jnp.maximum(v_sum, 1e-10)
    alpha = (m_f - state.m_f_min) / jnp.sqrt(v_sum)
    beta = _phi_over_ndtr(alpha)
    shrink = (beta / v_sum) * (alpha + beta) * (v_f - v_f_cross) ** 2
    v_cond = v_f - shrink + state.noise

    # unconditioned predictive variance from the plain GP
    n = x_samples.shape[0]
    k_n_x = k_star[:n]
    sol = linalg.solve_triangular(state.chol_kn, k_n_x, lower=True)
    v_n = state.noise + state.sigma * (1 + 1e-10) - sol @ sol

    return 0.5 * jnp.log(v_n + state.noise) - \
        0.5 * jnp.log(v_cond + state.noise)


def pes_acquisition_multi(x: jax.Array, states: PESState,
                          x_samples: jax.Array) -> jax.Array:
    """Hyper-marginalized acquisition: nan-mean over the stacked sets
    (PES_aquisition_function_multi drop-failed-sets semantics)."""
    vals = jax.vmap(lambda s: pes_acquisition(x, s, x_samples))(states)
    return jnp.nanmean(jnp.where(jnp.isfinite(vals), vals, jnp.nan))
