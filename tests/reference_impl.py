"""Slow, trusted numpy reference implementations for parity tests.

Mirrors the reference's test strategy (SURVEY.md section 4): keep an
independent implementation and assert the fast JAX path matches it.  These
are written directly from the math (not from either codebase's fast path).
"""

import numpy as np


def se_kernel(alpha, lengths, x, y):
    d = (np.asarray(x) - np.asarray(y)) / np.asarray(lengths)
    return alpha * np.exp(-0.5 * np.dot(d, d))


def matern52_kernel(alpha, lengths, x, y):
    d = (np.asarray(x) - np.asarray(y)) / np.asarray(lengths)
    r = np.sqrt(np.dot(d, d))
    return alpha * (1 + np.sqrt(5) * r + 5 * r**2 / 3) * \
        np.exp(-np.sqrt(5) * r)


def build_k(kernel, alpha, lengths, xs):
    n = len(xs)
    k = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            k[i, j] = kernel(alpha, lengths, xs[i], xs[j])
    return k


def gp_posterior(kernel, alpha, lengths, x_train, y_train, noise, x_test,
                 mean=0.0):
    """Plain value-only GP posterior (mean, full covariance)."""
    x_train = np.asarray(x_train)
    x_test = np.asarray(x_test)
    n, q = len(x_train), len(x_test)
    k = build_k(kernel, alpha, lengths, x_train) + noise * np.eye(n)
    ks = np.zeros((n, q))
    for i in range(n):
        for j in range(q):
            ks[i, j] = kernel(alpha, lengths, x_train[i], x_test[j])
    kss = build_k(kernel, alpha, lengths, x_test)
    k_inv = np.linalg.inv(k)
    mu = mean + ks.T @ k_inv @ (np.asarray(y_train) - mean)
    cov = kss - ks.T @ k_inv @ ks
    return mu, cov


def central_difference(f, x, eps=1e-6):
    """Gradient of scalar-valued f at vector x by central differences."""
    x = np.asarray(x, dtype=float)
    g = np.zeros_like(x)
    for i in range(x.size):
        xp, xm = x.copy(), x.copy()
        xp.flat[i] += eps
        xm.flat[i] -= eps
        g.flat[i] = (f(xp) - f(xm)) / (2 * eps)
    return g
