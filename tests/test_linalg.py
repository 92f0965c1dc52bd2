"""linalg policy-layer tests: the fantasy-solve custom-VJP pair.

The forward must be bit-identical to the refinement chains it replaced
(the KG estimator VALUES are unchanged); the backward applies the
unrefined operator transposes, which in f64 sits ~10 orders below the
FD tolerances the KG gradient pings use (documented in
ops/linalg.fantasy_solves_rhs_grad_only).  The public wrapper's contract
is grads-via-rhs-ONLY: the GP factors are stop_gradient'ed so a caller
differentiating the state sees an explicit zero, never a silently wrong
nonzero.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cornell_moe_tpu.ops import linalg


def _spd_system(rng, n=40, rhs_cols=7):
    a = rng.standard_normal((n, n))
    k = a @ a.T + n * np.eye(n)
    chol = jnp.asarray(np.linalg.cholesky(k))
    inv_chol = jnp.asarray(np.linalg.inv(np.asarray(chol)))
    rhs = jnp.asarray(rng.standard_normal((n, rhs_cols)))
    return chol, inv_chol, rhs


def test_fantasy_solves_forward_matches_refinement_chains(rng):
    chol, inv_chol, rhs = _spd_system(rng)
    va, w = linalg.fantasy_solves_rhs_grad_only(chol, inv_chol, rhs)

    va_ref = linalg.solve_lower_with_refinement(chol, inv_chol, rhs)
    w0 = linalg.hdot(inv_chol.T, va_ref)
    r2 = va_ref - linalg.hdot(chol.T, w0)
    w_ref = w0 + linalg.hdot(inv_chol.T, r2)

    # va (variance-critical) stays bit-identical to the refined chain;
    # w (mean-path) drops its refinement pass since round 5 — the
    # unrefined transpose sits at cond * eps of the refined value
    # (2 fewer (N, N) factor streams per d-KG eval, DKG_BREAKDOWN_r05)
    np.testing.assert_array_equal(np.asarray(va), np.asarray(va_ref))
    w_scale = float(jnp.max(jnp.abs(w_ref)))
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref),
                               rtol=0, atol=1e-11 * w_scale)
    # and both are accurate solves
    np.testing.assert_allclose(np.asarray(chol @ va), np.asarray(rhs),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(chol @ (chol.T @ w)),
                               np.asarray(rhs), rtol=1e-9, atol=1e-9)


def test_fantasy_solves_vjp_matches_exact_transpose(rng):
    chol, inv_chol, rhs = _spd_system(rng)

    def via_pair(r):
        va, w = linalg.fantasy_solves_rhs_grad_only(chol, inv_chol, r)
        return jnp.sum(jnp.sin(va)) + jnp.sum(jnp.cos(w))

    def via_chains(r):
        va = linalg.solve_lower_with_refinement(chol, inv_chol, r)
        w0 = linalg.hdot(inv_chol.T, va)
        r2 = va - linalg.hdot(chol.T, w0)
        w = w0 + linalg.hdot(inv_chol.T, r2)
        return jnp.sum(jnp.sin(va)) + jnp.sum(jnp.cos(w))

    g_pair = jax.grad(via_pair)(rhs)
    g_exact = jax.grad(via_chains)(rhs)
    np.testing.assert_allclose(np.asarray(g_pair), np.asarray(g_exact),
                               rtol=1e-9, atol=1e-11)


def test_fantasy_solves_vjp_f32_tolerance(rng):
    """The unrefined-transpose backward stays within f32 noise of exact.

    The parity suite runs f64; this pins the f32 behaviour the TPU path
    actually sees (ADVICE r4 item 1): the approximation error must sit
    at refinement-sized f32 noise, far below the 2e-2 FD tolerances the
    KG gradient pings use.
    """
    chol, inv_chol, rhs = (a.astype(jnp.float32) for a in _spd_system(rng))

    def via_pair(r):
        va, w = linalg.fantasy_solves_rhs_grad_only(chol, inv_chol, r)
        return jnp.sum(jnp.sin(va)) + jnp.sum(jnp.cos(w))

    def via_chains(r):
        va = linalg.solve_lower_with_refinement(chol, inv_chol, r)
        w0 = linalg.hdot(inv_chol.T, va)
        r2 = va - linalg.hdot(chol.T, w0)
        w = w0 + linalg.hdot(inv_chol.T, r2)
        return jnp.sum(jnp.sin(va)) + jnp.sum(jnp.cos(w))

    g_pair = jax.grad(via_pair)(rhs)
    g_exact = jax.grad(via_chains)(rhs)
    scale = float(jnp.max(jnp.abs(g_exact)))
    np.testing.assert_allclose(np.asarray(g_pair), np.asarray(g_exact),
                               rtol=0, atol=1e-4 * scale)


def test_fantasy_solves_factor_grads_are_zero_by_contract(rng):
    """Differentiating the factors yields exact zeros, never garbage.

    The wrapper stop_gradients chol/inv_chol: state-differentiating
    callers get a declared zero (and must use the plain refinement
    chains instead), not a silently-wrong nonzero cotangent.
    """
    chol, inv_chol, rhs = _spd_system(rng)

    def loss(c, ic):
        va, w = linalg.fantasy_solves_rhs_grad_only(c, ic, rhs)
        return jnp.sum(va * va) + jnp.sum(w)

    g_chol, g_inv = jax.grad(loss, argnums=(0, 1))(chol, inv_chol)
    np.testing.assert_array_equal(np.asarray(g_chol), 0.0)
    np.testing.assert_array_equal(np.asarray(g_inv), 0.0)


def test_fantasy_solves_vjp_under_vmap(rng):
    systems = [_spd_system(rng) for _ in range(3)]
    chols = jnp.stack([s[0] for s in systems])
    invs = jnp.stack([s[1] for s in systems])
    rhss = jnp.stack([s[2] for s in systems])

    def scalar(c, ic, r):
        va, w = linalg.fantasy_solves_rhs_grad_only(c, ic, r)
        return jnp.sum(va * va) + jnp.sum(w)

    vals = jax.vmap(scalar)(chols, invs, rhss)
    grads = jax.vmap(jax.grad(scalar, argnums=2))(chols, invs, rhss)
    singles_v = [scalar(*s) for s in systems]
    singles_g = [jax.grad(scalar, argnums=2)(*s) for s in systems]
    np.testing.assert_allclose(np.asarray(vals), np.asarray(singles_v),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(grads), np.stack(
        [np.asarray(g) for g in singles_g]), rtol=1e-9, atol=1e-11)


def test_fantasy_solves_lowp_va_is_f32_grade(rng):
    """Mixed-precision chain: va (variance-critical) must match the exact
    refined solve to ~(bf16 eps)^2 — the f32 residual measures the bf16
    product noise exactly and the correction reapplies it quadratically —
    while w (mean-path) is allowed bf16-product-level error (~4e-3)."""
    chol, inv_chol, rhs = (a.astype(jnp.float32)
                           for a in _spd_system(rng))
    va_ref, w_ref = linalg.fantasy_solves_rhs_grad_only(
        chol, inv_chol, rhs)
    va_lp, w_lp = linalg.fantasy_solves_rhs_grad_only(
        chol, inv_chol, rhs, inv_chol_lowp=inv_chol.astype(jnp.bfloat16))
    va_scale = float(jnp.max(jnp.abs(va_ref)))
    w_scale = float(jnp.max(jnp.abs(w_ref)))
    np.testing.assert_allclose(np.asarray(va_lp), np.asarray(va_ref),
                               rtol=0, atol=3e-4 * va_scale)
    np.testing.assert_allclose(np.asarray(w_lp), np.asarray(w_ref),
                               rtol=0, atol=2e-2 * w_scale)


def test_fantasy_solves_lowp_vjp_tolerance(rng):
    """The mixed backward (bf16-streamed operator transposes) stays within
    bf16-product noise of the exact-transpose gradient."""
    chol, inv_chol, rhs = (a.astype(jnp.float32)
                           for a in _spd_system(rng))
    lowp = inv_chol.astype(jnp.bfloat16)

    def via_lowp(r):
        va, w = linalg.fantasy_solves_rhs_grad_only(
            chol, inv_chol, r, inv_chol_lowp=lowp)
        return jnp.sum(jnp.sin(va)) + jnp.sum(jnp.cos(w))

    def via_exact(r):
        va, w = linalg.fantasy_solves_rhs_grad_only(chol, inv_chol, r)
        return jnp.sum(jnp.sin(va)) + jnp.sum(jnp.cos(w))

    g_lp = jax.grad(via_lowp)(rhs)
    g_ex = jax.grad(via_exact)(rhs)
    scale = float(jnp.max(jnp.abs(g_ex)))
    np.testing.assert_allclose(np.asarray(g_lp), np.asarray(g_ex),
                               rtol=0, atol=2e-2 * scale)
