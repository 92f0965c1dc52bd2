"""Dense linear-algebra primitives for the GP core.

TPU-native replacement for the reference's hand-rolled BLAS layer
(``gpp_linear_algebra.{hpp,cpp}``): on TPU the individual kernels
(Cholesky, triangular solves, GEMM) are XLA primitives that tile onto the
MXU, so this module is a thin policy layer — jitter handling, batched
helpers, and a stable log-det — rather than a reimplementation.

All matrices are row-major jnp arrays; batched variants operate over leading
axes via vmap inside jit (the TPU analogue of the reference's per-thread
preallocated temporaries).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# TPU MXU f32 matmuls default to one-pass bf16 multiplication (~8e-3
# relative error) under jax_default_matmul_precision='default'.  GP
# posterior algebra is cancellation-sensitive, so every matmul on the
# covariance path uses full f32 (HIGHEST = 6-pass bf16) via this helper.
HIGHEST = lax.Precision.HIGHEST


def hdot(a: jax.Array, b: jax.Array) -> jax.Array:
    """matmul at full f32 precision (see HIGHEST note above)."""
    return jnp.matmul(a, b, precision=HIGHEST)


def add_jitter(matrix: jax.Array, jitter) -> jax.Array:
    """Add ``jitter`` to the diagonal of the (..., n, n) matrix."""
    n = matrix.shape[-1]
    return matrix + jitter * jnp.eye(n, dtype=matrix.dtype)


def cholesky(matrix: jax.Array, jitter=0.0) -> jax.Array:
    """Lower Cholesky factor of an SPD matrix with optional diagonal jitter.

    Counterpart of ``ComputeCholeskyFactorL`` (gpp_linear_algebra.hpp:157).
    The reference raises SingularMatrixException on failure; under jit we
    return NaNs instead (callers surface this via ``jnp.isnan`` checks at the
    API boundary, see ``cornell_moe_tpu.models.gp``).
    """
    if jitter:
        matrix = add_jitter(matrix, jitter)
    return jnp.linalg.cholesky(matrix)


def solve_triangular(chol: jax.Array, rhs: jax.Array, *, lower: bool = True,
                     trans: bool = False) -> jax.Array:
    """Triangular solve (counterpart of TriangularMatrixVectorSolve)."""
    return jax.scipy.linalg.solve_triangular(chol, rhs, lower=lower,
                                             trans=1 if trans else 0)


def cho_solve(chol: jax.Array, rhs: jax.Array) -> jax.Array:
    """Solve ``A x = rhs`` given the lower Cholesky factor of A.

    Counterpart of ``CholeskyFactorLMatrixVectorSolve``.
    """
    y = solve_triangular(chol, rhs, lower=True, trans=False)
    return solve_triangular(chol, y, lower=True, trans=True)


def log_det_from_chol(chol: jax.Array) -> jax.Array:
    """log det(A) = 2 * sum(log(diag(L))) for A = L L^T."""
    diag = jnp.diagonal(chol, axis1=-2, axis2=-1)
    return 2.0 * jnp.sum(jnp.log(diag), axis=-1)


def spd_solve(matrix: jax.Array, rhs: jax.Array, jitter=0.0) -> jax.Array:
    """Solve an SPD system via Cholesky (counterpart of SPDMatrixInverse use)."""
    return cho_solve(cholesky(matrix, jitter=jitter), rhs)


def solve_lower_with_refinement(chol: jax.Array, inv_chol: jax.Array,
                                rhs: jax.Array, iterations: int = 1
                                ) -> jax.Array:
    """L x = rhs via explicit-inverse matmul + iterative refinement.

    TPU-native replacement for the sequential triangular solve on hot
    paths: the matmul x0 = L^-1 rhs runs on the MXU but carries forward
    error ~ cond(L) * eps; each refinement step (two more matmuls) squares
    that factor, matching backward-stable solve accuracy after one step
    for the condition numbers seen in GP covariances.
    """
    x = hdot(inv_chol, rhs)
    for _ in range(iterations):
        r = rhs - hdot(chol, x)
        x = x + hdot(inv_chol, r)
    return x


def fantasy_solves_rhs_grad_only(chol: jax.Array, inv_chol: jax.Array,
                                 rhs: jax.Array, inv_chol_lowp=None):
    """(va, w) = (refined L^-1 rhs, refined K^-1 rhs); grads flow via rhs ONLY.

    Contract (in the name): ``chol`` and ``inv_chol`` are treated as
    constants — they receive ZERO cotangents, enforced here with
    ``stop_gradient`` so differentiating the GP state through this helper
    is declared non-differentiable rather than silently wrong.  Callers
    that need state gradients must use the plain refinement chains.
    See :func:`_fantasy_solves_pair` for the cheap-VJP rationale.

    ``inv_chol_lowp`` (optional, bfloat16 copy of ``inv_chol``): switch
    to the low-byte mixed-precision chain — every inverse application
    streams the half-width bf16 factor with f32 accumulation, and ONLY
    the residual-refinement matmul against the f32 ``chol`` runs at
    HIGHEST.  Error structure: va0 carries bf16-product noise (~4e-3
    relative), the f32 residual measures it exactly, and the bf16
    correction reapplies it to ~(4e-3)^2 ~ 2e-5 relative — so ``va``
    (the variance-critical output) stays f32-grade while the factor
    bytes halve on 5 of the 6 streaming matmuls (w and the VJP are
    mean/gradient-path, where ~4e-3 relative sits far below the KG
    estimator's MC noise).  Equivalence bounds are pinned by
    tests/test_linalg.py::test_fantasy_solves_lowp_*.
    """
    if inv_chol_lowp is None:
        return _fantasy_solves_pair(lax.stop_gradient(chol),
                                    lax.stop_gradient(inv_chol), rhs)
    return _fantasy_solves_pair_mixed(
        lax.stop_gradient(chol), lax.stop_gradient(inv_chol_lowp), rhs)


def _bdot(a_lowp: jax.Array, b: jax.Array) -> jax.Array:
    """One-pass MXU matmul streaming bf16 operands, f32 accumulation."""
    return jnp.matmul(a_lowp, b.astype(a_lowp.dtype),
                      preferred_element_type=jnp.float32)


@jax.custom_vjp
def _fantasy_solves_pair_mixed(chol: jax.Array, inv_chol_lowp: jax.Array,
                               rhs: jax.Array):
    """Low-byte (va, w) solve pair; see fantasy_solves_rhs_grad_only."""
    return _fantasy_solves_mixed_impl(chol, inv_chol_lowp, rhs)


def _fantasy_solves_mixed_impl(chol, inv_chol_lowp, rhs):
    va0 = _bdot(inv_chol_lowp, rhs)
    r = rhs - hdot(chol, va0)            # f32 residual: exact correction
    va = va0 + _bdot(inv_chol_lowp, r)
    w = _bdot(jnp.swapaxes(inv_chol_lowp, -1, -2), va)
    return va, w


def _fantasy_solves_mixed_fwd(chol, inv_chol_lowp, rhs):
    out = _fantasy_solves_mixed_impl(chol, inv_chol_lowp, rhs)
    return out, (chol, inv_chol_lowp)


def _fantasy_solves_mixed_bwd(res, cts):
    chol, inv_chol_lowp = res
    ct_va, ct_w = cts
    ct_va_total = ct_va + _bdot(inv_chol_lowp, ct_w)
    ct_rhs = _bdot(jnp.swapaxes(inv_chol_lowp, -1, -2), ct_va_total)
    return jnp.zeros_like(chol), jnp.zeros_like(inv_chol_lowp), ct_rhs


_fantasy_solves_pair_mixed.defvjp(_fantasy_solves_mixed_fwd,
                                  _fantasy_solves_mixed_bwd)


@jax.custom_vjp
def _fantasy_solves_pair(chol: jax.Array, inv_chol: jax.Array,
                         rhs: jax.Array):
    """(va, w) = (refined L^-1 rhs, refined K^-1 rhs) with a cheap VJP.

    The KG fantasy build needs both the whitened cross-covariance
    va = L^-1 k and the representer weights w = K^-1 k for a moving
    rhs = k(X, U) (the union points are the differentiated variables).
    Both chains are LINEAR in rhs, so reverse-mode autodiff transposes
    every refinement matmul — 6 extra (N_ch, N_ch) HIGHEST matmuls per
    backward on the d-KG hot path, ~half its per-evaluation FLOPs.

    Forward: va keeps its full residual refinement (va feeds
    var_u = prior - va^T va, which sits 2-3 orders below |va|^2 at
    production scale — var_u needs va at ABSOLUTE accuracy ~1e-5 of
    the va scale, which only the refined f32 chain provides; see the
    KG_FANTASY_LOWP rejection note in config.py for the measured
    consequence of relaxing this).  w = L^-T va applies the explicit
    inverse transpose ONCE, without its former refinement pass: the
    unrefined operator error is cond(L) * f32 eps ~ 1e-6 relative on a
    MEAN-path quantity (w weights the fantasy-mean projection only),
     4-5 orders below the estimator's MC band — and dropping the pass
    removes 2 of the 6 (N_ch, N_ch) forward factor streams per d-KG
    evaluation (the measured HBM bottleneck, DKG_BREAKDOWN_r05).

    Backward: the UNREFINED operator transposes,

        ct_va_total = ct_va + L^-1 ct_w        (w = ~L^-T va)
        ct_rhs      = L^-T ct_va_total         (va = ~L^-1 rhs)

    i.e. 2 matmuls instead of 6.  The backward error relative to the
    true transpose is O(||I - L L^-1||) ~ cond * eps of the stored
    explicit inverse — refinement-sized noise on a *gradient* that only
    drives outer gradient-descent steps (the convergence gate and the
    final suggest scoring use forward VALUES).  The f64/CPU parity
    suite FD-pings these gradients at rtol 2e-2; the approximation sits
    ~10 orders below that in f64.
    """
    return _fantasy_solves_impl(chol, inv_chol, rhs)


def _fantasy_solves_impl(chol, inv_chol, rhs):
    va = solve_lower_with_refinement(chol, inv_chol, rhs)
    w = hdot(inv_chol.T, va)
    return va, w


def _fantasy_solves_fwd(chol, inv_chol, rhs):
    out = _fantasy_solves_impl(chol, inv_chol, rhs)
    return out, (chol, inv_chol)


def _fantasy_solves_bwd(res, cts):
    chol, inv_chol = res
    ct_va, ct_w = cts
    ct_va_total = ct_va + hdot(inv_chol, ct_w)
    ct_rhs = hdot(inv_chol.T, ct_va_total)
    # factor cotangents are zero BY CONTRACT (the public wrapper
    # stop_gradients them); the zeros are DCE'd by XLA
    return jnp.zeros_like(chol), jnp.zeros_like(inv_chol), ct_rhs


_fantasy_solves_pair.defvjp(_fantasy_solves_fwd, _fantasy_solves_bwd)


def cho_solve_with_refinement(chol: jax.Array, inv_chol: jax.Array,
                              rhs: jax.Array, iterations: int = 1
                              ) -> jax.Array:
    """(L L^T) x = rhs via Gram matmuls + iterative refinement."""
    def apply_inv(b):
        return hdot(inv_chol.T, hdot(inv_chol, b))

    x = apply_inv(rhs)
    for _ in range(iterations):
        r = rhs - hdot(chol, hdot(chol.T, x))
        x = x + apply_inv(r)
    return x


def safe_sqrt(s: jax.Array) -> jax.Array:
    """sqrt with autodiff-safe behaviour at 0.

    ``jnp.sqrt`` has a NaN gradient at 0; kernels evaluate pairwise distances
    at coincident points (the diagonal of every covariance matrix), so every
    r = sqrt(s) in the covariance layer goes through this guard.  The guarded
    derivative at s == 0 is 0, which composes to the exact total derivative
    for all Matérn-family expressions used here (each 1/r cancels against a
    factor of the pairwise difference).
    """
    safe = jnp.where(s > 0.0, s, 1.0)
    return jnp.where(s > 0.0, jnp.sqrt(safe), 0.0)


def batched_cholesky(matrices: jax.Array, jitter=0.0) -> jax.Array:
    """Cholesky over a leading batch axis (hyperparameter-ensemble axis)."""
    if jitter:
        matrices = add_jitter(matrices, jitter)
    return jnp.linalg.cholesky(matrices)


def cholesky_small(a: jax.Array, max_unrolled: int = 16) -> jax.Array:
    """Cholesky of tiny SPD matrices (..., k, k), unrolled at trace time.

    XLA's batched Cholesky lowers to a sequential blocked loop with tiny
    per-step kernels — latency-bound for the (B, q_ch, q_ch) fantasy
    factorizations KG performs per optimizer step (q_ch ~ 4-16).  The
    k <= ``max_unrolled`` unroll emits pure elementwise ops over the batch
    that fuse into neighbouring computations, and is exactly the textbook
    algorithm so autodiff gives the standard Cholesky derivative chain.
    Falls back to ``jnp.linalg.cholesky`` for larger k.
    """
    k = a.shape[-1]
    if k > max_unrolled:
        return jnp.linalg.cholesky(a)
    zero = jnp.zeros_like(a[..., 0, 0])
    col: list[list] = [[None] * k for _ in range(k)]
    for j in range(k):
        s = a[..., j, j]
        for p in range(j):
            s = s - col[j][p] * col[j][p]
        d = jnp.sqrt(s)
        col[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, k):
            s = a[..., i, j]
            for p in range(j):
                s = s - col[i][p] * col[j][p]
            col[i][j] = s * inv_d
    rows = [jnp.stack([col[i][j] if j <= i else zero for j in range(k)],
                      axis=-1) for i in range(k)]
    return jnp.stack(rows, axis=-2)


def solve_triangular_small(l: jax.Array, rhs: jax.Array, *,
                           trans: bool = False,
                           max_unrolled: int = 16) -> jax.Array:
    """Solve L x = rhs (or L^T x = rhs) for tiny lower-triangular L.

    ``l`` is (..., k, k) lower, ``rhs`` is (..., k, m); substitution is
    unrolled at trace time into k batched elementwise steps (see
    :func:`cholesky_small` for why).  Falls back to
    ``lax.linalg.triangular_solve`` for k > ``max_unrolled``.
    """
    k = l.shape[-1]
    if k > max_unrolled:
        return lax.linalg.triangular_solve(
            l, rhs, left_side=True, lower=True, transpose_a=trans)
    x: list = [None] * k
    order = range(k) if not trans else range(k - 1, -1, -1)
    for j in order:
        s = rhs[..., j, :]
        if not trans:
            for p in range(j):
                s = s - l[..., j, p, None] * x[p]
        else:
            for p in range(j + 1, k):
                s = s - l[..., p, j, None] * x[p]
        x[j] = s / l[..., j, j, None]
    return jnp.stack(x, axis=-2)


def symmetrize(matrix: jax.Array) -> jax.Array:
    return 0.5 * (matrix + jnp.swapaxes(matrix, -1, -2))


def chol_update_append(chol: jax.Array, cross_cov: jax.Array,
                       new_block: jax.Array) -> jax.Array:
    """Grow a Cholesky factor when appending rows/cols to an SPD matrix.

    Given L (n, n) with A = L L^T, the cross-covariance B (n, q) and the new
    diagonal block C (q, q), returns the (n+q, n+q) lower factor of
    ``[[A, B], [B^T, C]]`` without refactorizing A:

        L' = [[L, 0], [S^T, chol(C - S^T S)]],  S = L^{-1} B.

    This is the TPU-native analogue of the reference's fantasy-GP update
    (``GaussianProcess::AddPointsToGP``, gpp_math.hpp:393-406): O(n^2 q)
    instead of O(n^3).
    """
    n = chol.shape[-1]
    q = new_block.shape[-1]
    s = solve_triangular(chol, cross_cov, lower=True)          # (n, q)
    schur = new_block - hdot(s.T, s)                            # (q, q)
    chol_schur = jnp.linalg.cholesky(schur)
    top = jnp.concatenate([chol, jnp.zeros((n, q), chol.dtype)], axis=1)
    bot = jnp.concatenate([s.T, chol_schur], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def lower_triangular_only(matrix: jax.Array) -> jax.Array:
    """Zero the strict upper triangle (ZeroUpperTriangle counterpart)."""
    return jnp.tril(matrix)
