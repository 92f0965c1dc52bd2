"""Knowledge Gradient acquisition: q-KG, d-KG, MCMC-averaged and
continuous-fidelity variants, plus posterior-mean optimization.

Counterpart of ``gpp_knowledge_gradient_optimization.{hpp,cpp}`` and
``gpp_knowledge_gradient_mcmc_optimization.{hpp,cpp}`` in the reference.

Semantics preserved (minimization convention, reference cites in-line):
  * KG(U) = E_z[ best_posterior - min_x mu'_z(x) ] with
    best_posterior = min(best_so_far, min_j mu(U_j))
    (KnowledgeGradientEvaluator::ComputeKnowledgeGradient,
    gpp_knowledge_gradient_optimization.cpp:69-115)
  * fantasy observations y_U = mu_U + C z, C = chol(PostCov(U) + noise diag)
    (noise added per channel, .cpp:303-309), z antithetic (.cpp:88-97)
  * the inner minimization of the fantasized posterior mean starts from the
    best point of the discretized set (discrete_pts ++ union) and is
    GD-polished (ComputeOptimalPosteriorMean, .cpp:420-473, top-1 start)
  * fidelity dimensions (the last num_fidelity coords) are pinned to 1.0
    inside the posterior-mean objective (.cpp:364-365)
  * MCMC averaging divides by cost = max_i prod(fidelity coords of U_i)
    (gpp_knowledge_gradient_mcmc_optimization.cpp:87-104)
  * gradient wrt points_to_sample is the envelope/winner gradient — here
    simply jax.grad with stop_gradient on the inner argmin
    (replacing ComputeGradInverseCholeskyCovarianceOfPoints et al.)

TPU-native design
-----------------
The reference copies the GP, appends fantasy values, and refactorizes
per MC draw (NewSampledValue + RecomputeDerivedVariables).  Here the
fantasized posterior mean is algebraically collapsed to

    mu'_z(x) = prior_mean + k(x, X) @ alpha_z + k(x, U) @ beta_z
    alpha_z  = K^{-1}(y - m) - V z,   V = K^{-1} K(X,U) C^{-T}
    beta_z   = C^{-T} z

so each inner-GD step is two kernel rows and two dot products — no
triangular solves — and the MC axis, the inner multistart axis, and the
hyperparameter-ensemble axis are all vmapped batch dimensions of one XLA
program.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from cornell_moe_tpu.models import covariance as cov_mod
from cornell_moe_tpu.models import gp as gp_mod
from cornell_moe_tpu.models.gp import GaussianProcessState
from cornell_moe_tpu.ops import linalg, optimizers
from cornell_moe_tpu.acquisition.expected_improvement import (
    draw_antithetic_normals)


# ---------------------------------------------------------------------------
# Posterior mean as an optimizable objective (PosteriorMeanEvaluator)
# ---------------------------------------------------------------------------

def _pin_fidelity(x_opt: jax.Array, dim: int, num_fidelity: int
                  ) -> jax.Array:
    """Lift an optimization point (dim - num_fidelity,) to full dim with
    fidelity coordinates pinned to 1.0 (gpp_kg_optimization.cpp:364-365)."""
    if num_fidelity == 0:
        return x_opt
    ones = jnp.ones((num_fidelity,), x_opt.dtype)
    return jnp.concatenate([x_opt, ones])


def posterior_mean_objective(state: GaussianProcessState, x_opt: jax.Array,
                             num_fidelity: int = 0) -> jax.Array:
    """-posterior_mean at the fidelity-pinned point (maximized)."""
    x = _pin_fidelity(x_opt, state.dim, num_fidelity)
    return -gp_mod.posterior_mean(state, x[None])[0, 0]


def compute_optimal_posterior_mean(
        state: GaussianProcessState, domain,
        initial_guesses: jax.Array,
        params: optimizers.GradientDescentParameters,
        num_fidelity: int = 0, top_k: int = 1):
    """Maximize -mu over the domain starting from the best of the guesses.

    Counterpart of ComputeOptimalPosteriorMean
    (gpp_knowledge_gradient_optimization.cpp:420-473).  Returns
    (best_point_opt_coords, best_value = max(-mu)).
    """
    def vg(x):
        return jax.value_and_grad(
            lambda p: posterior_mean_objective(state, p, num_fidelity))(x)

    vals = jax.vmap(lambda x: vg(x)[0])(initial_guesses)
    k = min(top_k, initial_guesses.shape[0])
    _, idx = lax.top_k(vals, k)
    starts = initial_guesses[idx]
    res = optimizers.multistart_optimize(vg, domain, starts, params)
    return res.best_point, res.best_value


# ---------------------------------------------------------------------------
# KG core
# ---------------------------------------------------------------------------

class _FantasyModel(NamedTuple):
    """Union-dependent precompute enabling O(kernel-row) fantasy means."""
    mu_union: jax.Array       # (q_ch,) posterior mean over union channels
    chol_union: jax.Array     # (q_ch, q_ch) C
    v: jax.Array              # (N, q_ch)  V = K^{-1} K(X,U) C^{-T}
    union: jax.Array          # (q, dim)


def _build_fantasy_model(state: GaussianProcessState, union: jax.Array,
                         derivatives_to_sample: Sequence[int] = ()
                         ) -> _FantasyModel:
    ds = tuple(int(i) for i in derivatives_to_sample)
    mu_u = gp_mod.posterior_mean(state, union, ds).reshape(-1)
    var_u = linalg.symmetrize(gp_mod.posterior_variance(state, union, ds))
    q = union.shape[0]
    noise = jnp.tile(state.noise_variance[:1 + len(ds)], q)
    # Low-precision guard: at large num_sampled the f32 posterior variance
    # carries cancellation error that can push diagonal entries slightly
    # negative; repair with a stop-gradient diagonal shift so the Cholesky
    # (reference adds observation noise only, gpp_kg_opt.cpp:303-309)
    # stays finite.  Exactly zero in well-conditioned/f64 settings.
    min_diag = jnp.min(jnp.diagonal(var_u))
    repair = lax.stop_gradient(jnp.maximum(0.0, -1.5 * min_diag))
    chol_u = linalg.cholesky(var_u + jnp.diag(noise + repair))

    k_xu = cov_mod.build_block_covariance(
        state.covariance, state.points_sampled, state.derivatives, union, ds)
    if state.inv_chol_K is not None:
        w = linalg.cho_solve_with_refinement(state.chol_K,
                                             state.inv_chol_K, k_xu)
    else:
        w = linalg.cho_solve(state.chol_K, k_xu)        # (N, q_ch)
    v = linalg.solve_triangular(chol_u, w.T, lower=True).T
    return _FantasyModel(mu_union=mu_u, chol_union=chol_u, v=v, union=union)


def _fantasy_mean_fn(state: GaussianProcessState, model: _FantasyModel,
                     alpha: jax.Array, beta: jax.Array,
                     derivatives_to_sample: Sequence[int],
                     num_fidelity: int):
    """mu'_z(x_opt) with the given fantasy weights."""
    ds = tuple(int(i) for i in derivatives_to_sample)

    def mu(x_opt):
        x = _pin_fidelity(x_opt, state.dim, num_fidelity)[None]
        k_xx = cov_mod.build_block_covariance(
            state.covariance, x, (), state.points_sampled,
            state.derivatives)[0]
        k_xu = cov_mod.build_block_covariance(
            state.covariance, x, (), model.union, ds)[0]
        return state.mean + k_xx @ alpha + k_xu @ beta
    return mu


def knowledge_gradient(state: GaussianProcessState, union: jax.Array,
                       discrete_pts: jax.Array, normals: jax.Array,
                       domain,
                       inner_params: optimizers.GradientDescentParameters,
                       best_so_far, num_fidelity: int = 0,
                       derivatives_to_sample: Sequence[int] = ()
                       ) -> jax.Array:
    """MC q-KG estimator; differentiable wrt ``union`` via jax.grad.

    ``union`` is (q, dim) = points_to_sample ++ points_being_sampled;
    ``discrete_pts`` is (n_d, dim - num_fidelity) inner-optimization seeds;
    ``normals`` is (n_mc, q_ch).  ``domain`` is the inner (opt-coords)
    domain.
    """
    ds = tuple(int(i) for i in derivatives_to_sample)
    model = _build_fantasy_model(state, union, ds)

    best_posterior = jnp.minimum(
        best_so_far,
        jnp.min(model.mu_union.reshape(union.shape[0], -1)[:, 0]))

    k_inv_y = state.K_inv_y
    dim_opt = state.dim - num_fidelity
    starts_all = jnp.concatenate(
        [discrete_pts, lax.stop_gradient(union[:, :dim_opt])], axis=0)

    frozen = lax.stop_gradient(model)

    # All fantasy weights at once: alphas (n_mc, N), betas (n_mc, q_ch).
    betas = linalg.solve_triangular(model.chol_union, normals.T,
                                    lower=True, trans=True).T
    alphas = k_inv_y[None, :] - linalg.hdot(normals, model.v.T)

    # Discretized-set seeding for ALL draws as two MXU matmuls: the kernel
    # rows over the seed set are shared across draws (the reference — and
    # our earlier version — recomputed them per draw per start,
    # 128x more transcendentals).
    starts_full = jax.vmap(
        lambda p: _pin_fidelity(p, state.dim, num_fidelity))(starts_all)
    k_sx = cov_mod.build_block_covariance(
        state.covariance, starts_full, (), state.points_sampled,
        state.derivatives)                       # (n_starts, N)
    k_su_frozen = cov_mod.build_block_covariance(
        state.covariance, starts_full, (), frozen.union, ds)
    mu_starts = state.mean + \
        linalg.hdot(k_sx, lax.stop_gradient(alphas).T) + \
        linalg.hdot(k_su_frozen, lax.stop_gradient(betas).T)
    x0_idx = jnp.argmin(mu_starts, axis=0)          # (n_mc,)
    x0_all = starts_all[x0_idx]

    def per_draw(z, alpha, beta, x0):
        # frozen copies drive the inner argmin (envelope theorem)
        beta_f = lax.stop_gradient(beta)
        alpha_f = lax.stop_gradient(alpha)
        mu_frozen = _fantasy_mean_fn(state, frozen, alpha_f, beta_f, ds,
                                     num_fidelity)
        mu_live = _fantasy_mean_fn(state, model, alpha, beta, ds,
                                   num_fidelity)

        def vg(x):
            v, g = jax.value_and_grad(mu_frozen)(x)
            return -v, -g                      # maximize -mu'

        x_star = optimizers.gradient_ascent(vg, domain, x0, inner_params)
        x_star = lax.stop_gradient(x_star)
        # take the better of the GD endpoint and its start, evaluated
        # differentiably (guards against stray divergence under vmap)
        best_min = jnp.minimum(mu_live(x_star), mu_live(x0))
        return best_posterior - best_min

    contributions = jax.vmap(per_draw)(normals, alphas, betas, x0_all)
    return jnp.mean(contributions)


def knowledge_gradient_value_and_grad(
        state: GaussianProcessState, points_to_sample: jax.Array,
        points_being_sampled, discrete_pts: jax.Array,
        normals: jax.Array, domain,
        inner_params: optimizers.GradientDescentParameters,
        best_so_far, num_fidelity: int = 0,
        derivatives_to_sample: Sequence[int] = ()):
    """(KG, dKG/dpoints_to_sample) — ComputeGradKnowledgeGradient parity."""
    pts = jnp.atleast_2d(points_to_sample)
    being = None if points_being_sampled is None or \
        jnp.size(points_being_sampled) == 0 else \
        jnp.atleast_2d(points_being_sampled)

    def f(p):
        union = p if being is None else jnp.concatenate([p, being], axis=0)
        return knowledge_gradient(state, union, discrete_pts, normals,
                                  domain, inner_params, best_so_far,
                                  num_fidelity, derivatives_to_sample)
    return jax.value_and_grad(f)(pts)


# ---------------------------------------------------------------------------
# Batched-union KG (the TPU fast path)
# ---------------------------------------------------------------------------
#
# The multistart optimizer evaluates KG at B candidate unions per GD step.
# Computing each union's precompute separately leaves every matmul with an
# RHS width of q_ch (~4), which pads to a full 128-lane MXU tile — 32x
# wasted compute.  The batched path fuses the B unions' kernel columns into
# single wide matmuls (RHS width B*q_ch) and runs the whole multistart step
# through full tiles.  Semantics identical to knowledge_gradient.

def _build_fantasy_model_batch(state: GaussianProcessState,
                               unions: jax.Array,
                               derivatives_to_sample: Sequence[int] = ()):
    """Batched fantasy precompute: unions is (B, q, dim).

    Returns (mu_u (B, q_ch), chol_u (B, q_ch, q_ch), v (B, N, q_ch)).
    """
    ds = tuple(int(i) for i in derivatives_to_sample)
    b, q, dim = unions.shape
    c = 1 + len(ds)
    q_ch = q * c
    flat = unions.reshape(b * q, dim)

    k_xu_flat = gp_mod._mix_cov(state, flat, ds)       # (N, B*q_ch)
    n_ch = k_xu_flat.shape[0]
    mu_u = (linalg.hdot(k_xu_flat.T, state.K_inv_y)
            .reshape(b, q, c).at[:, :, 0].add(state.mean)
            .reshape(b, q_ch))

    va = linalg.solve_lower_with_refinement(
        state.chol_K, state.inv_chol_K, k_xu_flat).reshape(n_ch, b, q_ch)
    prior_u = jax.vmap(lambda u: cov_mod.build_block_covariance(
        state.covariance, u, ds, u, ds))(unions)       # (B, q_ch, q_ch)
    var_u = prior_u - jnp.einsum("nbi,nbj->bij", va, va,
                                 precision=linalg.HIGHEST)
    var_u = linalg.symmetrize(var_u)

    noise = jnp.tile(state.noise_variance[:c], q)
    min_diag = jnp.min(jnp.diagonal(var_u, axis1=-2, axis2=-1), axis=-1)
    repair = lax.stop_gradient(jnp.maximum(0.0, -1.5 * min_diag))
    var_u = var_u + (noise[None, :] + repair[:, None])[..., None] * \
        jnp.eye(q_ch, dtype=var_u.dtype)
    chol_u = jnp.linalg.cholesky(var_u)                # (B, q_ch, q_ch)

    # w = K^-1 k = L^-T va, reusing the refined va (saves a full
    # cho_solve refinement chain: 3 matmuls instead of 6)
    va_flat = va.reshape(n_ch, b * q_ch)
    w0 = linalg.hdot(state.inv_chol_K.T, va_flat)
    r2 = va_flat - linalg.hdot(state.chol_K.T, w0)
    w = (w0 + linalg.hdot(state.inv_chol_K.T, r2)).reshape(n_ch, b, q_ch)
    v = jax.vmap(lambda cu, wb: linalg.solve_triangular(
        cu, wb.T, lower=True).T)(chol_u, jnp.moveaxis(w, 1, 0))
    return mu_u, chol_u, v


def knowledge_gradient_batch(state: GaussianProcessState,
                             unions: jax.Array, discrete_pts: jax.Array,
                             normals: jax.Array, domain, inner_params,
                             best_so_far, num_fidelity: int = 0,
                             derivatives_to_sample: Sequence[int] = ()
                             ) -> jax.Array:
    """KG at B unions at once: (B, q, dim) -> (B,).

    Identical estimator to :func:`knowledge_gradient`; requires a state
    fitted with ``precompute_inverse=True``.
    """
    ds = tuple(int(i) for i in derivatives_to_sample)
    b, q, dim = unions.shape
    c = 1 + len(ds)
    q_ch = q * c
    n_mc = normals.shape[0]
    dim_opt = dim - num_fidelity

    mu_u, chol_u, v = _build_fantasy_model_batch(state, unions, ds)
    best_posterior = jnp.minimum(
        best_so_far, jnp.min(mu_u.reshape(b, q, c)[:, :, 0], axis=1))

    # fantasy weights for every (union, draw)
    betas = jax.vmap(lambda cu: linalg.solve_triangular(
        cu, normals.T, lower=True, trans=True).T)(chol_u)  # (B, n_mc, q_ch)
    alphas = state.K_inv_y[None, None, :] - jnp.einsum(
        "mq,bnq->bmn", normals, v, precision=linalg.HIGHEST)

    # seeding over the discretized set, batched over unions
    starts = jnp.concatenate([
        jnp.broadcast_to(discrete_pts, (b,) + discrete_pts.shape),
        lax.stop_gradient(unions[:, :, :dim_opt])], axis=1)  # (B, n_s, d')
    n_s = starts.shape[1]
    starts_full = jax.vmap(jax.vmap(
        lambda p: _pin_fidelity(p, dim, num_fidelity)))(starts)
    k_sx = gp_mod._mix_cov(
        state, starts_full.reshape(b * n_s, dim), ()).T.reshape(b, n_s, -1)
    k_su = jax.vmap(lambda sf, u: cov_mod.build_block_covariance(
        state.covariance, sf, (), u, ds))(starts_full, unions)

    # mu'_z over the seed set, factored through the q_ch-dim fantasy
    # subspace: mu' = mean + k_sx K_inv_y - (k_sx V) z + k_su beta.
    # Contracting through q_ch (~4) instead of N (~500) per draw cuts the
    # seeding einsums by ~N/q_ch.
    base = jnp.einsum("bsn,n->bs", k_sx, state.K_inv_y,
                      precision=linalg.HIGHEST)
    ksv = jnp.einsum("bsn,bnq->bsq", k_sx, lax.stop_gradient(v),
                     precision=linalg.HIGHEST)
    mu_starts = state.mean + base[:, :, None] - \
        jnp.einsum("bsq,mq->bsm", ksv, normals,
                   precision=linalg.HIGHEST) + \
        jnp.einsum("bsq,bmq->bsm", k_su, lax.stop_gradient(betas),
                   precision=linalg.HIGHEST)
    x0_idx = jnp.argmin(mu_starts, axis=1)                  # (B, n_mc)
    x0 = jnp.take_along_axis(starts, x0_idx[..., None], axis=1)

    frozen_unions = lax.stop_gradient(unions)

    grad_channels = tuple(range(dim_opt))

    def per_union(union_b, union_f, alpha_b, beta_b, x0_b, bp):
        def mu_of(x_opt, a, be, u):
            x = _pin_fidelity(x_opt, dim, num_fidelity)[None]
            k_xx = cov_mod.build_block_covariance(
                state.covariance, x, (), state.points_sampled,
                state.derivatives)[0]
            k_xu = cov_mod.build_block_covariance(
                state.covariance, x, (), u, ds)[0]
            return state.mean + k_xx @ a + k_xu @ be

        def per_draw(alpha, beta, x0_one):
            alpha_f = lax.stop_gradient(alpha)
            beta_f = lax.stop_gradient(beta)

            def vg(x):
                # autodiff value_and_grad here beats a hand-fused
                # value+grad row block: XLA fuses the backward kernel-row
                # pass without materializing (1+d', N) intermediates per
                # (restart, draw, step)
                val, g = jax.value_and_grad(
                    lambda p: mu_of(p, alpha_f, beta_f, union_f))(x)
                return -val, -g

            x_star = optimizers.gradient_ascent(vg, domain, x0_one,
                                                inner_params)
            x_star = lax.stop_gradient(x_star)
            best_min = jnp.minimum(
                mu_of(x_star, alpha, beta, union_b),
                mu_of(x0_one, alpha, beta, union_b))
            return bp - best_min

        return jnp.mean(jax.vmap(per_draw)(alpha_b, beta_b, x0_b))

    return jax.vmap(per_union)(unions, frozen_unions, alphas, betas, x0,
                               best_posterior)


def knowledge_gradient_mcmc_batch(states: GaussianProcessState,
                                  unions: jax.Array,
                                  discrete_pts: jax.Array,
                                  normals: jax.Array, domain,
                                  inner_params, best_so_far,
                                  num_to_sample: int,
                                  num_fidelity: int = 0,
                                  derivatives_to_sample: Sequence[int] = ()
                                  ) -> jax.Array:
    """Batched ensemble KG: (B, q, dim) -> (B,), averaged over members and
    divided by the fidelity cost of each union."""
    def one(s, dpts, bsf):
        return knowledge_gradient_batch(
            s, unions, dpts, normals, domain, inner_params, bsf,
            num_fidelity, derivatives_to_sample)

    kgs = jax.vmap(one)(states, discrete_pts, best_so_far)  # (S, B)
    costs = jax.vmap(lambda u: fidelity_cost(u, num_to_sample,
                                             num_fidelity))(unions)
    return jnp.mean(kgs, axis=0) / costs


def knowledge_gradient_mcmc_batch_value_and_grad(
        states, unions, discrete_pts, normals, domain, inner_params,
        best_so_far, num_to_sample, num_fidelity: int = 0,
        derivatives_to_sample: Sequence[int] = ()):
    """((B,), (B, q, dim)) value and per-union gradients via one vjp."""
    def f(u):
        return knowledge_gradient_mcmc_batch(
            states, u, discrete_pts, normals, domain, inner_params,
            best_so_far, num_to_sample, num_fidelity,
            derivatives_to_sample)

    vals, vjp = jax.vjp(f, unions)
    grads = vjp(jnp.ones_like(vals))[0]
    return vals, grads


# ---------------------------------------------------------------------------
# MCMC-averaged + continuous-fidelity KG
# ---------------------------------------------------------------------------

def fidelity_cost(union: jax.Array, num_to_sample: int,
                  num_fidelity: int) -> jax.Array:
    """cost = max_i prod(fidelity coords of point i), i over to-sample
    points (gpp_kg_mcmc_optimization.cpp:87-104)."""
    if num_fidelity == 0:
        return jnp.asarray(1.0, union.dtype)
    fid = union[:num_to_sample, union.shape[1] - num_fidelity:]
    return jnp.max(jnp.prod(fid, axis=1))


def knowledge_gradient_mcmc(states: GaussianProcessState,
                            union: jax.Array, discrete_pts: jax.Array,
                            normals: jax.Array, domain,
                            inner_params, best_so_far,
                            num_to_sample: int, num_fidelity: int = 0,
                            derivatives_to_sample: Sequence[int] = ()
                            ) -> jax.Array:
    """mean_s KG_s / cost over a stacked hyperparameter ensemble.

    ``states`` is a stacked GaussianProcessState (leading axis = MCMC
    sample); ``discrete_pts`` is (S, n_d, dim_opt) per-sample inner seeds
    (the reference seeds each model's discretization separately,
    examples/main.py:181-196); ``best_so_far`` is (S,) per-sample best
    posterior-mean values.
    """
    def one(s, dpts, bsf):
        return knowledge_gradient(s, union, dpts, normals, domain,
                                  inner_params, bsf, num_fidelity,
                                  derivatives_to_sample)

    kgs = jax.vmap(one)(states, discrete_pts, best_so_far)
    cost = fidelity_cost(union, num_to_sample, num_fidelity)
    return jnp.mean(kgs) / cost


# ---------------------------------------------------------------------------
# Top-level optimization endpoints
# ---------------------------------------------------------------------------

def multistart_knowledge_gradient_optimization(
        key: jax.Array, state: GaussianProcessState, domain,
        num_to_sample: int,
        params: optimizers.GradientDescentParameters,
        inner_params: optimizers.GradientDescentParameters,
        discrete_pts: jax.Array, points_being_sampled=None,
        best_so_far=None, num_mc_iterations: int = 128,
        num_fidelity: int = 0,
        derivatives_to_sample: Sequence[int] = (),
        chunk_size=None) -> jax.Array:
    """Suggest q points maximizing KG (ComputeKGOptimalPointsToSample).

    Returns (num_to_sample, dim).
    """
    from cornell_moe_tpu.ops.domains import (RepeatedDomain,
                                             TensorProductDomain)
    if best_so_far is None:
        best_so_far = state.best_observed_value

    p = 0 if points_being_sampled is None else \
        jnp.atleast_2d(points_being_sampled).shape[0]
    ds = tuple(int(i) for i in derivatives_to_sample)
    q_ch = (num_to_sample + p) * (1 + len(ds))
    dtype = state.points_sampled.dtype

    key_start, key_mc = jax.random.split(key)
    rep = RepeatedDomain(domain=domain, num_repeats=num_to_sample)
    starts = rep.generate_latin_hypercube_points(key_start,
                                                params.num_multistarts)
    normals = draw_antithetic_normals(key_mc, num_mc_iterations, q_ch,
                                      dtype=dtype)
    dim_opt = state.dim - num_fidelity
    inner_domain = TensorProductDomain(bounds=domain.bounds[:dim_opt])

    def vg(pts):
        return knowledge_gradient_value_and_grad(
            state, pts, points_being_sampled, discrete_pts, normals,
            inner_domain, inner_params, best_so_far, num_fidelity, ds)

    res = optimizers.multistart_optimize(vg, rep, starts, params,
                                         chunk_size=chunk_size)
    return res.best_point


def multistart_knowledge_gradient_mcmc_optimization(
        key: jax.Array, states: GaussianProcessState, domain,
        num_to_sample: int,
        params: optimizers.GradientDescentParameters,
        inner_params: optimizers.GradientDescentParameters,
        discrete_pts: jax.Array, points_being_sampled=None,
        best_so_far=None, num_mc_iterations: int = 128,
        num_fidelity: int = 0,
        derivatives_to_sample: Sequence[int] = (),
        chunk_size=None, use_batched: bool = True) -> jax.Array:
    """MCMC-averaged q-KG suggestion over a stacked ensemble.

    Counterpart of multistart_knowledge_gradient_mcmc_optimization
    (cpp_wrappers/knowledge_gradient_mcmc.py:247).  ``best_so_far`` is (S,)
    (per-model best posterior-mean value, examples/main.py:181-196);
    ``discrete_pts`` is (S, n_d, dim_opt).
    """
    from cornell_moe_tpu.ops.domains import (RepeatedDomain,
                                             TensorProductDomain)
    num_mcmc = states.points_sampled.shape[0]
    if best_so_far is None:
        best_so_far = jax.vmap(
            lambda s: s.best_observed_value)(states)

    p = 0 if points_being_sampled is None else \
        jnp.atleast_2d(points_being_sampled).shape[0]
    ds = tuple(int(i) for i in derivatives_to_sample)
    q_ch = (num_to_sample + p) * (1 + len(ds))
    dtype = states.points_sampled.dtype

    key_start, key_mc = jax.random.split(key)
    rep = RepeatedDomain(domain=domain, num_repeats=num_to_sample)
    starts = rep.generate_latin_hypercube_points(key_start,
                                                params.num_multistarts)
    normals = draw_antithetic_normals(key_mc, num_mc_iterations, q_ch,
                                      dtype=dtype)
    dim_opt = states.points_sampled.shape[-1] - num_fidelity
    inner_domain = TensorProductDomain(bounds=domain.bounds[:dim_opt])

    being = None if p == 0 else jnp.atleast_2d(points_being_sampled)

    if use_batched and states.inv_chol_K is not None:
        def bvg(pts_batch):
            unions = pts_batch if being is None else jnp.concatenate(
                [pts_batch,
                 jnp.broadcast_to(being, (pts_batch.shape[0],) +
                                  being.shape)], axis=1)
            vals, grads = knowledge_gradient_mcmc_batch_value_and_grad(
                states, unions, discrete_pts, normals, inner_domain,
                inner_params, best_so_far, num_to_sample, num_fidelity,
                ds)
            return vals, grads[:, :num_to_sample]

        res = optimizers.multistart_optimize_batched(
            bvg, rep, starts, params, chunk_size=chunk_size)
        return res.best_point

    def f(pts):
        union = pts if being is None else \
            jnp.concatenate([pts, being], axis=0)
        return knowledge_gradient_mcmc(
            states, union, discrete_pts, normals, inner_domain,
            inner_params, best_so_far, num_to_sample, num_fidelity, ds)

    vg = jax.value_and_grad(f)
    res = optimizers.multistart_optimize(vg, rep, starts, params,
                                         chunk_size=chunk_size)
    return res.best_point


def evaluate_knowledge_gradient_at_point_list(
        state: GaussianProcessState, points_list: jax.Array,
        discrete_pts: jax.Array, normals: jax.Array, domain,
        inner_params, best_so_far, num_fidelity: int = 0,
        derivatives_to_sample: Sequence[int] = ()) -> jax.Array:
    """KG at each (q, dim) candidate block (EvaluateKGAtPointList)."""
    pts = jnp.asarray(points_list)
    if pts.ndim == 2:
        pts = pts[:, None, :]
    return jax.vmap(lambda u: knowledge_gradient(
        state, u, discrete_pts, normals, domain, inner_params,
        best_so_far, num_fidelity, derivatives_to_sample))(pts)


def posterior_mean_optimization(
        state: GaussianProcessState, domain,
        params: optimizers.GradientDescentParameters,
        initial_guesses: jax.Array, num_fidelity: int = 0,
        top_k: int = 1):
    """Find argmin of the posterior mean (recommendation step).

    Counterpart of posterior_mean_optimization
    (cpp_wrappers/knowledge_gradient.py:19).  Returns
    (point_opt_coords, neg_posterior_mean_value).
    """
    from cornell_moe_tpu.ops.domains import TensorProductDomain
    dim_opt = state.dim - num_fidelity
    inner_domain = TensorProductDomain(bounds=domain.bounds[:dim_opt])
    return compute_optimal_posterior_mean(
        state, inner_domain, initial_guesses, params, num_fidelity, top_k)
