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

from typing import NamedTuple, Optional, Sequence

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
    w = linalg.cho_solve(state.chol_K, k_xu)            # (N, q_ch)
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

    def per_draw(z):
        beta = linalg.solve_triangular(model.chol_union, z, lower=True,
                                       trans=True)
        alpha = k_inv_y - model.v @ z
        # frozen copies drive the inner argmin (envelope theorem)
        beta_f = lax.stop_gradient(beta)
        alpha_f = lax.stop_gradient(alpha)
        mu_frozen = _fantasy_mean_fn(state, frozen, alpha_f, beta_f, ds,
                                     num_fidelity)
        mu_live = _fantasy_mean_fn(state, model, alpha, beta, ds,
                                   num_fidelity)

        vals = jax.vmap(mu_frozen)(starts_all)
        x0 = starts_all[jnp.argmin(vals)]

        def vg(x):
            v, g = jax.value_and_grad(mu_frozen)(x)
            return -v, -g                      # maximize -mu'

        x_star = optimizers.gradient_ascent(vg, domain, x0, inner_params)
        x_star = lax.stop_gradient(x_star)
        # take the better of the GD endpoint and its start, evaluated
        # differentiably (guards against stray divergence under vmap)
        best_min = jnp.minimum(mu_live(x_star), mu_live(x0))
        return best_posterior - best_min

    contributions = jax.vmap(per_draw)(normals)
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
        chunk_size=None) -> jax.Array:
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
