"""Expected Improvement acquisition (analytic 1,0-EI and MC q,p-EI).

Counterpart of the EI machinery in the reference
(/root/reference/moe/optimal_learning/cpp/gpp_math.cpp:1991-2259 and
``python/cpp_wrappers/expected_improvement.py``).

Reference semantics preserved exactly:
  * objective is MINIMIZATION of f; EI(x) = E[(best_so_far - min_j y_j)^+]
    over the joint posterior of the union (points_to_sample ++
    points_being_sampled)
  * 1.0e-6 jitter added to the union posterior covariance diagonal before
    Cholesky (gpp_math.cpp:2000-2002)
  * analytic closed form for q=1, p=0 with a minimum-stddev guard
    (gpp_math.cpp:2196-2259, kMinimumStdDev gpp_math.hpp:291)
  * common random numbers across an optimization run: the normals are drawn
    once per suggest call and reused for every gradient step (the
    reference's ResetToMostRecentSeed CRN discipline, gpp_random.hpp)

TPU-native design: the MC estimator is a reparameterized expectation
``y = mu + L z`` evaluated for all draws at once (one (n_mc, q+p) matmul on
the MXU instead of the reference's serial loop), and the gradient — the
winner-indexed chain the reference hand-codes over grad-Cholesky tensors —
is ``jax.grad`` of the estimator.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.scipy.stats import norm

from cornell_moe_tpu import config
from cornell_moe_tpu.models import gp
from cornell_moe_tpu.models.gp import GaussianProcessState
from cornell_moe_tpu.ops import linalg, optimizers


def draw_normals(key: jax.Array, num_mc: int, n: int,
                 dtype=jnp.float64) -> jax.Array:
    """Plain MC normals (n_mc, n)."""
    return jax.random.normal(key, (num_mc, n), dtype=dtype)


def draw_antithetic_normals(key: jax.Array, num_mc: int, n: int,
                            dtype=jnp.float64) -> jax.Array:
    """Antithetic pairs: z_{2k+1} = -z_{2k} (gpp_kg_optimization.cpp:88-97)."""
    half = (num_mc + 1) // 2
    z = jax.random.normal(key, (half, n), dtype=dtype)
    return jnp.stack([z, -z], axis=1).reshape(2 * half, n)[:num_mc]


def analytic_expected_improvement(state: GaussianProcessState,
                                  point_to_sample,
                                  best_so_far) -> jax.Array:
    """Closed-form 1,0-EI (OnePotentialSampleExpectedImprovementEvaluator).

    EI = sigma * (u * Phi(u) + phi(u)),  u = (best - mu) / sigma.
    """
    pts = jnp.atleast_2d(jnp.asarray(point_to_sample))
    mu = gp.posterior_mean(state, pts)[0, 0]
    var = gp.posterior_variance(state, pts)[0, 0]
    sigma = jnp.sqrt(jnp.maximum(var, config.MINIMUM_STD_DEV**2))
    u = (best_so_far - mu) / sigma
    return sigma * (u * norm.cdf(u) + norm.pdf(u))


def monte_carlo_expected_improvement(state: GaussianProcessState,
                                     points_to_sample,
                                     points_being_sampled,
                                     best_so_far, normals: jax.Array
                                     ) -> jax.Array:
    """q,p-EI MC estimator (ComputeExpectedImprovement semantics).

    ``normals`` has shape (num_mc, q + p); improvement per draw is
    ``max(best_so_far - min_j (mu_j + (L z)_j), 0)``.
    """
    union = jnp.concatenate(
        [jnp.atleast_2d(points_to_sample),
         jnp.atleast_2d(points_being_sampled)], axis=0) \
        if points_being_sampled is not None and \
        jnp.size(points_being_sampled) else jnp.atleast_2d(points_to_sample)

    mu = gp.posterior_mean(state, union)[:, 0]
    var = gp.posterior_variance(state, union)
    # unrolled tiny-Cholesky: XLA's batched LAPACK-style lowering is
    # latency-bound at (q+p) <= 16 and cost 3.9 of the 5.9 ms per
    # multistart-GD step on the seeding q-EI (fwd+bwd, 200 starts x 16
    # models; benchmarks/profile_qei.py) — the unroll fuses into the
    # surrounding elementwise graph and autodiffs as plain ops
    chol = linalg.cholesky_small(
        linalg.add_jitter(var, config.EI_VARIANCE_JITTER))
    # HIGHEST precision so this per-start path stays bit-identical to
    # the batched estimator (which samples at HIGHEST) on TPU f32 —
    # batch-vs-per-start equivalence must hold beyond the f64 CPU suite
    samples = mu[None, :] + linalg.hdot(normals, chol.T)  # (n_mc, q+p)
    improvement = jnp.maximum(best_so_far - jnp.min(samples, axis=1), 0.0)
    return jnp.mean(improvement)


def expected_improvement_value_and_grad(state: GaussianProcessState,
                                        points_to_sample,
                                        points_being_sampled,
                                        best_so_far, normals):
    """EI and its gradient wrt points_to_sample, via jax.grad.

    Replaces ComputeGradExpectedImprovement's hand-coded winner-indexed
    grad-Cholesky chain (gpp_math.cpp:2050-2129).
    """
    def f(pts):
        return monte_carlo_expected_improvement(
            state, pts, points_being_sampled, best_so_far, normals)
    return jax.value_and_grad(f)(jnp.atleast_2d(points_to_sample))


# ---------------------------------------------------------------------------
# Optimization endpoints
# ---------------------------------------------------------------------------

def expected_improvement_batch_value_and_grad(
        state: GaussianProcessState, pts_batch: jax.Array,
        points_being_sampled, best_so_far, normals):
    """((B,), (B, q, dim)) single-GP q,p-EI values and per-start grads.

    Lockstep-batched counterpart of
    :func:`expected_improvement_value_and_grad` (one vjp over the wide
    batched estimator; each start's value depends only on its own block,
    so the summed cotangent IS the per-start gradient).
    """
    if points_being_sampled is not None and \
            jnp.size(points_being_sampled):
        being = jnp.atleast_2d(points_being_sampled)

        def f(p):
            unions = jnp.concatenate(
                [p, jnp.broadcast_to(being, (p.shape[0],) + being.shape)],
                axis=1)
            return monte_carlo_expected_improvement_batch(
                state, unions, best_so_far, normals)
    else:
        def f(p):
            return monte_carlo_expected_improvement_batch(
                state, p, best_so_far, normals)

    vals, vjp = jax.vjp(f, pts_batch)
    grads = vjp(jnp.ones_like(vals))[0]
    return vals, grads


def multistart_expected_improvement_optimization(
        key: jax.Array, state: GaussianProcessState, domain,
        num_to_sample: int,
        params: optimizers.GradientDescentParameters,
        points_being_sampled=None, best_so_far=None,
        num_mc_iterations: int = 1000,
        num_random_search: int = 0,
        use_analytic: Optional[bool] = None,
        conv_tol=None, use_batched: bool = True,
        chunk_size=None, mesh=None,
        mesh_axis: str = "restarts") -> jax.Array:
    """Suggest the q best points to sample next by maximizing q,p-EI.

    Counterpart of ComputeOptimalPointsToSample (gpp_math.hpp:2010) +
    multistart_expected_improvement_optimization
    (cpp_wrappers/expected_improvement.py:22).  Analytic path for q=1, p=0
    (gpp_math.cpp:2196).  Returns (q, dim).

    ``use_batched`` (default): run the lockstep-batched multistart —
    wide-matmul MC estimator for q,p-EI, vmapped closed form for the
    analytic path — which is what makes ``conv_tol`` effective as a
    chunk-wide step-norm gate (gpp_optimization.hpp:667-671 semantics)
    and lets ``mesh`` shard the restart axis across devices, the same
    treatment the KG suggest and the seeding q-EI get.  Falls back to
    the per-start vmapped GD when False or when ``num_random_search``
    requests the dumb-search fallback.

    ``conv_tol``: optional step-norm convergence gate on the GD
    (chunk-wide on the batched path, per-start otherwise).
    """
    p = 0 if points_being_sampled is None else \
        jnp.atleast_2d(points_being_sampled).shape[0]
    if best_so_far is None:
        best_so_far = state.best_observed_value
    if use_analytic is None:
        use_analytic = (num_to_sample == 1 and p == 0)

    from cornell_moe_tpu.ops.domains import RepeatedDomain
    rep = RepeatedDomain(domain=domain, num_repeats=num_to_sample)
    key_start, key_mc, key_search = jax.random.split(key, 3)
    starts = rep.generate_latin_hypercube_points(
        key_start, params.num_multistarts)

    dtype = state.points_sampled.dtype
    if use_analytic:
        def vg(pts):
            return jax.value_and_grad(
                lambda q_pts: analytic_expected_improvement(
                    state, q_pts, best_so_far))(pts)

        def bvg(pts_batch):
            return jax.vmap(vg)(pts_batch)
    else:
        union_n = num_to_sample + p
        normals = draw_normals(key_mc, num_mc_iterations, union_n,
                               dtype=dtype)

        def vg(pts):
            return expected_improvement_value_and_grad(
                state, pts, points_being_sampled, best_so_far, normals)

        def bvg(pts_batch):
            return expected_improvement_batch_value_and_grad(
                state, pts_batch, points_being_sampled, best_so_far,
                normals)

    if num_random_search:
        search = rep.generate_latin_hypercube_points(
            key_search, num_random_search)
        result = optimizers.multistart_optimize_with_dumb_search_fallback(
            vg, rep, starts, search, params)
    elif use_batched:
        if mesh is not None:
            from cornell_moe_tpu.parallel import sharding as shard_mod
            result = shard_mod.sharded_multistart_optimize_batched_gated(
                bvg, rep, starts, params, mesh, axis_name=mesh_axis,
                chunk_size=chunk_size, conv_tol=conv_tol)
        else:
            result = optimizers.multistart_optimize_batched(
                bvg, rep, starts, params, chunk_size=chunk_size,
                conv_tol=conv_tol)
    else:
        result = optimizers.multistart_optimize(vg, rep, starts, params,
                                                conv_tol=conv_tol)
    return result.best_point


def evaluate_expected_improvement_at_point_list(
        state: GaussianProcessState, points_list, key=None,
        points_being_sampled=None, best_so_far=None,
        num_mc_iterations: int = 1000,
        use_analytic: Optional[bool] = None) -> jax.Array:
    """EI at each (q, dim) candidate block (EvaluateEIAtPointList)."""
    pts = jnp.asarray(points_list)
    if pts.ndim == 2:
        pts = pts[:, None, :]
    if best_so_far is None:
        best_so_far = state.best_observed_value
    q = pts.shape[1]
    p = 0 if points_being_sampled is None else \
        jnp.atleast_2d(points_being_sampled).shape[0]
    if use_analytic is None:
        use_analytic = (q == 1 and p == 0)

    if use_analytic:
        return jax.vmap(lambda b: analytic_expected_improvement(
            state, b, best_so_far))(pts)
    if key is None:
        # deterministic default (CRN across calls), mirroring the
        # reference's reset-to-most-recent-seed discipline
        key = jax.random.PRNGKey(0)
    normals = draw_normals(key, num_mc_iterations, q + p,
                           dtype=pts.dtype)
    return jax.vmap(lambda b: monte_carlo_expected_improvement(
        state, b, points_being_sampled, best_so_far, normals))(pts)


# ---------------------------------------------------------------------------
# MCMC-averaged EI (ExpectedImprovementMCMC counterpart)
# ---------------------------------------------------------------------------

def monte_carlo_expected_improvement_mcmc(states, points_to_sample,
                                          points_being_sampled,
                                          best_so_far, normals
                                          ) -> jax.Array:
    """Mean EI over a stacked hyperparameter ensemble.

    Counterpart of ExpectedImprovementMCMCEvaluator
    (gpp_expected_improvement_mcmc_optimization.hpp:151): the objective is
    the average of the per-sample EI values.  ``best_so_far`` may be a
    scalar or (S,).
    """
    best = jnp.broadcast_to(jnp.asarray(best_so_far),
                            (states.points_sampled.shape[0],))

    def one(s, b):
        return monte_carlo_expected_improvement(
            s, points_to_sample, points_being_sampled, b, normals)

    return jnp.mean(jax.vmap(one)(states, best))


def monte_carlo_expected_improvement_batch(state, unions: jax.Array,
                                           best_so_far,
                                           normals: jax.Array) -> jax.Array:
    """q,p-EI at B candidate unions at once: (B, u, dim) -> (B,).

    Identical estimator to :func:`monte_carlo_expected_improvement` (same
    solve-with-refinement variance path, same jitter), but the B unions'
    kernel columns fuse into single wide matmuls so a whole multistart-GD
    step runs through full MXU tiles instead of B thin (u ~ 4)-wide ones
    — the same batching that took the KG solver from vmapped per-start to
    lockstep (knowledge_gradient_batch).
    """
    from cornell_moe_tpu.models import covariance as cov_mod

    b, u, dim = unions.shape
    flat = unions.reshape(b * u, dim)
    k_xu_flat = gp._mix_cov(state, flat, ())             # (N_ch, B*u)
    mu = (linalg.hdot(k_xu_flat.T, state.K_inv_y).reshape(b, u)
          + state.mean)
    if state.inv_chol_K is not None:
        va = linalg.solve_lower_with_refinement(
            state.chol_K, state.inv_chol_K, k_xu_flat)
    else:
        va = linalg.solve_triangular(state.chol_K, k_xu_flat, lower=True)
    va = va.reshape(-1, b, u)
    prior = jax.vmap(lambda pts: cov_mod.build_block_covariance(
        state.covariance, pts, (), pts, ()))(unions)     # (B, u, u)
    var = prior - jnp.einsum("nbi,nbj->bij", va, va,
                             precision=linalg.HIGHEST)
    var = linalg.symmetrize(var)
    chol = linalg.cholesky_small(
        linalg.add_jitter(var, config.EI_VARIANCE_JITTER))
    # samples[b, m, i] = mu[b, i] + (chol[b] @ z_m)_i
    samples = mu[:, None, :] + jnp.einsum("bij,mj->bmi", chol, normals,
                                          precision=linalg.HIGHEST)
    improvement = jnp.maximum(best_so_far - jnp.min(samples, axis=-1),
                              0.0)                       # (B, n_mc)
    return jnp.mean(improvement, axis=-1)


def monte_carlo_expected_improvement_mcmc_batch(states, pts_batch,
                                                points_being_sampled,
                                                best_so_far,
                                                normals) -> jax.Array:
    """Ensemble-averaged q,p-EI at B start blocks: (B, q, dim) -> (B,).

    Lockstep-batched counterpart of
    :func:`monte_carlo_expected_improvement_mcmc` (semantically identical;
    equivalence enforced by tests/test_expected_improvement.py).
    """
    if points_being_sampled is not None and \
            jnp.size(points_being_sampled):
        being = jnp.atleast_2d(points_being_sampled)
        unions = jnp.concatenate(
            [pts_batch, jnp.broadcast_to(
                being, (pts_batch.shape[0],) + being.shape)], axis=1)
    else:
        unions = pts_batch
    best = jnp.broadcast_to(jnp.asarray(best_so_far),
                            (states.points_sampled.shape[0],))

    def one(s, bsf):
        return monte_carlo_expected_improvement_batch(s, unions, bsf,
                                                      normals)

    return jnp.mean(jax.vmap(one)(states, best), axis=0)


def expected_improvement_mcmc_batch_value_and_grad(
        states, pts_batch, points_being_sampled, best_so_far, normals):
    """((B,), (B, q, dim)) ensemble q-EI values and per-start gradients.

    One vjp over the batched estimator (each start's value depends only
    on its own block, so the summed cotangent IS the per-start gradient).
    """
    def f(p):
        return monte_carlo_expected_improvement_mcmc_batch(
            states, p, points_being_sampled, best_so_far, normals)

    vals, vjp = jax.vjp(f, pts_batch)
    grads = vjp(jnp.ones_like(vals))[0]
    return vals, grads


def multistart_expected_improvement_mcmc_optimization(
        key: jax.Array, states, domain, num_to_sample: int,
        params: optimizers.GradientDescentParameters,
        points_being_sampled=None, best_so_far=None,
        num_mc_iterations: int = 1000,
        conv_tol=None, use_batched: bool = True,
        chunk_size=None, mesh=None,
        mesh_axis: str = "restarts") -> jax.Array:
    """Suggest q points maximizing ensemble-averaged q,p-EI
    (cpp_wrappers/expected_improvement_mcmc.py:21).

    ``use_batched`` (default): run the lockstep-batched multistart (all
    starts advance together through wide-matmul objective evaluations;
    see :func:`monte_carlo_expected_improvement_mcmc_batch`), which is
    what makes ``conv_tol`` effective — the chunk-wide step-norm gate
    exits once every start in the chunk has converged
    (gpp_optimization.hpp:667-671 semantics), instead of the vmapped
    while_loop masking lanes until the slowest start finishes.

    ``mesh``: optional jax.sharding.Mesh; shards the restart axis across
    devices (chunk_size defaults to the per-device shard size so sharded
    and single-device runs gate over identical start groups).
    """
    from cornell_moe_tpu.ops.domains import RepeatedDomain
    if best_so_far is None:
        best_so_far = jax.vmap(lambda s: s.best_observed_value)(states)
    p = 0 if points_being_sampled is None else \
        jnp.atleast_2d(points_being_sampled).shape[0]

    rep = RepeatedDomain(domain=domain, num_repeats=num_to_sample)
    key_start, key_mc = jax.random.split(key)
    starts = rep.generate_latin_hypercube_points(key_start,
                                                params.num_multistarts)
    normals = draw_normals(key_mc, num_mc_iterations, num_to_sample + p,
                           dtype=states.points_sampled.dtype)

    if use_batched:
        def bvg(pts_batch):
            return expected_improvement_mcmc_batch_value_and_grad(
                states, pts_batch, points_being_sampled, best_so_far,
                normals)

        if mesh is not None:
            from cornell_moe_tpu.parallel import sharding as shard_mod
            res = shard_mod.sharded_multistart_optimize_batched_gated(
                bvg, rep, starts, params, mesh, axis_name=mesh_axis,
                chunk_size=chunk_size, conv_tol=conv_tol)
        else:
            res = optimizers.multistart_optimize_batched(
                bvg, rep, starts, params, chunk_size=chunk_size,
                conv_tol=conv_tol)
        return res.best_point

    def vg(pts):
        return jax.value_and_grad(
            lambda q_pts: monte_carlo_expected_improvement_mcmc(
                states, q_pts, points_being_sampled, best_so_far,
                normals))(pts)

    res = optimizers.multistart_optimize(vg, rep, starts, params,
                                         conv_tol=conv_tol)
    return res.best_point


# ---------------------------------------------------------------------------
# Heuristic batch policies (ConstantLiar / KrigingBeliever)
# ---------------------------------------------------------------------------

def constant_liar_estimate(state: GaussianProcessState, point,
                           lie_value, lie_noise_variance=0.0):
    """ConstantLiarEstimationPolicy (gpp_heuristic_expected_improvement)."""
    del state, point
    return lie_value, lie_noise_variance


def kriging_believer_estimate(state: GaussianProcessState, point,
                              std_deviation_coef: float = 0.0,
                              kriging_noise_variance: float = 0.0):
    """KrigingBelieverEstimationPolicy: mu(x) + c * sigma(x)."""
    pts = jnp.atleast_2d(jnp.asarray(point))
    mu = gp.posterior_mean(state, pts)[0, 0]
    if std_deviation_coef:
        var = gp.posterior_variance(state, pts)[0, 0]
        mu = mu + std_deviation_coef * jnp.sqrt(jnp.maximum(var, 0.0))
    return mu, kriging_noise_variance


def heuristic_expected_improvement_optimization(
        key: jax.Array, state: GaussianProcessState, domain,
        num_to_sample: int, params: optimizers.GradientDescentParameters,
        estimation_policy=None, best_so_far=None,
        num_mc_iterations: int = 1000) -> jax.Array:
    """Sequential q-point selection via fantasy updates (heuristic q-EI).

    Counterpart of ComputeHeuristicPointsToSample: pick one point by 1,0-EI,
    append a fantasized observation (constant-liar / kriging-believer),
    repeat q times.
    """
    if best_so_far is None:
        best_so_far = state.best_observed_value
    if estimation_policy is None:
        estimation_policy = partial(kriging_believer_estimate)

    # Shape-stable fantasy slots: pad the training set ONCE with
    # num_to_sample huge-noise dummy points, then fill one slot per round.
    # Every per-round program (refit, multistart EI) therefore compiles
    # once and is reused for all q rounds — the previous implementation
    # grew the arrays each round, recompiling everything q times (30-300 s
    # per shape on the TPU tunnel).
    from cornell_moe_tpu.models.mcmc import PAD_NOISE

    n0 = state.num_sampled
    q = num_to_sample
    dtype = state.points_sampled.dtype
    c = 1 + state.num_derivatives
    center = jnp.mean(jnp.asarray(domain.bounds, dtype), axis=1)
    x_pad = jnp.concatenate(
        [state.points_sampled, jnp.tile(center[None], (q, 1))], axis=0)
    y_pad = jnp.concatenate(
        [state.points_sampled_value, jnp.zeros((q, c), dtype)], axis=0)
    pn = jnp.zeros((n0 + q, c), dtype).at[n0:].set(PAD_NOISE)
    if state.point_noise is not None:
        # preserve the state's own per-point noise (e.g. shape-bucket
        # PAD_NOISE dummy rows) instead of refitting them at full weight
        pn = pn.at[:n0].set(state.point_noise)
    cov, noise, derivs, mean = (state.covariance, state.noise_variance,
                                state.derivatives, state.mean)

    @jax.jit
    def refit(x, y, point_noise):
        # fixed prior mean, matching add_sampled_points(update_mean=False)
        return gp.fit_gp(cov, noise, x, y, derivs, mean=mean,
                         point_noise=point_noise)

    cur = refit(x_pad, y_pad, pn)
    chosen = []
    for i in range(q):
        key, sub = jax.random.split(key)
        pt = multistart_expected_improvement_optimization(
            sub, cur, domain, 1, params, best_so_far=best_so_far,
            num_mc_iterations=num_mc_iterations)
        value, fantasy_noise = estimation_policy(cur, pt)
        full_value = jnp.concatenate(
            [jnp.reshape(jnp.asarray(value, dtype), (1,)),
             jnp.zeros((state.num_derivatives,), dtype)])
        x_pad = x_pad.at[n0 + i].set(pt.reshape(-1))
        y_pad = y_pad.at[n0 + i].set(full_value)
        pn = pn.at[n0 + i].set(jnp.asarray(fantasy_noise, dtype))
        cur = refit(x_pad, y_pad, pn)
        chosen.append(pt.reshape(1, -1))
    return jnp.concatenate(chosen, axis=0)
