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


def _channel_noise(state: GaussianProcessState, c: int) -> jax.Array:
    """Per-channel fantasy observation noise, length ``c``.

    The reference always samples fantasy derivatives the GP itself
    observes, so its noise vector has one entry per channel
    (gpp_knowledge_gradient_optimization.cpp uses the GP's
    noise_variance_ directly).  Here derivatives_to_sample may exceed
    the GP's observed channels (derivative fantasies on a value-only
    GP); missing channels reuse the value-channel noise rather than
    silently mis-sizing the tile.
    """
    nv = state.noise_variance
    if nv.shape[-1] < c:
        pad = jnp.broadcast_to(nv[..., :1], nv.shape[:-1]
                               + (c - nv.shape[-1],))
        nv = jnp.concatenate([nv, pad], axis=-1)
    return nv[..., :c]


def _build_fantasy_model(state: GaussianProcessState, union: jax.Array,
                         derivatives_to_sample: Sequence[int] = ()
                         ) -> _FantasyModel:
    ds = tuple(int(i) for i in derivatives_to_sample)
    mu_u = gp_mod.posterior_mean(state, union, ds).reshape(-1)
    var_u = linalg.symmetrize(gp_mod.posterior_variance(state, union, ds))
    q = union.shape[0]
    noise = jnp.tile(_channel_noise(state, 1 + len(ds)), q)
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

    Returns (mu_u (B, q_ch), chol_u (B, q_ch, q_ch), v (B, N, q_ch),
    noise_eff (B, q_ch)) with noise_eff the total diagonal shift
    (channel noise + f32 repair) baked into chol_u.
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

    # va = L^-1 k and w = K^-1 k in one linear-operator pair with a
    # 2-matmul custom VJP — reverse-mode through the refinement chains
    # costs 6 transposed (N_ch, N_ch) matmuls per backward and dominated
    # the d-KG per-evaluation FLOPs (MFU_r04).  The _rhs_grad_only
    # contract is correct here: the GP factors are constants of the
    # suggest program (only the union points are differentiated).
    # On TPU/f32 the explicit inverse streams in bfloat16 with f32
    # accumulation (config.KG_FANTASY_LOWP): the factor matmuls are the
    # measured d-KG HBM bottleneck (DKG_BREAKDOWN_r05: ~13 GB/eval at
    # 97% of peak bandwidth), and the f32 residual refinement keeps the
    # variance-critical va output f32-grade.  The f64 parity suite and
    # the batched==per-union equivalence tests run with lowp off
    # (non-f32 dtypes); lowp-vs-exact tolerances are pinned in
    # tests/test_linalg.py and tests/test_knowledge_gradient.py.
    from cornell_moe_tpu import config as _config
    inv_lowp = state.inv_chol_K.astype(jnp.bfloat16) \
        if _config.kg_fantasy_lowp_enabled(k_xu_flat.dtype) else None
    va_flat, w_flat = linalg.fantasy_solves_rhs_grad_only(
        state.chol_K, state.inv_chol_K, k_xu_flat,
        inv_chol_lowp=inv_lowp)
    va = va_flat.reshape(n_ch, b, q_ch)
    prior_u = jax.vmap(lambda u: cov_mod.build_block_covariance(
        state.covariance, u, ds, u, ds))(unions)       # (B, q_ch, q_ch)
    var_u = prior_u - jnp.einsum("nbi,nbj->bij", va, va,
                                 precision=linalg.HIGHEST)
    var_u = linalg.symmetrize(var_u)

    noise = jnp.tile(_channel_noise(state, c), q)
    min_diag = jnp.min(jnp.diagonal(var_u, axis1=-2, axis2=-1), axis=-1)
    repair = lax.stop_gradient(jnp.maximum(0.0, -1.5 * min_diag))
    var_u = var_u + (noise[None, :] + repair[:, None])[..., None] * \
        jnp.eye(q_ch, dtype=var_u.dtype)
    chol_u = linalg.cholesky_small(var_u)              # (B, q_ch, q_ch)

    # w = K^-1 k = L^-T va came out of the same solve pair
    # (refined va reused: 3 forward matmuls instead of a 6-matmul
    # cho_solve chain, and the pair's 2-matmul backward)
    w = w_flat.reshape(n_ch, b, q_ch)
    v = jnp.swapaxes(linalg.solve_triangular_small(
        chol_u, jnp.swapaxes(jnp.moveaxis(w, 1, 0), -1, -2)), -1, -2)
    noise_eff = noise[None, :] + repair[:, None]
    return mu_u, chol_u, v, noise_eff


def _kernel_rows_flat(state: GaussianProcessState, x_flat: jax.Array
                      ) -> jax.Array:
    """Training-channel covariance rows k(x, X_train) for P query points.

    Returns (P, N*(1+m)) in the reference point-major/channel-minor layout
    (row b of BuildMixCovarianceMatrix, gpp_math.cpp:391-460).  The squared
    scaled distance uses the broadcast diff form: at BayesOpt dims the
    (P, N, d) broadcast is elementwise work XLA fuses straight into the
    kernel fields feeding the downstream contraction matmuls (see the
    inline comment below; the norm-expansion matmul form was tried and
    removed).
    """
    cov = state.covariance
    pts = state.points_sampled
    # diff-form scaled distance: at BayesOpt dims (2-10) the (P, N, d)
    # broadcast is pure elementwise work that XLA fuses into the kernel
    # fields, so nothing (P, N)-sized hits HBM before the contraction
    # matmuls; a norm-expansion cross-term matmul was tried and removed —
    # its (P, N) output cannot fuse into the downstream dots and doubled
    # the descent's HBM traffic.
    xs = x_flat / cov.lengths
    ws = pts / cov.lengths
    diff = xs[:, None, :] - ws[None, :, :]
    s = jnp.sum(diff * diff, axis=-1)
    f0 = cov._f0(s)
    dv = state.derivatives
    if not dv:
        return f0
    p = cov._p(s)
    inv_l2 = 1.0 / cov.lengths**2
    cols = [f0]
    for c in dv:
        t_c = (x_flat[:, c, None] - pts[None, :, c]) * inv_l2[c]
        cols.append(p * t_c)                               # k01 block
    return jnp.stack(cols, axis=-1).reshape(
        x_flat.shape[0], pts.shape[0] * (1 + len(dv)))


def _union_rows(cov, x_full: jax.Array, unions: jax.Array,
                derivatives_to_sample: Sequence[int]) -> jax.Array:
    """k(x, U_b) rows: x_full (B, M, dim), unions (B, q, dim) -> (B, M, q_ch).

    Small tensors (q ~ 4), so the broadcast diff form is fine here.
    """
    ds = tuple(int(i) for i in derivatives_to_sample)
    inv_l2 = 1.0 / cov.lengths**2
    diff = x_full[:, :, None, :] - unions[:, None, :, :]   # (B, M, q, d)
    t = diff * inv_l2
    s = jnp.sum(diff * t, axis=-1)                         # (B, M, q)
    f0 = cov._f0(s)
    if not ds:
        return f0
    p = cov._p(s)
    cols = [f0] + [p * t[..., c] for c in ds]
    return jnp.stack(cols, axis=-1).reshape(
        x_full.shape[0], x_full.shape[1], unions.shape[1] * (1 + len(ds)))


def _fantasy_mean_batch(state: GaussianProcessState, x: jax.Array,
                        unions: jax.Array, v: jax.Array, betas: jax.Array,
                        normals: jax.Array,
                        derivatives_to_sample: Sequence[int],
                        num_fidelity: int) -> jax.Array:
    """mu'_z at x (B, M, d_opt) for every (union b, draw m) -> (B, M).

    Factored form (module docstring): mu' = mean + k_x K^-1 y
    - (k_x V_b) z_m + k_xu beta_{bm}.  Never materializes the (B, M, N)
    per-draw representer weights — the inner descent reads only V
    (B, N_ch, q_ch) and beta (B, M, q_ch) per step.
    """
    b, m, dim_opt = x.shape
    dim = state.dim
    if num_fidelity:
        ones = jnp.ones(x.shape[:-1] + (num_fidelity,), x.dtype)
        xf = jnp.concatenate([x, ones], axis=-1)
    else:
        xf = x
    k_rows = _kernel_rows_flat(state, xf.reshape(b * m, dim)).reshape(
        b, m, -1)                                          # (B, M, N_ch)
    # one pass over k_rows: W = [K^-1 y | V] so the K^-1 y dot and the
    # fantasy-subspace projection share the contraction
    w_all = jnp.concatenate([
        jnp.broadcast_to(state.K_inv_y[None, :, None],
                         v.shape[:2] + (1,)), v], axis=-1)
    out = jnp.einsum("bmn,bnw->bmw", k_rows, w_all,
                     precision=linalg.HIGHEST)
    t1 = out[..., 0]
    kv = out[..., 1:]
    t2 = jnp.sum(kv * normals[None, :, :], axis=-1)        # (B, M)
    k_u = _union_rows(state.covariance, xf, unions, derivatives_to_sample)
    t3 = jnp.sum(k_u * betas, axis=-1)                     # (B, M)
    return state.mean + t1 - t2 + t3


# Gate for the fused Pallas descent kernel: "auto" uses it on TPU/f32,
# "never" forces the XLA einsum path (the equivalence oracle), "always"
# forces it (tests use interpret mode through _pallas_descent_bvg).
DESCENT_PALLAS = "auto"


def _descent_kernel_name(state: GaussianProcessState):
    """Resolve the Pallas descent gate; None means use the XLA path.

    The fused kernel iterates unions sequentially inside each program, so
    it only wins when the per-(union, step) field block is MXU/VPU-sized;
    at small num_sampled the fully-batched XLA einsum path is faster
    (measured: 30-obs q-KG suite config regressed 0.49 -> 0.77 s under
    the kernel; 500-obs bench improved 3.5 -> 3.0 s)."""
    if DESCENT_PALLAS == "never" or \
            state.points_sampled.dtype != jnp.float32 or \
            (DESCENT_PALLAS != "always" and state.num_sampled < 256):
        return None
    name = next((nm for nm, cls in cov_mod.COVARIANCE_TYPES.items()
                 if type(state.covariance) is cls), None)
    if name is None:
        return None
    if DESCENT_PALLAS == "always":
        return name
    try:
        on_tpu = jax.default_backend() == "tpu"
    except RuntimeError:
        on_tpu = False
    return name if on_tpu else None


def _pack_descent_inputs(state: GaussianProcessState, unions_f: jax.Array,
                         v_f: jax.Array, betas_f: jax.Array,
                         normals: jax.Array, kernel_name: str):
    """Pack the Pallas descent operands (scaled coords, folded amplitude).

    Returns (ws_pad, wt_pad, beta_pad, z_pad, us_sc, mp).  The moment
    weights are W = c*[K^-1 y | V | (.)*ws_dd] with c absorbing the kernel
    amplitude so the in-kernel field is amplitude-free.
    """
    cov = state.covariance
    lengths = cov.lengths
    b, q, d = unions_f.shape
    n = state.points_sampled.shape[0]
    m = normals.shape[0]
    tile = 128
    np_ = -(-n // tile) * tile
    mp = -(-m // tile) * tile

    c = (5.0 / 3.0) * cov.alpha if kernel_name == "matern_2.5" \
        else cov.alpha
    ws_sc = (state.points_sampled / lengths).T           # (d, N)
    ws_pad = jnp.pad(ws_sc, ((0, 0), (0, np_ - n)),
                     constant_values=1e6).astype(jnp.float32)

    u_rows = jnp.concatenate([
        jnp.broadcast_to(state.K_inv_y[None, None, :], (b, 1, n)),
        jnp.swapaxes(v_f, -1, -2)], axis=1)              # (B, 1+q, N)
    moments = (u_rows[:, :, None, :] * ws_sc[None, None, :, :]
               ).reshape(b, (1 + q) * d, n)
    wt = (c * jnp.concatenate([u_rows, moments], axis=1))
    wr = wt.shape[1]
    wr_pad = -(-wr // 8) * 8
    wt_pad = jnp.pad(wt, ((0, 0), (0, wr_pad - wr), (0, np_ - n))
                     ).astype(jnp.float32)
    z_pad = jnp.pad(normals.T, ((0, 0), (0, mp - m))).astype(jnp.float32)
    beta_pad = jnp.pad(jnp.swapaxes(c * betas_f, -1, -2),
                       ((0, 0), (0, 0), (0, mp - m))).astype(jnp.float32)
    us_sc = (unions_f / lengths).astype(jnp.float32)     # (B, q, d)
    return ws_pad, wt_pad, beta_pad, z_pad, us_sc, mp


def _pallas_descent_bvg(state: GaussianProcessState, unions_f: jax.Array,
                        v_f: jax.Array, betas_f: jax.Array,
                        normals: jax.Array, kernel_name: str,
                        interpret: bool = False):
    """Build the descent bvg backed by the per-step Pallas kernel."""
    from cornell_moe_tpu.ops import pallas_kernels as pk

    lengths = state.covariance.lengths
    m = normals.shape[0]
    ws_pad, wt_pad, beta_pad, z_pad, us_sc, mp = _pack_descent_inputs(
        state, unions_f, v_f, betas_f, normals, kernel_name)

    def bvg(x):                                          # (B, M, d)
        xs = jnp.swapaxes(x / lengths, -1, -2)           # (B, d, M)
        xs = jnp.pad(xs, ((0, 0), (0, 0), (0, mp - m))).astype(jnp.float32)
        g_sc = pk.pallas_descent_grad(xs, ws_pad, wt_pad, beta_pad,
                                      z_pad, us_sc, kernel_name,
                                      interpret=interpret)
        g = jnp.swapaxes(g_sc[:, :, :m], -1, -2).astype(x.dtype) / lengths
        return jnp.zeros(x.shape[:2], x.dtype), g

    return bvg


def _pallas_descent_full(state: GaussianProcessState, unions_f: jax.Array,
                         v_f: jax.Array, betas_f: jax.Array,
                         normals: jax.Array, x0: jax.Array, domain,
                         params, kernel_name: str,
                         interpret: bool = False) -> jax.Array:
    """Whole inner descent (gradient_ascent_batch semantics) in one
    Pallas kernel per outer GD step.  Returns x_star (B, M, d)."""
    from cornell_moe_tpu.ops import pallas_kernels as pk

    lengths = state.covariance.lengths
    m = normals.shape[0]
    ws_pad, wt_pad, beta_pad, z_pad, us_sc, mp = _pack_descent_inputs(
        state, unions_f, v_f, betas_f, normals, kernel_name)
    geom = jnp.stack([
        jnp.asarray(domain.lower) / lengths,
        jnp.asarray(domain.upper) / lengths,
        1.0 / lengths**2]).astype(jnp.float32)           # (3, d)
    xs0 = jnp.swapaxes(x0 / lengths, -1, -2)
    xs0 = jnp.pad(xs0, ((0, 0), (0, 0), (0, mp - m))).astype(jnp.float32)
    avg_n = max(int(params.num_steps_averaged), 0)
    steps = int(params.max_num_steps)
    if not (0 < avg_n <= steps):
        avg_n = 0
    xs_star = pk.pallas_descent_run(
        xs0, ws_pad, wt_pad, beta_pad, z_pad, us_sc, geom, kernel_name,
        steps=steps, restarts=max(int(params.max_num_restarts), 1),
        avg_n=avg_n, gamma=float(params.gamma),
        pre_mult=float(params.pre_mult),
        mrc=float(params.max_relative_change), interpret=interpret)
    return (jnp.swapaxes(xs_star[:, :, :m], -1, -2) * lengths
            ).astype(x0.dtype)


def _make_descent_grad_fn(state: GaussianProcessState, unions_f: jax.Array,
                          v_f: jax.Array, betas_f: jax.Array,
                          normals: jax.Array):
    """Analytic ascent-direction function for the frozen inner descent.

    Value-only channels.  Returns ``bvg(x) -> (zeros, grad of -mu')`` for
    ``x`` of shape (B, M, d).  All union-dependent weights are packed once
    into ``W`` (B, N, (1+q)(1+d)); each GD step contracts the p(s) field
    against W in a single einsum.

    Derivation: with w_eff = K^-1 y - V_b z_m,
        d mu'/dx_i = -sum_n p_n (x_i - X_ni)/l_i^2 w_eff_n
                     - sum_j p^u_j (x_i - U_ji)/l_i^2 beta_j
    and sum_n p_n (x_i - X_ni) w_eff_n = x_i * (A w)_0 - (A w)_i where A
    collects the p-weighted moments  sum_n p_n w_eff_n X_ni.

    On TPU/f32 the whole descent instead runs through the fused Pallas
    kernel (_pallas_descent_full); this XLA einsum path is the oracle and
    the f64/CPU path.
    """
    cov = state.covariance
    pts = state.points_sampled                      # (N, d)
    lengths = cov.lengths
    inv_l2 = 1.0 / lengths**2
    b, q, d = unions_f.shape
    n = pts.shape[0]

    # W columns: [K_inv_y | V (q) | K_inv_y*X_i (d) | V_q*X_i (q*d)]
    kiy = state.K_inv_y                             # (N,)
    w_cols = [kiy[None, :, None].repeat(b, axis=0), v_f]
    w_cols.append((kiy[:, None] * pts)[None].repeat(b, axis=0))  # (B,N,d)
    w_cols.append((v_f[:, :, :, None] * pts[None, :, None, :]
                   ).reshape(b, n, q * d))
    w = jnp.concatenate(w_cols, axis=-1)            # (B, N, (1+q)(1+d))

    ws = pts / lengths                              # scaled training inputs

    def bvg(x):                                     # x: (B, M, d)
        m = x.shape[1]
        xs = x / lengths
        diff = xs[:, :, None, :] - ws[None, None, :, :]   # (B, M, N, d)
        s = jnp.sum(diff * diff, axis=-1)
        p = cov._p(s)                               # (B, M, N)
        a = jnp.einsum("bmn,bnw->bmw", p, w,
                       precision=linalg.HIGHEST)    # (B, M, (1+q)(1+d))
        a0 = a[..., :1 + q]                         # p-weighted w_eff sums
        ax = a[..., 1 + q:].reshape(x.shape[0], m, 1 + q, d)
        # contract the fantasy draw: w_eff = col0 - cols[1:] @ z_m
        s0 = a0[..., 0] - jnp.sum(a0[..., 1:] * normals[None], axis=-1)
        sx = ax[..., 0, :] - jnp.sum(
            ax[..., 1:, :] * normals[None, :, :, None], axis=-2)
        grad_train = -(x * s0[..., None] - sx) * inv_l2    # (B, M, d)

        # union term (q points — small, diff form)
        diff_u = x[:, :, None, :] - unions_f[:, None, :, :]  # (B, M, q, d)
        t_u = diff_u * inv_l2
        s_u = jnp.sum(diff_u * t_u, axis=-1)
        p_u = cov._p(s_u)
        grad_union = -jnp.sum(
            (p_u * betas_f)[..., None] * t_u, axis=-2)       # (B, M, d)

        # ascent direction on -mu' = -(dmu'/dx)
        g = -(grad_train + grad_union)
        return jnp.zeros(x.shape[:2], x.dtype), g

    return bvg


def knowledge_gradient_batch(state: GaussianProcessState,
                             unions: jax.Array, discrete_pts: jax.Array,
                             normals: jax.Array, domain, inner_params,
                             best_so_far, num_fidelity: int = 0,
                             derivatives_to_sample: Sequence[int] = (),
                             inner_x0=None, return_x_star: bool = False,
                             warm_mode: str = "reseed"):
    """KG at B unions at once: (B, q, dim) -> (B,).

    Identical estimator to :func:`knowledge_gradient`; requires a state
    fitted with ``precompute_inverse=True``.  All B x n_mc inner
    posterior-mean descents step in lockstep: each GD step evaluates one
    (B*n_mc, N_ch) kernel-row block (MXU matmuls via the factored fantasy
    mean) instead of B*n_mc per-point kernel rows.

    Warm start: ``inner_x0`` (B, n_mc, dim_opt), when given, starts the
    inner descents from the previous outer step's argmins (which track the
    slowly-moving fantasy minima, so ``inner_params.max_num_steps`` can
    drop from ~6 to ~2).  Two modes:

    * ``warm_mode="pure"`` skips the discretized-set seeding entirely; the
      seed guard is replaced by the closed-form fantasy mean at the union
      points, mu'(U) = mu_U + C z - noise_eff * beta (exact:
      Sigma C^-T z with Sigma = C C^T - diag(noise_eff)), which covers
      the basin-shift case of new minima appearing near the moving union.
      Value-only channels, no fidelity dims.
    * ``warm_mode="reseed"`` keeps the full seeding (estimator identical
      to the cold path given the same descent endpoints); only the
      descent start comes from the carry, and the returned carry
      re-seeds any draw whose seeded guard beat the descended endpoint.

    With ``return_x_star`` the carried endpoints (B, n_mc, dim_opt) are
    returned as a second output.
    """
    ds = tuple(int(i) for i in derivatives_to_sample)
    b, q, dim = unions.shape
    c = 1 + len(ds)
    q_ch = q * c
    n_mc = normals.shape[0]
    dim_opt = dim - num_fidelity
    warm = inner_x0 is not None
    pure_warm = warm and warm_mode == "pure"
    if pure_warm and (state.derivatives or ds or num_fidelity):
        raise NotImplementedError(
            "pure warm-start KG requires value-only channels and no "
            "fidelity dims; use warm_mode='reseed' or the cold path")

    mu_u, chol_u, v, noise_eff = _build_fantasy_model_batch(state, unions,
                                                            ds)
    best_posterior = jnp.minimum(
        best_so_far, jnp.min(mu_u.reshape(b, q, c)[:, :, 0], axis=1))

    # fantasy weights for every (union, draw)
    betas = jnp.swapaxes(linalg.solve_triangular_small(
        chol_u, jnp.broadcast_to(normals.T, (b, q_ch, n_mc)),
        trans=True), -1, -2)                           # (B, n_mc, q_ch)

    x0_seed = None
    if pure_warm:
        x0 = lax.stop_gradient(inner_x0)               # (B, n_mc, d')
        # union-point guard, closed form and live (differentiable):
        # mu'(U) = mu_U + C z - noise_eff * beta per draw
        cz = jnp.einsum("bij,mj->bim", chol_u, normals,
                        precision=linalg.HIGHEST)           # (B, q_ch, M)
        mu_union_f = mu_u[:, :, None] + cz - \
            noise_eff[:, :, None] * jnp.swapaxes(betas, -1, -2)
        mu_x0 = jnp.min(mu_union_f, axis=1)                 # (B, n_mc)
        # the winning union point doubles as the reseed candidate so the
        # carry can jump basins toward the moving union
        u_idx = jnp.argmin(lax.stop_gradient(mu_union_f), axis=1)
        u_onehot = jax.nn.one_hot(u_idx, q_ch, axis=1,
                                  dtype=unions.dtype)       # (B, q, M)
        x0_seed = jnp.sum(
            u_onehot[..., None] *
            lax.stop_gradient(unions)[:, :, None, :dim_opt],
            axis=1)                                         # (B, M, d')
    else:
        # seeding over the discretized set, batched over unions
        starts = jnp.concatenate([
            jnp.broadcast_to(discrete_pts, (b,) + discrete_pts.shape),
            lax.stop_gradient(unions[:, :, :dim_opt])],
            axis=1)                                         # (B, n_s, d')
        n_s = starts.shape[1]
        starts_full = jax.vmap(jax.vmap(
            lambda p: _pin_fidelity(p, dim, num_fidelity)))(starts)
        k_sx = _kernel_rows_flat(
            state, starts_full.reshape(b * n_s, dim)).reshape(b, n_s, -1)
        k_su = _union_rows(state.covariance, starts_full, unions, ds)

        # mu'_z over the seed set, factored through the q_ch-dim fantasy
        # subspace: mu' = mean + k_sx K_inv_y - (k_sx V) z + k_su beta.
        # Contracting through q_ch (~4) instead of N (~500) per draw cuts
        # the seeding einsums by ~N/q_ch.  Computed LIVE (differentiable
        # through v/betas): the selected entry doubles as the mu'(x0)
        # guard value in the final minimum, saving a separate full live
        # evaluation.
        base = jnp.einsum("bsn,n->bs", k_sx, state.K_inv_y,
                          precision=linalg.HIGHEST)
        ksv = jnp.einsum("bsn,bnq->bsq", k_sx, v,
                         precision=linalg.HIGHEST)
        # the q_ch-sized contractions stay elementwise (VPU f32) instead
        # of spawning 6-pass matmul emulations over ~4-wide dots
        mu_starts = state.mean + base[:, :, None] - \
            jnp.sum(ksv[:, :, None, :] * normals[None, None, :, :],
                    axis=-1) \
            + jnp.sum(k_su[:, :, None, :] * betas[:, None, :, :], axis=-1)
        x0_idx = jnp.argmin(lax.stop_gradient(mu_starts),
                            axis=1)                         # (B, n_mc)
        # one-hot contraction instead of a gather (TPU gathers are slow)
        # and the live x0 guard value is simply the min over starts
        onehot = jax.nn.one_hot(x0_idx, n_s, axis=1,
                                dtype=starts.dtype)     # (B, n_s, n_mc)
        x0 = jnp.sum(onehot[..., None] *
                     lax.stop_gradient(starts)[:, :, None, :],
                     axis=1)                                # (B, n_mc, d')
        mu_x0 = jnp.min(mu_starts, axis=1)                  # (B, n_mc)
        # the seeded argmin is the reseed candidate for the returned carry
        # in the cold call too (it initializes the warm solver's carry):
        # any draw whose 6-step descent overshoots falls back to the
        # winning seed instead of handing the warm steps a losing start
        x0_seed = x0
        if warm:                                            # "reseed" mode
            x0 = lax.stop_gradient(inner_x0)

    # --- inner descent: all (B, n_mc) posterior-mean minimizations in
    # lockstep under the frozen fantasy model (envelope theorem)
    frozen_unions = lax.stop_gradient(unions)
    v_f = lax.stop_gradient(v)
    betas_f = lax.stop_gradient(betas)

    x_star = None
    if not state.derivatives and not ds and num_fidelity == 0:
        # Fast path: the GD loop consumes only gradients (reference
        # semantics — the objective is never evaluated during descent), and
        # for value-only channels the gradient contracts analytically:
        #   d mu'/dx_i = -sum_n p(s_n) t_ni (K^-1 y - V z)_n  + union term,
        # with t_ni = (x_i - X_ni)/l_i^2.  Expanding t_ni splits the sum
        # into moments of the training inputs, so each inner step is ONE
        # (B, M, N) x (B, N, (1+q_ch)(1+d)) einsum whose LHS field p(s)
        # fuses into the matmul — no autodiff backward pass, no (P, N)
        # residuals.  On TPU/f32 the WHOLE descent (steps, LimitUpdate,
        # Polyak averaging) runs in one fused Pallas kernel.
        kernel_name = _descent_kernel_name(state)
        if kernel_name is not None:
            # off-TPU the compiled Mosaic kernel cannot run; when the
            # "always" gate forces this path there (debugging), fall back
            # to interpret mode so the production call keeps working
            try:
                interp = jax.default_backend() != "tpu"
            except RuntimeError:
                interp = True
            x_star = _pallas_descent_full(
                state, frozen_unions, v_f, betas_f, normals, x0, domain,
                inner_params, kernel_name, interpret=interp)
        else:
            bvg = _make_descent_grad_fn(state, frozen_unions, v_f,
                                        betas_f, normals)
    else:
        def frozen_neg_mu_sum(x):
            return -jnp.sum(_fantasy_mean_batch(
                state, x, frozen_unions, v_f, betas_f, normals, ds,
                num_fidelity))

        def bvg(x):
            # each mu_{bm} depends only on x_{bm}, so the summed gradient
            # is the per-element gradient (only the grad drives the
            # descent, matching the reference GD loop)
            g = jax.grad(frozen_neg_mu_sum)(x)
            return jnp.zeros(x.shape[:2], x.dtype), g

    if x_star is None:
        x_star = optimizers.gradient_ascent_batch(bvg, domain, x0,
                                                  inner_params)
    x_star = lax.stop_gradient(x_star)

    # differentiable (live) evaluation at the descent endpoint; the seeding
    # value at x0 (already live) guards against stray divergence
    # (a jax.checkpoint remat here was tried and reverted: recomputing the
    # kernel rows in the backward pass measured slower than staging them)
    mu_star = _fantasy_mean_batch(state, x_star, unions, v, betas,
                                  normals, ds, num_fidelity)
    best_min = jnp.minimum(mu_star, mu_x0)                  # (B, n_mc)
    kg = jnp.mean(best_posterior[:, None] - best_min, axis=1)
    if return_x_star:
        if x0_seed is not None:
            # re-seed any draw whose guard candidate beat the descended
            # endpoint, so the carry jumps basins instead of tracking a
            # stale local minimum
            won = lax.stop_gradient(mu_star <= mu_x0)[..., None]
            x_star = jnp.where(won, x_star, x0_seed)
        return kg, x_star
    return kg


def knowledge_gradient_mcmc_batch(states: GaussianProcessState,
                                  unions: jax.Array,
                                  discrete_pts: jax.Array,
                                  normals: jax.Array, domain,
                                  inner_params, best_so_far,
                                  num_to_sample: int,
                                  num_fidelity: int = 0,
                                  derivatives_to_sample: Sequence[int] = (),
                                  inner_x0=None,
                                  return_x_star: bool = False,
                                  warm_mode: str = "reseed"):
    """Batched ensemble KG: (B, q, dim) -> (B,), averaged over members and
    divided by the fidelity cost of each union.

    ``inner_x0`` (S, B, n_mc, dim_opt) warm-starts every member's inner
    descents (see :func:`knowledge_gradient_batch`); with
    ``return_x_star`` the per-member descent endpoints come back in the
    same shape for carrying across outer GD steps.
    """
    def one(s, dpts, bsf, x0):
        return knowledge_gradient_batch(
            s, unions, dpts, normals, domain, inner_params, bsf,
            num_fidelity, derivatives_to_sample, inner_x0=x0,
            return_x_star=True, warm_mode=warm_mode)

    kgs, x_stars = jax.vmap(one, in_axes=(0, 0, 0,
                                          None if inner_x0 is None else 0)
                            )(states, discrete_pts, best_so_far, inner_x0)
    costs = jax.vmap(lambda u: fidelity_cost(u, num_to_sample,
                                             num_fidelity))(unions)
    kg = jnp.mean(kgs, axis=0) / costs
    if return_x_star:
        return kg, x_stars
    return kg


def knowledge_gradient_mcmc_batch_value_and_grad(
        states, unions, discrete_pts, normals, domain, inner_params,
        best_so_far, num_to_sample, num_fidelity: int = 0,
        derivatives_to_sample: Sequence[int] = ()):
    """((B,), (B, q, dim)) value and per-union gradients via one vjp.

    Cold-path delegate of :func:`knowledge_gradient_mcmc_batch_vg_carry`
    (the unused carry output is dead-code-eliminated under jit)."""
    vals, grads, _ = knowledge_gradient_mcmc_batch_vg_carry(
        states, unions, discrete_pts, normals, domain, inner_params,
        best_so_far, num_to_sample, num_fidelity, derivatives_to_sample)
    return vals, grads


def knowledge_gradient_mcmc_batch_vg_carry(
        states, unions, discrete_pts, normals, domain, inner_params,
        best_so_far, num_to_sample, num_fidelity: int = 0,
        derivatives_to_sample: Sequence[int] = (), inner_x0=None,
        warm_mode: str = "reseed"):
    """Like the value_and_grad variant but threading the warm-start carry.

    Returns ((B,) values, (B, q, dim) grads, (S, B, n_mc, dim_opt)
    descent endpoints).  With ``inner_x0=None`` this is the cold (seeded)
    estimator whose endpoints initialize the carry.
    """
    def f(u):
        kg, x_stars = knowledge_gradient_mcmc_batch(
            states, u, discrete_pts, normals, domain, inner_params,
            best_so_far, num_to_sample, num_fidelity,
            derivatives_to_sample, inner_x0=inner_x0, return_x_star=True,
            warm_mode=warm_mode)
        return kg, x_stars

    vals, vjp, x_stars = jax.vjp(f, unions, has_aux=True)
    grads = vjp(jnp.ones_like(vals))[0]
    return vals, grads, x_stars


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
        chunk_size=None, use_batched: bool = True,
        warm_start: bool = True,
        conv_tol: Optional[float] = None, mesh=None,
        mesh_axis: str = "restarts") -> jax.Array:
    """MCMC-averaged q-KG suggestion over a stacked ensemble.

    Counterpart of multistart_knowledge_gradient_mcmc_optimization
    (cpp_wrappers/knowledge_gradient_mcmc.py:247).  ``best_so_far`` is (S,)
    (per-model best posterior-mean value, examples/main.py:181-196);
    ``discrete_pts`` is (S, n_d, dim_opt).

    ``warm_start``: run the outer GD with the "reseed" warm carry — the
    inner descents start from the previous step's argmins with 1 step
    instead of ``inner_params.max_num_steps``, while the seeding (and
    hence the estimator) is unchanged; measured 4.3x on the suggest
    bench at equal suggestion quality (benchmarks/SWEEP_r03.md).  Since
    round 4 this covers derivative-sampling channels (d-KG) and
    fidelity dims (cf-KG) too: the reseed carry only changes descent
    STARTS, which is channel-agnostic (warm==cold equivalence for both
    enforced by tests/test_kg_warm_start.py).

    ``conv_tol`` (warm path only): per-chunk convergence-gated early
    exit on the outer GD — the C++ GD's step-norm tolerance semantics
    (gpp_optimization.hpp:641,667-671) applied chunk-wide; see
    multistart_optimize_batched_warm.

    ``mesh``: optional jax.sharding.Mesh — shards the restart axis
    across devices (the TPU-native counterpart of the OpenMP multistart
    in gpp_optimization.hpp:1452-1564, reachable from the production
    driver via BayesianOptimizer(n_devices=...)).  chunk_size defaults
    to the per-device shard size so sharded and single-device runs
    gate over identical start groups.
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

    if mesh is not None:
        from cornell_moe_tpu.parallel import sharding as shard_mod

    if use_batched and states.inv_chol_K is not None:
        def to_union(pts_batch):
            return pts_batch if being is None else jnp.concatenate(
                [pts_batch,
                 jnp.broadcast_to(being, (pts_batch.shape[0],) +
                                  being.shape)], axis=1)

        if warm_start:
            import dataclasses

            inner_warm = dataclasses.replace(
                inner_params, max_num_steps=1, max_num_restarts=1,
                num_steps_averaged=0)

            def bvg_cold(pts_batch):
                vals, grads, xs = knowledge_gradient_mcmc_batch_vg_carry(
                    states, to_union(pts_batch), discrete_pts, normals,
                    inner_domain, inner_params, best_so_far,
                    num_to_sample, num_fidelity, ds)
                return vals, grads[:, :num_to_sample], xs

            def bvg_warm(pts_batch, carry):
                vals, grads, xs = knowledge_gradient_mcmc_batch_vg_carry(
                    states, to_union(pts_batch), discrete_pts, normals,
                    inner_domain, inner_warm, best_so_far,
                    num_to_sample, num_fidelity, ds, inner_x0=carry,
                    warm_mode="reseed")
                return vals, grads[:, :num_to_sample], xs

            if mesh is not None:
                res = shard_mod.sharded_multistart_optimize_batched_warm(
                    bvg_cold, bvg_warm, rep, starts, params,
                    axis_name=mesh_axis, mesh=mesh,
                    chunk_size=chunk_size, conv_tol=conv_tol)
            else:
                res = optimizers.multistart_optimize_batched_warm(
                    bvg_cold, bvg_warm, rep, starts, params,
                    chunk_size=chunk_size, conv_tol=conv_tol)
            return res.best_point

        def bvg(pts_batch):
            vals, grads = knowledge_gradient_mcmc_batch_value_and_grad(
                states, to_union(pts_batch), discrete_pts, normals,
                inner_domain, inner_params, best_so_far, num_to_sample,
                num_fidelity, ds)
            return vals, grads[:, :num_to_sample]

        if mesh is not None:
            res = shard_mod.sharded_multistart_optimize_batched_gated(
                bvg, rep, starts, params, mesh, axis_name=mesh_axis,
                chunk_size=chunk_size)
        else:
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
    if mesh is not None:
        res = shard_mod.sharded_multistart_optimize(
            vg, rep, starts, params, mesh, axis_name=mesh_axis)
    else:
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
