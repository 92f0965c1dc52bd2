"""On-device MCMC hyperparameter inference and the batched GP ensemble.

Counterpart of ``python/cpp_wrappers/log_likelihood_mcmc.py`` (the
``GaussianProcessLogLikelihoodMCMC.train()`` loop built on host-side emcee)
and of ``GaussianProcessMCMC`` (gpp_knowledge_gradient_mcmc_optimization
.hpp:140, a std::vector of per-sample GPs).

TPU-native design
-----------------
The reference crosses the Python->C++ boundary ~(burnin + chain) * n_chains
times, each call rebuilding and refactorizing K from scratch on 4 OpenMP
threads (SURVEY.md section 3.2 — the 5.53 s retrain).  Here the
affine-invariant "stretch move" ensemble sampler (Goodman & Weare 2010, the
algorithm inside emcee) runs entirely on device: walkers are a batch axis,
every step evaluates all walkers' log-posteriors as one vmapped Cholesky
batch on the MXU, and the whole chain is a single ``lax.scan`` — one XLA
program for the entire train() call.

The hyperparameter ensemble GP is a *stacked* GaussianProcessState (leading
ensemble axis on every array leaf) rather than a list of models, so every
downstream acquisition averages over the ensemble with ``vmap`` instead of a
serial loop (gpp_knowledge_gradient_mcmc_optimization.cpp:137-143).
"""

from __future__ import annotations

import functools
import logging
import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cornell_moe_tpu.models import covariance as cov_mod
from cornell_moe_tpu.models import gp as gp_mod
from cornell_moe_tpu.models import likelihood as lik_mod
from cornell_moe_tpu.models.priors import DefaultPrior

# Hard bounds on log-hyperparameters (log_likelihood_mcmc.py:286).
LOG_BOUND = 20.0

# Noise pinned when noisy=False (log_likelihood_mcmc.py:231).
NOISELESS_VALUE = 1.0e-8

# Noise assigned to shape-bucket padding points: large enough that they
# carry no information, small enough to keep f32 Cholesky well-scaled.
PAD_NOISE = 1.0e8

# Gate for the fused Pallas LML kernel in the MCMC chain:
# "never" = the vmapped XLA path; "auto" (default) = TPU/f32;
# "always" = force (tests use interpret through the kernel directly).
# The round-2 kernel's compiled-Mosaic NaN was root-caused to the MXU's
# default bf16 dot precision corrupting trailing Schur updates; the
# rebuilt kernel (ops/pallas_kernels.pallas_lml_fused) pins HIGHEST on
# its in-kernel dots and is compiled-validated on v5e
# (benchmarks/check_lml_fused.py: 0.79 ms vs XLA 1.50 ms at (8, 512)).
LML_PALLAS = "auto"


def bucket_size(n: int, bucket: int) -> int:
    if bucket <= 1:
        return n
    return ((n + bucket - 1) // bucket) * bucket


def pad_training_data(x, y, target_n: int):
    """Pad (x, y) to target_n rows with huge-noise dummy points.

    Returns (x_pad, y_pad, point_noise (target_n, 1+m), real_mean).
    Dummy points replicate the first row with the value channel set to
    the real empirical mean, so best-observed/mean statistics are
    unaffected; their PAD_NOISE rows make their posterior influence
    ~1/PAD_NOISE.
    """
    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    if y.ndim == 1:
        y = y[:, None]
    n, nch = y.shape
    real_mean = float(y[:, 0].mean())
    n_pad = target_n - n
    if n_pad <= 0:
        return x, y, np.zeros_like(y), real_mean
    x_pad = np.concatenate([x, np.repeat(x[:1], n_pad, axis=0)])
    y_fill = np.zeros((n_pad, nch))
    y_fill[:, 0] = real_mean
    y_pad = np.concatenate([y, y_fill])
    noise = np.zeros((target_n, nch))
    noise[n:, :] = PAD_NOISE
    return x_pad, y_pad, noise, real_mean


def stretch_move_step(key: jax.Array, positions: jax.Array,
                      log_probs: jax.Array, log_prob_fn: Callable,
                      a: float = 2.0):
    """One ensemble stretch-move update (both half-ensembles).

    ``positions`` is (W, D) with W even; ``log_prob_fn`` maps (W, D) ->
    (W,).  Returns updated (positions, log_probs).
    """
    w, d = positions.shape
    half = w // 2

    def update_half(key, movers, movers_lp, others):
        kz, kc, ku = jax.random.split(key, 3)
        # g(z) ~ 1/sqrt(z) on [1/a, a]  =>  z = ((a-1) u + 1)^2 / a
        u = jax.random.uniform(kz, (half,), dtype=positions.dtype)
        z = ((a - 1.0) * u + 1.0) ** 2 / a
        partners = others[jax.random.randint(kc, (half,), 0, half)]
        proposal = partners + z[:, None] * (movers - partners)
        prop_lp = log_prob_fn(proposal)
        log_accept = (d - 1.0) * jnp.log(z) + prop_lp - movers_lp
        accept = jnp.log(
            jax.random.uniform(ku, (half,), dtype=positions.dtype)
        ) < log_accept
        new_pos = jnp.where(accept[:, None], proposal, movers)
        new_lp = jnp.where(accept, prop_lp, movers_lp)
        return new_pos, new_lp

    k1, k2 = jax.random.split(key)
    first, second = positions[:half], positions[half:]
    lp1, lp2 = log_probs[:half], log_probs[half:]
    first, lp1 = update_half(k1, first, lp1, second)
    second, lp2 = update_half(k2, second, lp2, first)
    return jnp.concatenate([first, second]), jnp.concatenate([lp1, lp2])


def run_ensemble_mcmc(key: jax.Array, log_prob_fn: Callable,
                      initial_positions: jax.Array, num_steps: int,
                      a: float = 2.0, keep_chain: bool = False):
    """Run the stretch-move sampler for ``num_steps`` via lax.scan.

    Returns (final_positions, final_log_probs[, chain]).
    """
    lp0 = log_prob_fn(initial_positions)

    def step(carry, k):
        pos, lp = carry
        pos, lp = stretch_move_step(k, pos, lp, log_prob_fn, a=a)
        return (pos, lp), (pos if keep_chain else None)

    keys = jax.random.split(key, num_steps)
    (pos, lp), chain = lax.scan(step, (initial_positions, lp0), keys)
    if keep_chain:
        return pos, lp, chain
    return pos, lp


# Gated-chain defaults: segments of this many stretch-move steps between
# convergence checks, and a floor (in SEGMENTS) before the gate may fire
# so the walkers decorrelate from the (warm) start even when the
# equilibration statistic is immediately flat.  2 segments x 64 steps =
# 128 >> the measured autocorrelation time of the production posteriors
# (~5-15 steps at D=5-9; see tests/test_likelihood_mcmc.py gated-parity
# tests and docs/retrain_gate_r05.md for the statistics evidence).
CHAIN_GATE_SEGMENT = 64
CHAIN_GATE_MIN_SEGMENTS = 2


def run_ensemble_mcmc_gated(key: jax.Array, log_prob_fn: Callable,
                            initial_positions: jax.Array, max_steps: int,
                            rel_tol: float = 1.0, a: float = 2.0,
                            segment: int = CHAIN_GATE_SEGMENT,
                            min_segments: int = CHAIN_GATE_MIN_SEGMENTS):
    """Convergence-gated stretch-move chain (equilibration early exit).

    Identical per-step transition kernel to :func:`run_ensemble_mcmc`
    (the walker key schedule differs: per-segment ``fold_in`` instead of
    one up-front split, so the two runners are different — equally
    valid — realizations of the same sampler).  The chain runs in
    ``segment``-step blocks under ``lax.while_loop`` and stops once the
    block-averaged ensemble-mean log-posterior has stopped drifting:

        |m_i - m_{i-1}|  <=  rel_tol * std_walkers(lp) / sqrt(W)

    and the block-averaged ensemble-mean POSITION has stopped drifting
    in every hyperparameter dimension (same criterion with the walker
    spread of that dimension) — i.e. every monitored drift is below the
    resolution at which the corresponding ensemble mean is even defined
    (the standard error the walker spread implies).  Both one-block-lag
    and two-block-lag drifts must pass: slowly-mixing heavy-tailed
    hyperparameters (a near-noiseless problem's log-noise) plateau the
    log-posterior while still drifting monotonically, and the two-lag
    test sees double the drift signal at only sqrt(2) the noise.  At
    stationarity the block means fluctuate at exactly the SEM scale, so
    ``rel_tol`` ~ 1 is the natural gate; a warm steady-state retrain
    (p0 = previous posterior, one new observation) passes it after the
    ``min_segments`` floor, while a genuinely drifting chain (fresh
    prior start, changed data regime, slow hyper) keeps running to
    ``max_steps``.  Non-finite statistics never satisfy the gate.

    Returns (positions, log_probs, steps_taken).
    """
    w = initial_positions.shape[0]
    lp0 = log_prob_fn(initial_positions)
    max_segments = -(-max_steps // segment)
    inv_sqrt_w = 1.0 / math.sqrt(w)

    def run_segment(carry_key, seg_idx, pos, lp):
        keys = jax.random.split(jax.random.fold_in(carry_key, seg_idx),
                                segment)

        def step(carry, k):
            p, l = carry
            p, l = stretch_move_step(k, p, l, log_prob_fn, a=a)
            return (p, l), (jnp.mean(l), jnp.mean(p, axis=0))

        (pos, lp), (lp_means, pos_means) = lax.scan(step, (pos, lp), keys)
        stat = jnp.concatenate(
            [jnp.mean(lp_means)[None], jnp.mean(pos_means, axis=0)])
        return pos, lp, stat

    def cond(state):
        seg_idx, _, _, _, _, converged = state
        return (seg_idx < max_segments) & ~converged

    def body(state):
        seg_idx, pos, lp, prev1, prev2, _ = state
        pos, lp, stat = run_segment(key, seg_idx, pos, lp)
        # SEM scale per statistic: [lp, theta_1..theta_D] walker spreads
        scale = jnp.concatenate(
            [jnp.std(lp)[None], jnp.std(pos, axis=0)]) * inv_sqrt_w
        drift1 = jnp.abs(stat - prev1)
        drift2 = jnp.abs(stat - prev2) * 0.5
        settled = jnp.all(
            jnp.isfinite(drift1) & (drift1 <= rel_tol * scale) &
            jnp.isfinite(drift2) & (drift2 <= rel_tol * scale))
        converged = settled & (seg_idx + 1 >= min_segments)
        return (seg_idx + 1, pos, lp, stat, prev1, converged)

    dtype = lp0.dtype
    d = initial_positions.shape[1]
    inf_stat = jnp.full((1 + d,), jnp.inf, dtype)
    init = (jnp.zeros((), jnp.int32), initial_positions, lp0,
            inf_stat, inf_stat, jnp.asarray(False))
    seg_count, pos, lp, _, _, _ = lax.while_loop(cond, body, init)
    return pos, lp, seg_count * segment


# ---------------------------------------------------------------------------
# Batched GP ensemble (GaussianProcessMCMC counterpart)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _ensemble_fit_program(kernel_name: str, derivatives: tuple,
                          jitter: float, f32: bool, has_point_noise: bool,
                          has_mean: bool):
    """Cached jitted vmapped ensemble fit.

    The eager vmapped fit dispatched each of its ~15 ops separately over
    the TPU tunnel (~30 ms floor on big-operand dispatches), a fixed
    ~0.15 s tax on EVERY retrain that the round-5 gated chain exposed
    as ~40% of the remaining wall; one jitted program collapses it to a
    single dispatch.  Static across the cache key: kernel, channel
    layout, jitter policy, presence of point-noise/mean (shape/dtype
    specialization is jit's own cache).
    """
    def fit(hypers, noises, x, y, point_noise, mean):
        def one(h, nv):
            cov = cov_mod.COVARIANCE_TYPES[kernel_name](
                hyperparameters=h)
            jit_w = jitter
            if f32:
                # f32 conditioning floor (config.F32_CHOLESKY_JITTER,
                # relative via the walker's amplitude): walkers that
                # visit near-noiseless hypers with domain-sized
                # lengthscales produce block matrices whose f32
                # Cholesky goes non-finite — on derivative-channel
                # systems MOST of the ensemble (13/16 measured on
                # BraninWithDerivatives at 52 obs) — which the repair
                # path can only paper over.  1e-6 relative is below
                # every f32 test tolerance and exactly zero in the
                # f64 parity suite.
                from cornell_moe_tpu.config import F32_CHOLESKY_JITTER
                jit_w = jitter + F32_CHOLESKY_JITTER * h[0]
            return gp_mod.fit_gp(cov, nv, x, y, derivatives,
                                 jitter=jit_w, point_noise=point_noise,
                                 mean=mean)

        return jax.vmap(one)(hypers, noises)

    if not has_point_noise and not has_mean:
        return jax.jit(lambda h, n, x, y: fit(h, n, x, y, None, None))
    if has_point_noise and has_mean:
        return jax.jit(fit)
    if has_point_noise:
        return jax.jit(lambda h, n, x, y, pn: fit(h, n, x, y, pn, None))
    return jax.jit(lambda h, n, x, y, m: fit(h, n, x, y, None, m))


def fit_gp_ensemble(kernel_name: str, hypers: jax.Array,
                    noises: jax.Array, points, values,
                    derivatives: Sequence[int] = (), jitter: float = 0.0,
                    bucket: int = 0) -> gp_mod.GaussianProcessState:
    """Fit one GP per hyperparameter sample as a stacked state.

    ``hypers`` is (S, 1+dim) covariance hyperparameters (linear space);
    ``noises`` is (S, 1+m).  Equivalent to GaussianProcessMCMC's vector of
    GaussianProcess objects (gpp_kg_mcmc_optimization.cpp:40-49), but with
    the ensemble as a leading batch axis on every leaf.  Runs as ONE
    cached jitted program per (config, shape) — see
    :func:`_ensemble_fit_program`.
    """
    x = np.asarray(points)
    y = np.asarray(values)
    if y.ndim == 1:
        y = y[:, None]
    point_noise = None
    mean = None
    if bucket > 1:
        target = bucket_size(x.shape[0], bucket)
        x, y, point_noise, mean = pad_training_data(x, y, target)
        point_noise = jnp.asarray(point_noise)
    xj, yj = jnp.asarray(x), jnp.asarray(y)

    prog = _ensemble_fit_program(
        kernel_name, tuple(int(i) for i in derivatives), float(jitter),
        xj.dtype == jnp.float32, point_noise is not None,
        mean is not None)
    args = [jnp.asarray(hypers), jnp.asarray(noises), xj, yj]
    if point_noise is not None:
        args.append(point_noise)
    if mean is not None:
        args.append(jnp.asarray(mean, xj.dtype))
    return prog(*args)


def ensemble_size(states: gp_mod.GaussianProcessState) -> int:
    return states.points_sampled.shape[0]


def ensemble_member(states: gp_mod.GaussianProcessState, i: int
                    ) -> gp_mod.GaussianProcessState:
    return jax.tree.map(lambda leaf: leaf[i], states)


# ---------------------------------------------------------------------------
# The training object (GaussianProcessLogLikelihoodMCMC counterpart)
# ---------------------------------------------------------------------------

class GaussianProcessLogLikelihoodMCMC:
    """MCMC treatment of GP hyperparameters, on device.

    Mirrors the reference class (log_likelihood_mcmc.py:68): hyperparameters
    theta = log([alpha, l_1..l_d, noise_channels...]) with a prior, sampled
    by an ensemble sampler; ``train()`` runs burn-in once then continues the
    chain, keeping the last sample of ``n_hypers`` random walkers.

    Unlike the reference, the entire chain is one jitted device program and
    the resulting ensemble is a stacked GP state usable directly by the
    vmapped MCMC-averaged acquisitions.
    """

    def __init__(self, historical_data, derivatives: Sequence[int] = (),
                 prior=None, chain_length: int = 1000,
                 burnin_steps: int = 2000, n_hypers: int = 16,
                 noisy: bool = True, kernel_name: str = "matern_2.5",
                 rng_key: Optional[jax.Array] = None, bucket: int = 0,
                 mesh=None, mesh_axis: str = "restarts",
                 standardize: bool = False,
                 chain_gate_tol: Optional[float] = None):
        self._data = historical_data
        # f32 robustness: train on (y - mean) / std of the VALUE channel
        # (derivative channels scale by 1/std; they are translation-
        # invariant).  Raw-scale objectives push the chain to amplitudes
        # ~ y_var where the noiseless 1e-8 nugget is ~1e-12 RELATIVE and
        # single-precision Cholesky factorizations go non-finite (the
        # ensemble-repair path, and — on block systems with derivative
        # channels — a total failure).  The reference never needs this
        # because its C++ core is f64 end-to-end; the DefaultPrior's
        # Normal(0,1) log-amplitude prior ASSUMES standardized data
        # (base_prior.py heritage), so this also makes the prior
        # well-matched.  HistoricalData stays in RAW units (checkpoints,
        # print_historical_data); only the training targets are scaled.
        # value_mean/value_scale expose the affine map for callers that
        # report model-unit quantities (VOI) in raw units.
        self.standardize = standardize
        self.value_mean = 0.0
        self.value_scale = 1.0
        # convergence gate on the post-burn-in chain (None = the full
        # fixed-length chain, reference parity).  A float enables
        # run_ensemble_mcmc_gated with that rel_tol: ``chain_length``
        # becomes the CAP and each retrain's chain exits at its measured
        # equilibration — the retrain counterpart of the suggest-phase
        # conv gate.  Burn-in is never gated.  ``last_chain_steps``
        # records the steps the most recent train() actually ran.
        self.chain_gate_tol = chain_gate_tol
        self.last_chain_steps: Optional[int] = None
        # optional device mesh: walker log-posterior evaluations (the
        # chain's only expensive part, one Cholesky per walker) shard
        # across devices; the stretch-move bookkeeping stays replicated.
        # Per-walker math is independent, so sharded == single-device.
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        # shape bucketing: pad n to multiples of `bucket` so retraining
        # after new observations reuses the compiled chain/fit programs
        self.bucket = bucket
        self._derivatives = tuple(int(i) for i in derivatives)
        self.dim = historical_data.dim
        num_noise = 1 + len(self._derivatives)
        n_dims = 1 + self.dim + num_noise
        self.prior = prior if prior is not None else DefaultPrior(
            n_dims=n_dims, num_noise=num_noise)
        self.chain_length = chain_length
        self.burnin_steps = burnin_steps
        # even walker count >= 2*D, as emcee requires
        self.n_hypers = max(n_hypers, 2 * n_dims)
        if self.n_hypers % 2:
            self.n_hypers += 1
        self.noisy = noisy
        self.kernel_name = kernel_name
        self.burned = False
        self.p0 = None
        self._key = rng_key if rng_key is not None else \
            jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        self._models: Optional[gp_mod.GaussianProcessState] = None
        self.hypers = None
        self._hypers = None
        self._noises = None
        # establish the initial affine map from the construction-time
        # data (pre-train reads of _scaled_values / compute_log_likelihood
        # see a well-defined map, not the identity placeholder)
        self._refresh_value_affine()

    # -- log posterior ----------------------------------------------------
    def _refresh_value_affine(self) -> None:
        """Re-estimate the standardization map from the current data.

        Called explicitly at every (re)fit boundary — train(),
        optimize(), add_sampled_points() — never as a read-path side
        effect, so ``value_mean``/``value_scale`` always describe the
        map the CURRENTLY FITTED models were trained with (ADVICE r4):
        a caller reading them between a data update and the next fit
        sees the fitted map, not a half-updated one.
        """
        if not self.standardize:
            return
        y = np.asarray(self._data.points_sampled_value, dtype=float)
        if y.ndim == 1:
            y = y[:, None]
        mu = float(y[:, 0].mean())
        sigma = float(y[:, 0].std())
        if not np.isfinite(sigma) or sigma < 1e-12:
            sigma = 1.0
        self.value_mean, self.value_scale = mu, sigma

    def _scaled_values(self):
        """Training targets under the CURRENT affine map (pure read).

        The map itself is only updated by :meth:`_refresh_value_affine`
        at fit boundaries (spearmint-style re-centering as observations
        accrue happens there, once per retrain).
        """
        y = np.asarray(self._data.points_sampled_value, dtype=float)
        if y.ndim == 1:
            y = y[:, None]
        if not self.standardize:
            return y
        scaled = y / self.value_scale
        scaled[:, 0] = (y[:, 0] - self.value_mean) / self.value_scale
        return scaled

    def _padded_data(self):
        x = self._data.points_sampled
        y = self._scaled_values()
        if self.bucket > 1:
            target = bucket_size(x.shape[0], self.bucket)
            x, y, point_noise, _ = pad_training_data(x, y, target)
            return jnp.asarray(x), jnp.asarray(y), \
                jnp.asarray(point_noise)
        return jnp.asarray(x), jnp.asarray(y), None

    def _log_posterior_with_data(self, force_xla: bool = False):
        """vmapped log-posterior taking the (padded) data as arguments.

        ``force_xla`` bypasses the Pallas LML branch (which has no VJP);
        MAP optimization differentiates/hessians through this function
        and must always get the autodiff-capable XLA path.

        Keeping the data out of the closure means retrains re-dispatch one
        cached compiled program with fresh arrays instead of re-tracing a
        chain whose constants embed the whole training set (host-side
        retrace + giant-constant dispatch dominated the per-iteration
        retrain before this).
        """
        derivs = self._derivatives
        dim = self.dim
        num_noise = 1 + len(derivs)
        noisy = self.noisy
        prior = self.prior
        kernel = cov_mod.COVARIANCE_TYPES[self.kernel_name]

        def log_posterior_single(theta, x, y, point_noise):
            in_bounds = jnp.all(jnp.abs(theta) <= LOG_BOUND)
            lp = prior.lnprob(theta)
            hyps = jnp.exp(theta)
            cov_hyps = hyps[:dim + 1]
            noise = hyps[dim + 1:]
            if not noisy:
                noise = jnp.full((num_noise,), NOISELESS_VALUE,
                                 dtype=theta.dtype)
            lml = lik_mod.log_marginal_likelihood(
                kernel(hyperparameters=cov_hyps), noise, x, y, derivs,
                point_noise=point_noise)
            val = lp + lml
            return jnp.where(in_bounds & jnp.isfinite(val), val, -jnp.inf)

        vmapped = jax.vmap(log_posterior_single, in_axes=(0, None, None,
                                                          None))
        if self._derivatives or self.kernel_name not in \
                cov_mod.COVARIANCE_TYPES or LML_PALLAS == "never" or \
                force_xla:
            return vmapped
        try:
            on_tpu = jax.default_backend() == "tpu"
        except RuntimeError:
            on_tpu = False
        if not on_tpu and LML_PALLAS != "always":
            return vmapped

        kernel_name = self.kernel_name

        def log_posterior_batch(thetas, x, y, point_noise):
            """All walkers through the fused Pallas LML kernel.

            The stretch-move chain's per-step cost is otherwise dominated
            by XLA's latency-bound batched small Cholesky; the fused
            kernel (ops/pallas_kernels.pallas_lml_fused) runs K build +
            depth-2 blocked Cholesky + forward substitution + logdet for
            a WB-walker batch entirely in VMEM (0.67 ms vs XLA's 1.52 ms
            at (8, 512) on v5e, K build included).
            """
            from cornell_moe_tpu.ops import pallas_kernels as pk

            n_obs = x.shape[0]
            # Cutoff 896 is a PERFORMANCE choice since round 5, no
            # longer a compile limit: the panel-built K + slabbed
            # trailing update (ops/pallas_kernels.py) lifted the
            # round-3 Mosaic failure to Np = 1024 at wb = 2 (compiles,
            # 2.5e-4 vs numpy — benchmarks/LML_LARGE_r05.json; wb = 1
            # at >= 1024 and every Np >= 1280 still fail), but MEASURED
            # at that size the fused factorization only ties XLA's
            # batched Cholesky (5.87 vs 5.85 ms/16-walker eval) and the
            # in-chain retrain ran 9% slower than the XLA fallback
            # (5.76 vs 5.27 s ungated at n = 1000, SCALING_r05 vs r04:
            # the kernel pads 1008 -> 1024 and has nothing left to
            # fuse away at this size).  Below 896 the fused kernel's
            # ~2x win stands; above it XLA is the faster path.
            if x.dtype != jnp.float32 or n_obs > 896:
                return vmapped(thetas, x, y, point_noise)
            w = thetas.shape[0]
            np_ = -(-n_obs // 128) * 128
            # per-program VMEM: the (wb, Np, Np) working matrix <= ~8 MB
            wb = 1
            for cand in (8, 4, 2):
                if w % cand == 0 and cand * np_ * np_ * 4 <= 8 * 2**20:
                    wb = cand
                    break
            lp = jax.vmap(prior.lnprob)(thetas)
            in_bounds = jnp.all(jnp.abs(thetas) <= LOG_BOUND, axis=1)
            hyps = jnp.exp(thetas)
            alphas = hyps[:, 0]
            lengths = hyps[:, 1:dim + 1]
            if noisy:
                noise = hyps[:, dim + 1]
            else:
                noise = jnp.full((w,), NOISELESS_VALUE, thetas.dtype)

            n = n_obs
            us = jnp.swapaxes(x, 0, 1)[None] / lengths[:, :, None]
            if np_ != n:
                pad = 1e6 * (jnp.arange(np_ - n, dtype=jnp.float32) + 1.0)
                us = jnp.concatenate([
                    us, jnp.broadcast_to(pad[None, None, :],
                                         (w, dim, np_ - n))], axis=-1)
            nv = jnp.broadcast_to(noise[:, None], (w, n))
            if point_noise is not None:
                nv = nv + point_noise[None, :, 0]
            nv = jnp.pad(nv, ((0, 0), (0, np_ - n)), constant_values=1e8)
            yb = jnp.pad(jnp.broadcast_to(y[None, :, 0], (w, n)),
                         ((0, 0), (0, np_ - n)))
            quad, logdet = pk.pallas_lml_fused(
                us, alphas, nv, yb, kernel_name, n_real=n, wb=wb)
            lml = (-0.5 * quad - logdet
                   - 0.5 * n * math.log(2.0 * math.pi))
            val = lp + lml
            return jnp.where(in_bounds & jnp.isfinite(val), val, -jnp.inf)

        return log_posterior_batch

    def _make_log_posterior(self):
        x, y, point_noise = self._padded_data()
        f = self._log_posterior_with_data()
        return lambda thetas: f(thetas, x, y, point_noise)

    def _chain_fn(self):
        """Cached jitted chain runner: (key, p0, x, y, pnoise) -> walkers.

        One compile per (num_steps, data-shape) pair; shape bucketing keeps
        the data shape stable across iterations, so per-iteration retrains
        are a single device dispatch.
        """
        if getattr(self, "_chain_fn_cache", None) is None:
            log_post = self._log_posterior_with_data()
            mesh, axis = self.mesh, self.mesh_axis

            if mesh is None:
                def lp_fn(t, x, y, point_noise):
                    return log_post(t, x, y, point_noise)
            else:
                from jax.sharding import PartitionSpec as P

                from cornell_moe_tpu.parallel.sharding import \
                    pad_to_multiple
                n_dev = mesh.shape[axis]

                def lp_fn(t, x, y, point_noise):
                    padded, n_valid = pad_to_multiple(t, n_dev)
                    if point_noise is None:
                        out = jax.shard_map(
                            lambda tt, xx, yy: log_post(tt, xx, yy, None),
                            mesh=mesh, in_specs=(P(axis), P(), P()),
                            out_specs=P(axis))(padded, x, y)
                    else:
                        out = jax.shard_map(
                            log_post, mesh=mesh,
                            in_specs=(P(axis), P(), P(), P()),
                            out_specs=P(axis))(padded, x, y, point_noise)
                    return out[:n_valid]

            def chain(key, p0, x, y, point_noise, num_steps,
                      gate_tol=None):
                if gate_tol is None:
                    pos, lp = run_ensemble_mcmc(
                        key, lambda t: lp_fn(t, x, y, point_noise), p0,
                        num_steps)
                    return pos, lp, jnp.asarray(num_steps, jnp.int32)
                return run_ensemble_mcmc_gated(
                    key, lambda t: lp_fn(t, x, y, point_noise), p0,
                    num_steps, rel_tol=gate_tol)

            self._chain_fn_cache = jax.jit(
                chain, static_argnames=("num_steps", "gate_tol"))
        return self._chain_fn_cache

    def compute_log_likelihood(self, theta) -> jax.Array:
        """Log posterior at one log-hyperparameter vector (API parity)."""
        return self._make_log_posterior()(
            jnp.atleast_2d(jnp.asarray(theta)))[0]

    # -- training ---------------------------------------------------------
    def train(self, do_optimize: bool = True) -> None:
        self._refresh_value_affine()
        if do_optimize:
            chain = self._chain_fn()
            x, y, point_noise = self._padded_data()
            self._key, k_init, k_burn, k_chain, k_pick = \
                jax.random.split(self._key, 5)
            if not self.burned:
                p0 = self.prior.sample_from_prior(k_init, self.n_hypers)
                p0 = jnp.clip(p0, -LOG_BOUND + 1e-3, LOG_BOUND - 1e-3)
                p0, _, _ = chain(k_burn, p0, x, y, point_noise,
                                 num_steps=self.burnin_steps)
                self.p0 = p0
                self.burned = True
            pos, _, steps = chain(k_chain, self.p0, x, y, point_noise,
                                  num_steps=self.chain_length,
                                  gate_tol=self.chain_gate_tol)
            self.last_chain_steps = int(steps)
            self.p0 = pos
            pick = jax.random.randint(k_pick, (self.n_hypers,), 0,
                                      self.n_hypers)
            self.hypers = np.asarray(pos)[np.asarray(pick)]
        self._finalize_models()

    def optimize(self, num_restarts: int = 1) -> None:
        """MAP alternative to train() (log_likelihood_mcmc.py:241).

        On-device multistart damped Newton on the log posterior — the
        reference's MultistartNewtonHyperparameterOptimization shape
        (gpp_model_selection.hpp) as one jitted program, replacing the
        earlier scipy L-BFGS-B loop that crossed the host per
        objective/gradient call.
        """
        from cornell_moe_tpu.ops import optimizers as opt_mod
        from cornell_moe_tpu.ops.domains import TensorProductDomain

        self._refresh_value_affine()
        x, y, point_noise = self._padded_data()
        lp = self._log_posterior_with_data(force_xla=True)
        dtype = x.dtype
        n_dims = self.prior.n_dims
        dom = TensorProductDomain(bounds=jnp.tile(
            jnp.asarray([[-LOG_BOUND + 1e-3, LOG_BOUND - 1e-3]], dtype),
            (n_dims, 1)))
        nparams = opt_mod.NewtonParameters(
            num_multistarts=max(num_restarts, 1), max_num_steps=40,
            gamma=1.05, time_factor=1e-2, max_relative_change=1.0)

        self._key, k = jax.random.split(self._key)
        starts = jnp.clip(
            self.prior.sample_from_prior(k, max(num_restarts, 1)),
            -LOG_BOUND + 1e-3, LOG_BOUND - 1e-3).astype(dtype)

        def run(starts, x, y, point_noise):
            def vg(t):
                return jax.value_and_grad(
                    lambda tt: lp(tt[None], x, y, point_noise)[0])(t)

            finals = jax.vmap(lambda t0: opt_mod.newton_optimize(
                vg, dom, t0, nparams))(starts)
            vals = jax.vmap(lambda t: vg(t)[0])(finals)
            return finals, vals

        finals, vals = jax.jit(run)(starts, x, y, point_noise)
        safe = jnp.where(jnp.isfinite(vals), vals, -jnp.inf)
        pick = int(jnp.argmax(safe))
        # fall back to the best start if Newton diverged everywhere
        if not bool(jnp.isfinite(vals[pick])):
            finals, pick = starts, 0
        self.hypers = np.asarray(finals)[pick][None, :]
        self._finalize_models()

    def _finalize_models(self) -> None:
        if getattr(self, "hypers", None) is None:
            raise RuntimeError(
                "no hyperparameter samples available: call train() or "
                "optimize() with do_optimize=True first")
        num_noise = 1 + len(self._derivatives)
        samples = np.asarray(self.hypers)
        keep = ~np.any((samples < -LOG_BOUND) | (samples > LOG_BOUND),
                       axis=1)
        samples = samples[keep] if keep.any() else samples
        lin = np.exp(samples)
        cov_hypers = lin[:, :self.dim + 1]
        if self.noisy:
            noises = lin[:, self.dim + 1:]
        else:
            noises = np.full((lin.shape[0], num_noise), NOISELESS_VALUE)
        values = self._scaled_values()
        models = fit_gp_ensemble(
            self.kernel_name, jnp.asarray(cov_hypers),
            jnp.asarray(noises), self._data.points_sampled,
            values, self._derivatives,
            bucket=self.bucket)
        # f32 robustness: on raw-scale (unstandardized) objectives the
        # chain legitimately visits large amplitudes (K diagonal ~1e4+),
        # where the noiseless 1e-8 nugget is ~1e-12 RELATIVE and the
        # single-precision Cholesky goes non-finite.  One such member
        # poisons every ensemble-averaged quantity downstream (KG values,
        # posterior-mean argmin), so replace failed members with surviving
        # walkers (round-robin) and refit — the failed fit carries no
        # usable information.  Exactly zero members are affected in f64
        # (the parity suite) or on standardized data (the bench).
        bad = np.asarray(jax.vmap(
            lambda s: ~jnp.all(jnp.isfinite(s.chol_K)))(models))
        if bad.any():
            if bad.all():
                raise FloatingPointError(
                    "every ensemble member's covariance factorization is "
                    "non-finite; the objective's value scale likely "
                    "exceeds single-precision range — pass "
                    "standardize=True (model/driver option) or "
                    "standardize the observed values yourself")
            good = np.where(~bad)[0]
            repl = good[np.arange(int(bad.sum())) % len(good)]
            logging.getLogger("cornell_moe_tpu").warning(
                "replacing %d/%d non-finite ensemble member fits with "
                "surviving walkers", int(bad.sum()), len(bad))
            cov_hypers = np.array(cov_hypers)
            noises = np.array(noises)
            cov_hypers[bad] = cov_hypers[repl]
            noises[bad] = noises[repl]
            models = fit_gp_ensemble(
                self.kernel_name, jnp.asarray(cov_hypers),
                jnp.asarray(noises), self._data.points_sampled,
                values, self._derivatives,
                bucket=self.bucket)
        self._hypers, self._noises = cov_hypers, noises
        self._models = models

    # -- accessors (reference API parity) ---------------------------------
    @property
    def models(self) -> gp_mod.GaussianProcessState:
        """Stacked GP ensemble state (leading axis = MCMC sample)."""
        if self._models is None:
            raise RuntimeError("call train() first")
        return self._models

    @property
    def is_trained(self) -> bool:
        return self._models is not None

    @property
    def derivatives(self):
        return self._derivatives

    @property
    def num_mcmc(self) -> int:
        return 0 if self._models is None else ensemble_size(self._models)

    def add_sampled_points(self, sampled_points) -> None:
        """Append observations and refresh the ensemble lazily on next
        train(); mirrors log_likelihood_mcmc.py:add_sampled_points."""
        self._data.append_sample_points(sampled_points)
        if self._models is not None:
            self._refresh_value_affine()
            self._models = fit_gp_ensemble(
                self.kernel_name, jnp.asarray(self._hypers),
                jnp.asarray(self._noises), self._data.points_sampled,
                self._scaled_values(), self._derivatives,
                bucket=self.bucket)
