"""High-level Bayesian-optimization driver.

Counterpart of ``examples/bayesian_optimization.py`` + ``examples/main.py``
in the reference: MCMC train -> (q-KG | q-EI) suggest -> evaluate ->
retrain -> recommend (argmin posterior mean), with the reference's KG
discretization-seeding protocol (qEI picks + per-model posterior-mean
argmin, examples/main.py:170-200) and continuous-fidelity capital
accounting.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cornell_moe_tpu.acquisition import expected_improvement as ei_mod
from cornell_moe_tpu.acquisition import knowledge_gradient as kg_mod
from cornell_moe_tpu.models import mcmc as mcmc_mod
from cornell_moe_tpu.ops import optimizers
from cornell_moe_tpu.ops.domains import TensorProductDomain
from cornell_moe_tpu.utils.data_containers import (HistoricalData,
                                                   SamplePoint)

# The reference driver's optimizer parameter packs (examples/main.py:117-140)
DEFAULT_SGD_PARAMS_KG = optimizers.GradientDescentParameters(
    num_multistarts=200, max_num_steps=50, max_num_restarts=2,
    num_steps_averaged=4, gamma=0.7, pre_mult=1.0,
    max_relative_change=0.5, tolerance=1.0e-10)
DEFAULT_SGD_PARAMS_PS = optimizers.GradientDescentParameters(
    num_multistarts=1, max_num_steps=6, max_num_restarts=1,
    num_steps_averaged=3, gamma=0.0, pre_mult=1.0,
    max_relative_change=0.1, tolerance=1.0e-10)
DEFAULT_SGD_PARAMS_RECOMMEND = optimizers.GradientDescentParameters(
    # The reference passes max_num_restarts=3 here (examples/main.py:115)
    # but its pure-Python GD never implements restarts (or tolerance):
    # python_version/optimization.py:502,526 are TODO(GH-59), so exactly
    # ONE 1000-step trajectory runs.  max_num_restarts=1 is the parity
    # setting; 3 would do 3x the reference's recommend work.
    num_multistarts=1, max_num_steps=1000, max_num_restarts=1,
    num_steps_averaged=15, gamma=0.7, pre_mult=1.0,
    max_relative_change=0.02, tolerance=1.0e-10)


def _qei_suggest_arrays(key, state, domain, params, num_to_sample,
                        num_mc, conv_tol=None, chunk_size=None,
                        mesh=None, mesh_axis="restarts"):
    """Jit-safe body of :func:`gen_sample_from_qei` (array outputs)."""
    pts = ei_mod.multistart_expected_improvement_optimization(
        key, state, domain, num_to_sample, params,
        num_mc_iterations=num_mc, conv_tol=conv_tol,
        chunk_size=chunk_size, mesh=mesh, mesh_axis=mesh_axis)
    key_eval = jax.random.fold_in(key, 1)
    voi = ei_mod.evaluate_expected_improvement_at_point_list(
        state, pts[None], key=key_eval, num_mc_iterations=num_mc)[0]
    return pts, voi


def gen_sample_from_qei(key, state, domain, params, num_to_sample,
                        num_mc=2**10):
    """q-EI suggestion from a single GP (bayesian_optimization.py:13)."""
    pts, voi = _qei_suggest_arrays(key, state, domain, params,
                                   num_to_sample, num_mc)
    return pts, float(voi)


def _qei_mcmc_suggest_arrays(key, states, domain, params, num_to_sample,
                             num_mc):
    """Jit-safe body of :func:`gen_sample_from_qei_mcmc`."""
    pts = ei_mod.multistart_expected_improvement_mcmc_optimization(
        key, states, domain, num_to_sample, params,
        num_mc_iterations=num_mc)
    normals = ei_mod.draw_normals(jax.random.fold_in(key, 1), num_mc,
                                  num_to_sample,
                                  dtype=states.points_sampled.dtype)
    voi = ei_mod.monte_carlo_expected_improvement_mcmc(
        states, pts, None, jax.vmap(
            lambda s: s.best_observed_value)(states), normals)
    return pts, voi


def gen_sample_from_qei_mcmc(key, states, domain, params, num_to_sample,
                             num_mc=2**10):
    """Ensemble-averaged q-EI suggestion (bayesian_optimization.py:37)."""
    pts, voi = _qei_mcmc_suggest_arrays(key, states, domain, params,
                                        num_to_sample, num_mc)
    return pts, float(voi)


def seed_kg_discretization(key, states, domain,
                           qei_params=None, ps_params=DEFAULT_SGD_PARAMS_PS,
                           num_qei_pts: int = 10, num_eval_pts: int = 1000,
                           num_fidelity: int = 0, num_mc=2**10,
                           conv_tol=None, chunk_size=None, mesh=None,
                           mesh_axis: str = "restarts"):
    """Build per-model inner-optimization seeds for KG.

    Mirrors examples/main.py:170-200: 10 points from ensemble q-EI, plus
    each model's posterior-mean argmin (uniform eval points + sampled
    points, GD-polished).  Returns (S, num_qei_pts + 1, dim_opt).

    ``conv_tol``: optional chunk-wide step-norm gate on the q-EI GD (the
    dominant seeding cost at transcript shapes) — effective because the
    seeding runs the lockstep-batched multistart since round 4; see
    multistart_expected_improvement_mcmc_optimization.

    ``mesh``: optional device mesh sharding the q-EI restart axis.
    """
    if qei_params is None:
        qei_params = DEFAULT_SGD_PARAMS_KG
    k_ei, k_eval = jax.random.split(key)
    discrete = ei_mod.multistart_expected_improvement_mcmc_optimization(
        k_ei, states, domain, num_qei_pts, qei_params,
        num_mc_iterations=num_mc, conv_tol=conv_tol,
        chunk_size=chunk_size, mesh=mesh, mesh_axis=mesh_axis)
    dim = states.points_sampled.shape[-1]
    dim_opt = dim - num_fidelity
    inner_domain = TensorProductDomain(bounds=domain.bounds[:dim_opt])
    eval_pts = inner_domain.generate_uniform_random_points_in_domain(
        k_eval, num_eval_pts)

    def per_model(s):
        guesses = jnp.concatenate(
            [eval_pts, s.points_sampled[:, :dim_opt]], axis=0)
        pt, _ = kg_mod.compute_optimal_posterior_mean(
            s, inner_domain, guesses, ps_params, num_fidelity)
        return jnp.concatenate([discrete[:, :dim_opt], pt[None]], axis=0)

    return jax.vmap(per_model)(states)


def best_so_far_from_discretization(states, discrete_pts,
                                    num_fidelity: int = 0):
    """Per-model min posterior mean over its discretization
    (cpp_wrappers/knowledge_gradient_mcmc.py:387-393)."""
    def per_model(s, pts):
        mus = jax.vmap(lambda p: -kg_mod.posterior_mean_objective(
            s, p, num_fidelity))(pts)
        return jnp.min(mus)
    return jax.vmap(per_model)(states, discrete_pts)


def _qkg_suggest_arrays(key, states, domain, discrete_pts, params,
                        inner_params, num_to_sample, num_mc,
                        num_fidelity, conv_tol=None,
                        derivatives_to_sample=(), chunk_size=None,
                        mesh=None, mesh_axis="restarts"):
    """Jit-safe body of :func:`gen_sample_from_qkg_mcmc`.

    ``derivatives_to_sample``: fantasy observations at the suggested
    points include these derivative channels — the reference's d-KG
    passes the GP's derivative list into the KG state
    (gpp_python_knowledge_gradient_mcmc.cpp:120).
    """
    ds = tuple(int(i) for i in derivatives_to_sample)
    best_so_far = best_so_far_from_discretization(states, discrete_pts,
                                                  num_fidelity)
    pts = kg_mod.multistart_knowledge_gradient_mcmc_optimization(
        key, states, domain, num_to_sample, params, inner_params,
        discrete_pts, best_so_far=best_so_far,
        num_mc_iterations=num_mc, num_fidelity=num_fidelity,
        derivatives_to_sample=ds, conv_tol=conv_tol,
        chunk_size=chunk_size, mesh=mesh, mesh_axis=mesh_axis)
    normals = ei_mod.draw_antithetic_normals(
        jax.random.fold_in(key, 1), num_mc,
        num_to_sample * (1 + len(ds)),
        dtype=states.points_sampled.dtype)
    dim_opt = states.points_sampled.shape[-1] - num_fidelity
    inner_domain = TensorProductDomain(bounds=domain.bounds[:dim_opt])
    voi = kg_mod.knowledge_gradient_mcmc(
        states, pts, discrete_pts, normals, inner_domain, inner_params,
        best_so_far, num_to_sample, num_fidelity,
        derivatives_to_sample=ds)
    return pts, voi


def gen_sample_from_qkg_mcmc(key, states, domain, discrete_pts,
                             params=None, inner_params=DEFAULT_SGD_PARAMS_PS,
                             num_to_sample: int = 1, num_mc=2**7,
                             num_fidelity: int = 0):
    """Ensemble-averaged q-KG suggestion (bayesian_optimization.py:60)."""
    if params is None:
        params = DEFAULT_SGD_PARAMS_KG
    pts, voi = _qkg_suggest_arrays(key, states, domain, discrete_pts,
                                   params, inner_params, num_to_sample,
                                   num_mc, num_fidelity)
    return pts, float(voi)


@dataclass
class BayesianOptimizer:
    """The full suggest/observe/recommend loop (examples/main.py driver).

    ``method`` is 'KG' or 'EI'.  All heavy steps are jitted device
    programs; this class only sequences them and owns the HistoricalData.
    """

    objective_func: object = None
    method: str = "KG"
    num_to_sample: int = 1
    num_mc: Optional[int] = None
    n_hypers: int = 16
    chain_length: int = 1000
    burnin_steps: int = 2000
    noisy: bool = False
    kernel_name: str = "matern_2.5"
    sgd_params: optimizers.GradientDescentParameters = \
        DEFAULT_SGD_PARAMS_KG
    inner_sgd_params: optimizers.GradientDescentParameters = \
        DEFAULT_SGD_PARAMS_PS
    seed: int = 0
    verbose: bool = True
    checkpoint_path: Optional[str] = None
    # pad num_sampled to multiples of this so retraining and suggesting
    # reuse compiled programs across iterations (0 = off)
    shape_bucket: int = 16
    # convergence gate for the warm KG outer GD (step-norm early exit
    # per chunk, gpp_optimization.hpp:667-671 semantics); None = the
    # fixed-depth schedule.  The default 3e-3 keeps the reference's
    # full 2x50 outer schedule as the CAP and exits each chunk at its
    # measured convergence: same suggested points as ungated on the
    # 500-obs bench sweep (benchmarks/SWEEP_r03.md) and an
    # equal-quality Branin transcript (docs/branin_transcript.md)
    suggest_conv_tol: Optional[float] = 3e-3
    # convergence gate for the seeding q-EI GD (chunk-wide, batched path)
    seed_conv_tol: Optional[float] = 3e-3
    # convergence gate for the post-burn-in MCMC retrain chain:
    # chain_length stays the CAP and each retrain exits at measured
    # equilibration of the ensemble-mean log-posterior (see
    # models/mcmc.run_ensemble_mcmc_gated).  None = full fixed-length
    # chain (reference parity).  The default 1.0 stops when the
    # per-block drift falls below the ensemble-mean's own standard
    # error — sampler-statistics parity tests
    # (tests/test_likelihood_mcmc.py) and the r05 head-to-head evidence
    # (docs/retrain_gate_r05.md) back the default.
    chain_gate_tol: Optional[float] = 1.0
    # KG fantasy observations include the GP's derivative channels (the
    # reference's d-KG: gpp_python_knowledge_gradient_mcmc.cpp:120 passes
    # gaussian_process_mcmc.derivatives() into the KG state); set False
    # to fantasize value channels only on derivative-observation problems
    kg_sample_derivatives: bool = True
    # train the GP ensemble on (y - mean)/std of the observed values
    # (derivative channels scale by 1/std).  Off by default for parity
    # with the reference's raw-unit f64 driver; REQUIRED in practice for
    # f32 TPU runs on raw-scale objectives with derivative observations
    # (the 3-channel block system goes non-finite otherwise — see
    # models/mcmc.GaussianProcessLogLikelihoodMCMC).  Reported VOI is
    # scaled back to raw units; recommended points are unaffected
    # (argmin is affine-invariant).
    standardize: bool = False
    # -- multi-chip scale-out ---------------------------------------------
    # n_devices builds a restart-axis mesh over the first n JAX devices
    # (or pass an explicit jax.sharding.Mesh): the KG/q-EI multistarts,
    # the MCMC walker log-posteriors, and the recommend grid evaluation
    # all shard across it — the TPU-native counterpart of the OpenMP
    # threading inside the reference's production endpoints
    # (gpp_optimization.hpp:1452-1564).  suggest_chunk_size defaults to
    # the per-device shard so sharded == single-device given the same
    # chunking (tests/test_parallel.py, __graft_entry__.dryrun_multichip).
    mesh: Optional[object] = None
    n_devices: Optional[int] = None
    mesh_axis: str = "restarts"
    suggest_chunk_size: Optional[int] = None

    def __post_init__(self):
        from cornell_moe_tpu.config import enable_compilation_cache
        enable_compilation_cache()
        f = self.objective_func
        self.dim = f._dim
        self.num_fidelity = f._num_fidelity
        self.derivatives = tuple(f._observations)
        self.domain = TensorProductDomain.from_bounds(f._search_domain)
        self.num_mc = self.num_mc or (2**7 if self.method == "KG"
                                      else 2**10)
        if self.mesh is None and self.n_devices:
            from cornell_moe_tpu.parallel.sharding import default_mesh
            self.mesh = default_mesh(self.n_devices,
                                     axis_name=self.mesh_axis)
        if self.mesh is not None and self.suggest_chunk_size is None:
            n_dev = self.mesh.shape[self.mesh_axis]
            self.suggest_chunk_size = max(
                self.sgd_params.num_multistarts // n_dev, 1)
        self._key = jax.random.PRNGKey(self.seed)
        self.capital_so_far = 0.0
        self.history = []
        # cached jitted phase programs (suggest / recommend): one device
        # program per shape bucket, retraced automatically on bucket
        # crossings; keeps the steady-state loop recompile-free AND free
        # of per-op dispatch overhead (eager scans outside jit bake the
        # GP state in as constants and would recompile every iteration)
        self._programs = {}
        from cornell_moe_tpu.utils.logging_utils import PhaseTimer
        self.timer = PhaseTimer()

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _log(self, msg):
        if self.verbose:
            print(msg, flush=True)

    # -- phases -----------------------------------------------------------
    def initialize(self, num_init_pts: Optional[int] = None):
        f = self.objective_func
        n = num_init_pts or f._num_init_pts
        pts = np.asarray(
            self.domain.generate_latin_hypercube_points(self._next_key(),
                                                        n))
        data = HistoricalData(self.dim, len(self.derivatives))
        obs_idx = [0] + [1 + i for i in self.derivatives]
        for pt in pts:
            val = f.evaluate(pt)[obs_idx]
            data.append_sample_points(
                [SamplePoint(pt, val, f._sample_var)])
        self.model = mcmc_mod.GaussianProcessLogLikelihoodMCMC(
            data, derivatives=self.derivatives, chain_length=
            self.chain_length, burnin_steps=self.burnin_steps,
            n_hypers=self.n_hypers, noisy=self.noisy,
            kernel_name=self.kernel_name, rng_key=self._next_key(),
            bucket=self.shape_bucket, mesh=self.mesh,
            mesh_axis=self.mesh_axis, standardize=self.standardize,
            chain_gate_tol=self.chain_gate_tol)
        t0 = time.time()
        self.model.train()
        self._log(f"initial training took {time.time() - t0:.2f}s on "
                  f"{n} points")
        return data

    def _suggest_program(self):
        prog = self._programs.get("suggest")
        if prog is not None:
            return prog
        if self.method == "KG":
            ds = self.derivatives if self.kg_sample_derivatives else ()

            def run(k_seed, k_sugg, states):
                # the seeding q-EI runs the lockstep-batched multistart
                # (round 4) so the chunk-wide step-norm gate applies —
                # the vmapped per-start gate measured SLOWER than the
                # fixed scan (0.63 vs 0.57 s, round 3) because the
                # batched while_loop masked lanes until the slowest
                # start converged; the batched objective gates whole
                # chunks instead, same as the KG outer loop
                discrete = seed_kg_discretization(
                    k_seed, states, self.domain,
                    qei_params=self.sgd_params,
                    ps_params=self.inner_sgd_params,
                    num_fidelity=self.num_fidelity,
                    conv_tol=self.seed_conv_tol,
                    chunk_size=self.suggest_chunk_size,
                    mesh=self.mesh, mesh_axis=self.mesh_axis)
                return _qkg_suggest_arrays(
                    k_sugg, states, self.domain, discrete,
                    self.sgd_params, self.inner_sgd_params,
                    self.num_to_sample, self.num_mc, self.num_fidelity,
                    conv_tol=self.suggest_conv_tol,
                    derivatives_to_sample=ds,
                    chunk_size=self.suggest_chunk_size,
                    mesh=self.mesh, mesh_axis=self.mesh_axis)
        elif self.method == "EI":
            def run(k_sugg, states):
                # member 0 is reference parity (examples/main.py:208
                # optimizes EI on a single GP); since round 5 the
                # multistart runs the lockstep-batched path with the
                # chunk-wide step-norm gate and the restart axis sharded
                # over the mesh — the same treatment as KG suggest
                member = mcmc_mod.ensemble_member(states, 0)
                return _qei_suggest_arrays(
                    k_sugg, member, self.domain, self.sgd_params,
                    self.num_to_sample, self.num_mc,
                    conv_tol=self.suggest_conv_tol,
                    chunk_size=self.suggest_chunk_size,
                    mesh=self.mesh, mesh_axis=self.mesh_axis)
        else:
            raise ValueError(f"method {self.method} not supported")
        prog = jax.jit(run)
        self._programs["suggest"] = prog
        return prog

    def suggest(self):
        t0 = time.time()
        states = self.model.models
        prog = self._suggest_program()
        if self.method == "KG":
            pts, voi = prog(self._next_key(), self._next_key(), states)
        else:
            pts, voi = prog(self._next_key(), states)
        # VOI back to raw units (KG/EI are linear in the value scale)
        scale = getattr(self.model, "value_scale", 1.0)
        pts, voi = np.asarray(pts), float(voi) * scale
        self._log(f"{self.method} suggest took {time.time() - t0:.2f}s, "
                  f"VOI {voi:.6f}")
        return pts, voi

    def observe(self, points):
        f = self.objective_func
        obs_idx = [0] + [1 + i for i in self.derivatives]
        sampled = [SamplePoint(pt, f.evaluate(pt)[obs_idx],
                               f._sample_var) for pt in np.atleast_2d(points)]
        if self.num_fidelity > 0:
            capitals = np.prod(
                np.atleast_2d(points)[:, self.dim - self.num_fidelity:],
                axis=1)
            self.capital_so_far += float(np.max(capitals))
        t0 = time.time()
        self.model.add_sampled_points(sampled)
        self.model.train()
        self._log(f"retraining took {time.time() - t0:.2f}s")
        return sampled

    def _recommend_program(self, num_eval_pts: int):
        cache_key = ("recommend", num_eval_pts)
        prog = self._programs.get(cache_key)
        if prog is not None:
            return prog
        dim_opt = self.dim - self.num_fidelity
        inner_domain = TensorProductDomain(
            bounds=self.domain.bounds[:dim_opt])

        def run(key, states):
            eval_pts = \
                inner_domain.generate_uniform_random_points_in_domain(
                    key, num_eval_pts)
            # use the (bucket-padded) state points so the guess-set shape
            # is stable across iterations and this program compiles once
            sampled = states.points_sampled[0][:, :dim_opt]
            guesses = jnp.concatenate([eval_pts, sampled], axis=0)

            def ensemble_neg_mean(x):
                return jnp.mean(jax.vmap(
                    lambda s: kg_mod.posterior_mean_objective(
                        s, x, self.num_fidelity))(states))

            # non-finite guesses lose the argmax (NaN would otherwise
            # poison it and select an arbitrary grid point)
            if self.mesh is not None:
                from cornell_moe_tpu.parallel.sharding import \
                    sharded_point_evaluation
                vals = sharded_point_evaluation(
                    ensemble_neg_mean, guesses, self.mesh,
                    axis_name=self.mesh_axis)
            else:
                vals = jax.vmap(ensemble_neg_mean)(guesses)
            vals = jnp.where(jnp.isfinite(vals), vals, -jnp.inf)
            x0 = guesses[jnp.argmax(vals)]
            vg = jax.value_and_grad(ensemble_neg_mean)
            x = optimizers.gradient_ascent(vg, inner_domain, x0,
                                           DEFAULT_SGD_PARAMS_RECOMMEND)
            return jnp.where(ensemble_neg_mean(x) > vals.max(), x, x0)

        prog = jax.jit(run)
        self._programs[cache_key] = prog
        return prog

    def recommend(self, num_eval_pts: int = 10000):
        """Argmin of the ensemble posterior mean (examples/main.py:243)."""
        t0 = time.time()
        x = self._recommend_program(num_eval_pts)(
            self._next_key(), self.model.models)
        report = np.concatenate([np.asarray(x),
                                 np.ones(self.num_fidelity)])
        self._log(f"recommendation took {time.time() - t0:.2f}s")
        return report

    def save_checkpoint(self, iteration: int):
        if self.checkpoint_path is None:
            return
        from cornell_moe_tpu.utils import checkpoint as ckpt
        ckpt.save_checkpoint(
            self.checkpoint_path, self.model._data,
            mcmc_model=self.model, rng_key=self._key,
            metadata={"iteration": iteration, "method": self.method,
                      "capital": self.capital_so_far})

    def resume(self, path: Optional[str] = None):
        """Restore the model (data + walker state) from a checkpoint;
        returns the saved metadata (e.g. the last completed iteration)."""
        import jax.numpy as jnp

        from cornell_moe_tpu.utils import checkpoint as ckpt
        self.model, manifest, arrays = ckpt.restore_mcmc_model(
            path or self.checkpoint_path, return_arrays=True)
        # checkpoints don't persist the device mesh; re-attach this
        # driver's so resumed retrains shard the same way
        self.model.mesh = self.mesh
        self.model.mesh_axis = self.mesh_axis
        if "rng_key" in arrays:
            # restore the driver's random stream so a resumed run's
            # suggestions match an uninterrupted one
            self._key = jnp.asarray(arrays["rng_key"])
        self.capital_so_far = manifest["metadata"].get("capital", 0.0)
        return manifest["metadata"]

    # -- the full loop ----------------------------------------------------
    def run(self, num_iterations: int, num_init_pts: Optional[int] = None,
            start_iteration: int = 0):
        if start_iteration == 0:
            with self.timer.phase("initialize"):
                self.initialize(num_init_pts)
        for it in range(start_iteration, num_iterations):
            self._log(f"--- iteration {it} ({self.method}, "
                      f"q={self.num_to_sample}) ---")
            with self.timer.phase("suggest", method=self.method):
                pts, voi = self.suggest()
            with self.timer.phase("observe_retrain"):
                self.observe(pts)
            with self.timer.phase("recommend"):
                report = self.recommend()
            true_val = float(self.objective_func.evaluate_true(report)[0])
            self._log(f"recommended point {report}, true value "
                      f"{true_val:.6f}")
            self.history.append({
                "iteration": it, "voi": voi, "suggested": pts,
                "recommended": report, "true_value": true_val,
                "capital": self.capital_so_far})
            self.save_checkpoint(it)
        return self.history
