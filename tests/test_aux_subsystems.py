"""Auxiliary subsystems: checkpoint/resume, logging, real functions."""

import logging

import jax
import numpy as np
import pytest

from cornell_moe_tpu.models import mcmc as mcmc_mod
from cornell_moe_tpu.utils import checkpoint, logging_utils
from cornell_moe_tpu.utils.data_containers import HistoricalData
from cornell_moe_tpu.utils.real_functions import CIFAR10, KISSGP


def _data(rng, n=10):
    data = HistoricalData(dim=1)
    x = np.sort(rng.random(n) * 4 - 2)[:, None]
    data.append_historical_data(x, np.sin(2 * x[:, 0]))
    return data


def test_checkpoint_roundtrip(tmp_path, rng):
    data = _data(rng)
    path = str(tmp_path / "run.ckpt")
    checkpoint.save_checkpoint(path, data, rng_key=jax.random.PRNGKey(3),
                               metadata={"iteration": 7, "method": "KG"})
    data2, manifest, arrays = checkpoint.load_checkpoint(path)
    assert manifest["metadata"]["iteration"] == 7
    np.testing.assert_allclose(data2.points_sampled, data.points_sampled)
    np.testing.assert_allclose(data2.points_sampled_value,
                               data.points_sampled_value)
    np.testing.assert_array_equal(arrays["rng_key"],
                                  np.asarray(jax.random.PRNGKey(3)))


def test_checkpoint_resumes_mcmc_without_burnin(tmp_path, rng):
    data = _data(rng)
    model = mcmc_mod.GaussianProcessLogLikelihoodMCMC(
        data, chain_length=25, burnin_steps=25, n_hypers=8, noisy=False,
        rng_key=jax.random.PRNGKey(0))
    model.train()
    path = str(tmp_path / "mcmc.ckpt")
    checkpoint.save_checkpoint(path, data, mcmc_model=model)

    restored, manifest = checkpoint.restore_mcmc_model(path)
    assert restored.burned            # burn-in not repeated
    assert restored.is_trained        # models rebuilt from saved hypers
    assert mcmc_mod.ensemble_size(restored.models) == \
        mcmc_mod.ensemble_size(model.models)
    np.testing.assert_allclose(np.asarray(restored.p0),
                               np.asarray(model.p0))
    # continuing the chain works
    restored.train()
    assert restored.is_trained


def test_checkpoint_rejects_newer_format(tmp_path, rng):
    data = _data(rng)
    path = str(tmp_path / "v.ckpt")
    checkpoint.save_checkpoint(path, data)
    # tamper the version
    import json
    d, manifest, arrays = checkpoint.load_checkpoint(path)
    manifest["format_version"] = 99
    arrays["manifest"] = np.frombuffer(
        json.dumps(manifest).encode(), dtype=np.uint8)
    np.savez_compressed(path + ".tmp.npz", **arrays)
    import os
    os.replace(path + ".tmp.npz", path)
    with pytest.raises(ValueError, match="newer"):
        checkpoint.load_checkpoint(path)


def test_phase_timer_and_logging(tmp_path, caplog):
    logging_utils.configure_logging(verbose=True)
    timer = logging_utils.PhaseTimer()
    with caplog.at_level(logging.INFO, logger=logging_utils.LOGGER_NAME):
        with timer.phase("suggest", method="KG"):
            pass
        with timer.phase("suggest", method="KG"):
            pass
        with timer.phase("train"):
            pass
    s = timer.summary()
    assert s["suggest"]["count"] == 2
    assert "train" in s
    out = tmp_path / "timings.json"
    timer.dump(str(out))
    assert out.exists()
    assert any("suggest took" in r.message for r in caplog.records)


@pytest.mark.slow
def test_cifar10_synthetic_objective():
    f = CIFAR10(epochs=1, subset=300)
    assert f._dim == 5
    x = np.array([-3.0, 64.0, 5.0, 5.0, 5.0])
    out = f.evaluate(x)
    assert out.shape == (6,)
    err = out[0]
    assert 0.0 <= err <= 1.0
    # a absurd learning rate should do no better than a sane one
    x_bad = np.array([0.0, 64.0, 5.0, 5.0, 5.0])   # lr = 1.0
    err_bad = f.evaluate(x_bad)[0]
    assert err_bad >= err - 0.25


def test_kissgp_native_objective():
    """Native SKI marginal likelihood: finite, FD-consistent gradient
    channels, minimized near the generating hyperparameters."""
    f = KISSGP(n_data=300, grid_size=60)
    at_truth = f.evaluate(np.log(np.array([0.5, 1.0, 0.1])))
    elsewhere = f.evaluate(np.array([2.0, 1.0, -1.0]))
    assert at_truth.shape == (4,)          # value + 3 gradient channels
    assert np.all(np.isfinite(at_truth))
    assert at_truth[0] < elsewhere[0]
    x0 = np.array([0.3, 0.2, -0.5])
    eps = 1e-5
    g = f.evaluate(x0)[1]
    up = f.evaluate(x0 + [eps, 0, 0])[0]
    dn = f.evaluate(x0 - [eps, 0, 0])[0]
    np.testing.assert_allclose(g, (up - dn) / (2 * eps), rtol=1e-4)
    # octave path still gated
    with pytest.raises((RuntimeError, ImportError)):
        KISSGP(use_octave=True).evaluate(np.zeros(3))


@pytest.mark.slow
def test_bayes_opt_checkpoint_resume(tmp_path):
    from cornell_moe_tpu import bayes_opt
    from cornell_moe_tpu.ops import optimizers
    from cornell_moe_tpu.utils import synthetic_functions as sf

    fast = optimizers.GradientDescentParameters(
        num_multistarts=3, max_num_steps=6, max_num_restarts=1,
        num_steps_averaged=2, gamma=0.7, pre_mult=1.0,
        max_relative_change=0.5)
    path = str(tmp_path / "bo.ckpt")
    bo = bayes_opt.BayesianOptimizer(
        objective_func=sf.Branin(), method="EI", num_to_sample=1,
        num_mc=16, n_hypers=8, chain_length=20, burnin_steps=20,
        noisy=False, sgd_params=fast, verbose=False,
        checkpoint_path=path)
    bo.run(num_iterations=1)
    assert bo.model._data.num_sampled == 4

    # a fresh driver resumes from the checkpoint without re-initializing
    bo2 = bayes_opt.BayesianOptimizer(
        objective_func=sf.Branin(), method="EI", num_to_sample=1,
        num_mc=16, n_hypers=8, chain_length=20, burnin_steps=20,
        noisy=False, sgd_params=fast, verbose=False,
        checkpoint_path=path)
    meta = bo2.resume()
    assert meta["iteration"] == 0
    assert bo2.model._data.num_sampled == 4
    bo2.run(num_iterations=2, start_iteration=meta["iteration"] + 1)
    assert bo2.model._data.num_sampled == 5
    assert "suggest" in bo2.timer.summary()


@pytest.mark.slow
def test_checkpoint_restores_derivatives_and_bucket(tmp_path, rng):
    """d-KG checkpoints must round-trip derivative channels + bucket."""
    n, dim = 6, 2
    data = HistoricalData(dim=dim, num_derivatives=dim)
    x = rng.random((n, dim))
    y = np.stack([np.sin(x[:, 0]), np.cos(x[:, 0]), -np.sin(x[:, 1])],
                 axis=1)
    data.append_historical_data(x, y)
    model = mcmc_mod.GaussianProcessLogLikelihoodMCMC(
        data, derivatives=(0, 1), chain_length=10, burnin_steps=10,
        n_hypers=8, noisy=False, rng_key=jax.random.PRNGKey(0), bucket=4)
    model.train()
    path = str(tmp_path / "dkg.ckpt")
    checkpoint.save_checkpoint(path, data, mcmc_model=model)

    restored, manifest = checkpoint.restore_mcmc_model(path)
    assert restored.derivatives == (0, 1)
    assert restored.bucket == 4
    assert restored.is_trained
    # resumed training continues with the saved walker dimensionality
    restored.train()
    assert restored.is_trained


def test_checkpoint_restore_returns_rng_key(tmp_path, rng):
    data = _data(rng)
    model = mcmc_mod.GaussianProcessLogLikelihoodMCMC(
        data, chain_length=10, burnin_steps=10, n_hypers=8, noisy=False,
        rng_key=jax.random.PRNGKey(0))
    model.train()
    path = str(tmp_path / "key.ckpt")
    checkpoint.save_checkpoint(path, data, mcmc_model=model,
                               rng_key=jax.random.PRNGKey(11))
    _, _, arrays = checkpoint.restore_mcmc_model(path, return_arrays=True)
    np.testing.assert_array_equal(arrays["rng_key"],
                                  np.asarray(jax.random.PRNGKey(11)))


@pytest.mark.slow
def test_bayes_opt_kg_campaign_checkpoint_resume(tmp_path):
    """Resume path of the real-function campaign configuration
    (examples/run_cifar10_campaign.py): KG method, q>1, noisy
    observations.  Uses a fast stand-in objective with the CIFAR10 domain
    shape so the test stays CPU-cheap."""
    from cornell_moe_tpu import bayes_opt
    from cornell_moe_tpu.ops import optimizers

    class FastDim5:
        _dim = 5
        _search_domain = np.array(
            [[-6.0, 0.0], [32.0, 512.0], [5.0, 9.0], [5.0, 9.0],
             [5.0, 9.0]])
        _num_init_pts = 3
        _sample_var = 1e-4
        _min_value = 0.0
        _observations = []
        _num_fidelity = 0

        def evaluate_true(self, x):
            z = (np.asarray(x) - self._search_domain[:, 0]) / \
                (self._search_domain[:, 1] - self._search_domain[:, 0])
            return np.array([float(np.sum((z - 0.4) ** 2))])

        def evaluate(self, x):
            return self.evaluate_true(x) + 1e-2 * np.random.default_rng(
                0).standard_normal(1)

    fast = optimizers.GradientDescentParameters(
        num_multistarts=2, max_num_steps=3, max_num_restarts=1,
        num_steps_averaged=2, gamma=0.7, pre_mult=1.0,
        max_relative_change=0.5)
    inner = optimizers.GradientDescentParameters(
        num_multistarts=1, max_num_steps=2, max_num_restarts=1,
        num_steps_averaged=2, gamma=0.0, pre_mult=1.0,
        max_relative_change=0.1)
    path = str(tmp_path / "campaign.ckpt")
    kwargs = dict(method="KG", num_to_sample=2, num_mc=8, n_hypers=6,
                  chain_length=10, burnin_steps=10, noisy=True,
                  sgd_params=fast, inner_sgd_params=inner, verbose=False,
                  checkpoint_path=path, shape_bucket=8)
    bo = bayes_opt.BayesianOptimizer(objective_func=FastDim5(), **kwargs)
    bo.run(num_iterations=1)
    n_after_1 = bo.model._data.num_sampled
    assert n_after_1 == 3 + 2

    bo2 = bayes_opt.BayesianOptimizer(objective_func=FastDim5(), **kwargs)
    meta = bo2.resume()
    assert meta["iteration"] == 0
    assert bo2.model._data.num_sampled == n_after_1
    # resumed walkers must not repeat burn-in
    assert bo2.model.burned
    bo2.run(num_iterations=2, start_iteration=meta["iteration"] + 1)
    assert bo2.model._data.num_sampled == n_after_1 + 2
