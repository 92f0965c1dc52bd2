"""Checkpoint / resume for Bayesian-optimization runs.

The reference has no checkpointing in the MOE core (state lives in
in-memory HistoricalData; PES writes Xsamples.txt/Ysamples.txt/guesses.txt
per iteration, SURVEY.md section 5).  Here every experiment is resumable:
HistoricalData, the MCMC walker state (so burn-in is never repeated), the
driver's PRNG key, and run metadata serialize to one .npz + manifest.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

FORMAT_VERSION = 1


def save_checkpoint(path: str, historical_data, mcmc_model=None,
                    rng_key=None, metadata: Optional[dict] = None) -> None:
    """Write a resumable checkpoint (atomic: tmp file + rename)."""
    arrays = {
        "points_sampled": historical_data.points_sampled,
        "points_sampled_value": historical_data.points_sampled_value,
        "points_sampled_noise_variance":
            historical_data.points_sampled_noise_variance,
    }
    manifest = {
        "format_version": FORMAT_VERSION,
        "dim": historical_data.dim,
        "num_derivatives": historical_data.num_derivatives,
        "metadata": metadata or {},
    }
    if mcmc_model is not None:
        manifest["mcmc"] = {
            "burned": mcmc_model.burned,
            "n_hypers": mcmc_model.n_hypers,
            "chain_length": mcmc_model.chain_length,
            "burnin_steps": mcmc_model.burnin_steps,
            "noisy": mcmc_model.noisy,
            "kernel_name": mcmc_model.kernel_name,
            "derivatives": list(mcmc_model.derivatives),
            "bucket": mcmc_model.bucket,
            "standardize": bool(getattr(mcmc_model, "standardize",
                                        False)),
            "chain_gate_tol": getattr(mcmc_model, "chain_gate_tol",
                                      None),
        }
        if mcmc_model.p0 is not None:
            arrays["mcmc_walker_positions"] = np.asarray(mcmc_model.p0)
        if getattr(mcmc_model, "hypers", None) is not None:
            arrays["mcmc_hypers"] = np.asarray(mcmc_model.hypers)
        arrays["mcmc_key"] = np.asarray(mcmc_model._key)
    if rng_key is not None:
        arrays["rng_key"] = np.asarray(rng_key)
    arrays["manifest"] = np.frombuffer(
        json.dumps(manifest).encode(), dtype=np.uint8)

    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp, path)


def load_checkpoint(path: str):
    """Read a checkpoint -> (HistoricalData, manifest dict, arrays dict)."""
    from cornell_moe_tpu.utils.data_containers import HistoricalData

    with np.load(path, allow_pickle=False) as z:
        arrays = {k: z[k] for k in z.files}
    manifest = json.loads(bytes(arrays.pop("manifest")).decode())
    if manifest["format_version"] > FORMAT_VERSION:
        raise ValueError(
            f"checkpoint format {manifest['format_version']} is newer "
            f"than supported ({FORMAT_VERSION})")
    data = HistoricalData(manifest["dim"], manifest["num_derivatives"])
    data.append_historical_data(
        arrays["points_sampled"], arrays["points_sampled_value"],
        arrays["points_sampled_noise_variance"])
    return data, manifest, arrays


def restore_mcmc_model(path: str, prior=None, rng_key=None,
                       return_arrays: bool = False):
    """Rebuild a GaussianProcessLogLikelihoodMCMC from a checkpoint.

    The walker positions resume the chain where it left off: a restored
    model skips burn-in on its next train() call.  Derivative channels and
    the shape bucket are restored from the manifest so a resumed d-KG run
    refits with identical value-channel shapes and compiled programs.
    With ``return_arrays`` the raw checkpoint arrays (incl. the driver
    ``rng_key``) are returned as a third element.
    """
    import jax.numpy as jnp

    from cornell_moe_tpu.models.mcmc import GaussianProcessLogLikelihoodMCMC

    data, manifest, arrays = load_checkpoint(path)
    cfg = manifest.get("mcmc")
    if cfg is None:
        raise ValueError(f"{path} holds no MCMC state")
    model = GaussianProcessLogLikelihoodMCMC(
        data, derivatives=tuple(cfg.get("derivatives", ())),
        prior=prior, chain_length=cfg["chain_length"],
        burnin_steps=cfg["burnin_steps"], n_hypers=cfg["n_hypers"],
        noisy=cfg["noisy"], kernel_name=cfg["kernel_name"],
        rng_key=rng_key if rng_key is not None else
        jnp.asarray(arrays["mcmc_key"]),
        bucket=int(cfg.get("bucket", 0)),
        standardize=bool(cfg.get("standardize", False)),
        chain_gate_tol=cfg.get("chain_gate_tol"))
    model.burned = cfg["burned"]
    if "mcmc_walker_positions" in arrays:
        model.p0 = jnp.asarray(arrays["mcmc_walker_positions"])
    if "mcmc_hypers" in arrays:
        model.hypers = np.asarray(arrays["mcmc_hypers"])
        model._finalize_models()
    if return_arrays:
        return model, manifest, arrays
    return model, manifest
