"""Lower-confidence-bound batch selection.

Counterpart of ``python/cpp_wrappers/lower_confidence_bound.py:17``:
greedy q-point selection over a candidate set — first point minimizes
mu - sigma; each subsequent point maximizes sigma among candidates whose
LCB is below min(mu + sigma), after conditioning on the previous pick with
a zero-value fantasy observation of noise 0.25 (pure exploration among
plausible minimizers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cornell_moe_tpu.models import gp as gp_mod
from cornell_moe_tpu.models.gp import GaussianProcessState

_FANTASY_NOISE = 0.25


def lower_confidence_bound_optimization(state: GaussianProcessState,
                                        candidate_pts, num_to_sample: int):
    """Pick q points from candidate_pts; returns ((q, dim), 0.0)."""
    cand = jnp.atleast_2d(jnp.asarray(candidate_pts))

    def stddev(s, pts):
        var = jax.vmap(
            lambda p: gp_mod.posterior_variance(s, p[None])[0, 0])(pts)
        return jnp.sqrt(jnp.maximum(var, 0.0))

    mu = gp_mod.posterior_mean(state, cand)[:, 0]
    sd = stddev(state, cand)
    lcb = mu - sd
    first = jnp.argmin(lcb)

    upper_bound = jnp.min(mu + sd)
    plausible = lcb <= upper_bound

    picks = [cand[first]]
    s = state
    for _ in range(1, num_to_sample):
        fantasy_value = jnp.zeros((1, 1 + s.num_derivatives),
                                  cand.dtype)
        s = gp_mod.add_sampled_points(
            s.replace(noise_variance=s.noise_variance), picks[-1][None],
            fantasy_value, jitter=_FANTASY_NOISE, update_mean=False)
        sd_new = stddev(s, cand)
        masked = jnp.where(plausible, sd_new, -jnp.inf)
        picks.append(cand[jnp.argmax(masked)])
    return jnp.stack(picks), 0.0
