"""Multi-chip scale-out via jax.sharding + shard_map.

The reference's only compute parallelism is OpenMP threads over multistart
restarts (gpp_optimization.hpp:1452-1564) with per-thread RNG/state.  The
TPU-native equivalents implemented here (SURVEY.md section 2.8):

  * multistart restarts        -> sharded batch axis over the device mesh
  * MC fantasy draws           -> vmapped (and shardable) batch axis
  * MCMC hyperparameter chains -> walkers sharded across devices
  * batch q points             -> just another array axis

Collectives are the argmax-reduction (all_gather of per-shard bests) and
psum — all riding ICI.  Determinism: every shard derives its work from the
same base PRNG key via fold_in on the global restart index, so single-chip
and multi-chip runs produce identical results (the reference tests the
analogous single- vs multi-thread consistency, gpp_math_test.cpp:1850).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cornell_moe_tpu.ops import optimizers


def default_mesh(num_devices: Optional[int] = None,
                 axis_name: str = "restarts",
                 devices=None) -> Mesh:
    """An Auto-axis mesh (so with_sharding_constraint reshards freely;
    jax 0.9 make_mesh defaults to Explicit, which pins avals)."""
    if devices is None:
        devices = jax.devices()
    n = num_devices or len(devices)
    return jax.make_mesh((n,), (axis_name,),
                         axis_types=(jax.sharding.AxisType.Auto,),
                         devices=devices[:n])


def pad_to_multiple(x: jax.Array, multiple: int, axis: int = 0):
    """Pad a batch axis so it divides the mesh; returns (padded, n_valid)."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis] = (0, rem)
    return jnp.pad(x, pad_width, mode="edge"), n


def sharded_multistart_optimize(
        value_and_grad_fn: Callable, domain, initial_points: jax.Array,
        params: optimizers.GradientDescentParameters, mesh: Mesh,
        axis_name: str = "restarts",
        value_fn: Optional[Callable] = None) -> optimizers.MultistartResult:
    """Multistart SGA with the restart axis sharded across the mesh.

    Each device runs the vmapped GD trajectories for its shard of starts;
    the argmax reduction all_gathers only the per-shard best (point, value)
    pairs.  Semantically identical to
    :func:`optimizers.multistart_optimize`.
    """
    if value_fn is None:
        def value_fn(x):
            return value_and_grad_fn(x)[0]

    n_dev = mesh.shape[axis_name]
    padded, n_valid = pad_to_multiple(initial_points, n_dev)

    def local_shard(starts):
        finals = jax.vmap(lambda x0: optimizers.gradient_ascent(
            value_and_grad_fn, domain, x0, params))(starts)
        values = jax.vmap(value_fn)(finals)
        return finals, values

    finals, values = jax.shard_map(
        local_shard, mesh=mesh, in_specs=P(axis_name),
        out_specs=P(axis_name))(padded)

    values = values[:n_valid]
    finals = finals[:n_valid]
    safe = jnp.where(jnp.isfinite(values), values, -jnp.inf)
    best = jnp.argmax(safe)
    return optimizers.MultistartResult(
        best_point=finals[best], best_value=values[best],
        all_points=finals, all_values=values)


def sharded_multistart_optimize_batched(
        batched_value_and_grad: Callable, domain,
        initial_points: jax.Array,
        params: optimizers.GradientDescentParameters, mesh: Mesh,
        axis_name: str = "restarts") -> optimizers.MultistartResult:
    """Sharded counterpart of :func:`optimizers.multistart_optimize_batched`.

    This is the production KG suggest program (bench.py) scaled out: each
    device runs the lockstep batched GD (gradient_ascent_batch) on its
    shard of the restart axis — the batched objective's internal axes
    (ensemble members, MC draws, inner descents) stay on-device, so the
    only collective is the final argmax gather.  Per-start math is
    independent, so results match the single-device path.
    """
    n_dev = mesh.shape[axis_name]
    padded, n_valid = pad_to_multiple(initial_points, n_dev)

    def local_shard(starts):
        finals = optimizers.gradient_ascent_batch(
            batched_value_and_grad, domain, starts, params)
        values = batched_value_and_grad(finals)[0]
        return finals, values

    finals, values = jax.shard_map(
        local_shard, mesh=mesh, in_specs=P(axis_name),
        out_specs=P(axis_name))(padded)

    values = values[:n_valid]
    finals = finals[:n_valid]
    safe = jnp.where(jnp.isfinite(values), values, -jnp.inf)
    best = jnp.argmax(safe)
    return optimizers.MultistartResult(
        best_point=finals[best], best_value=values[best],
        all_points=finals, all_values=values)


def sharded_multistart_optimize_batched_gated(
        batched_value_and_grad: Callable, domain,
        initial_points: jax.Array,
        params: optimizers.GradientDescentParameters, mesh: Mesh,
        axis_name: str = "restarts", chunk_size: Optional[int] = None,
        conv_tol: Optional[float] = None) -> optimizers.MultistartResult:
    """Batched multistart, sharded, with the per-chunk convergence gate.

    Each device runs :func:`optimizers.multistart_optimize_batched`
    (chunking + the step-norm conv_tol gate, gpp_optimization.hpp:667-671
    semantics) on its shard of the restart axis.  Equivalence to a
    single-device run holds when ``chunk_size`` matches the chunking used
    there (defaults to one chunk per device shard) AND
    ``num_multistarts % n_devices == 0``: when starts don't divide the
    mesh, the trailing shard is edge-padded with duplicates of the last
    start (whose deterministic trajectories contribute step norms
    identical to the original's, so the duplicates themselves never move
    the gate's max) but the shard *grouping* of the gate's max-reduction
    no longer matches any single-device chunking, so per-start results
    may differ within conv_tol-sized slack (ADVICE r4).
    """
    n_dev = mesh.shape[axis_name]
    padded, n_valid = pad_to_multiple(initial_points, n_dev)

    def local_shard(starts):
        res = optimizers.multistart_optimize_batched(
            batched_value_and_grad, domain, starts, params,
            chunk_size=chunk_size, conv_tol=conv_tol)
        return res.all_points, res.all_values

    finals, values = jax.shard_map(
        local_shard, mesh=mesh, in_specs=P(axis_name),
        out_specs=P(axis_name))(padded)

    values = values[:n_valid]
    finals = finals[:n_valid]
    safe = jnp.where(jnp.isfinite(values), values, -jnp.inf)
    best = jnp.argmax(safe)
    return optimizers.MultistartResult(
        best_point=finals[best], best_value=values[best],
        all_points=finals, all_values=values)


def sharded_multistart_optimize_batched_warm(
        bvg_cold: Callable, bvg_warm: Callable, domain,
        initial_points: jax.Array,
        params: optimizers.GradientDescentParameters, mesh: Mesh,
        axis_name: str = "restarts", chunk_size: Optional[int] = None,
        conv_tol: Optional[float] = None) -> optimizers.MultistartResult:
    """Sharded counterpart of :func:`optimizers.multistart_optimize_batched_warm`.

    The PRODUCTION suggest program (warm-started inner descents +
    optional convergence gate) scaled out over the restart axis: each
    device runs the warm chunked solver on its shard, so the inner-
    problem carry and the per-chunk step-norm gate stay device-local
    and the only collective is the final argmax gather.

    Exact sharded==single equivalence holds when ``chunk_size`` equals
    the per-device shard size (the gate's max-reduction then spans the
    same start groups in both programs); smaller chunk sizes divide each
    shard further and still match a single-device run using the same
    chunking.  Defaults to one chunk per device shard.  As in the gated
    variant, exactness additionally requires
    ``num_multistarts % n_devices == 0`` — otherwise the trailing shard
    is edge-padded (duplicate lanes contribute identical step norms, so
    they never move the gate's max, but the gate's start-grouping then
    matches no single-device chunking; divergence is bounded by the
    conv_tol slack) (ADVICE r4).
    """
    n_dev = mesh.shape[axis_name]
    padded, n_valid = pad_to_multiple(initial_points, n_dev)

    def local_shard(starts):
        res = optimizers.multistart_optimize_batched_warm(
            bvg_cold, bvg_warm, domain, starts, params,
            chunk_size=chunk_size, conv_tol=conv_tol)
        return res.all_points, res.all_values

    finals, values = jax.shard_map(
        local_shard, mesh=mesh, in_specs=P(axis_name),
        out_specs=P(axis_name))(padded)

    values = values[:n_valid]
    finals = finals[:n_valid]
    safe = jnp.where(jnp.isfinite(values), values, -jnp.inf)
    best = jnp.argmax(safe)
    return optimizers.MultistartResult(
        best_point=finals[best], best_value=values[best],
        all_points=finals, all_values=values)


def sharded_point_evaluation(value_fn: Callable, points: jax.Array,
                             mesh: Mesh, axis_name: str = "restarts"
                             ) -> jax.Array:
    """Evaluate an acquisition over a large point list, sharded.

    The TPU-native 'dumb search' (EvaluateEIAtPointList et al. over 2e4 LHC
    points, constant.py): each device evaluates its shard.
    """
    n_dev = mesh.shape[axis_name]
    padded, n_valid = pad_to_multiple(points, n_dev)

    out = jax.shard_map(
        lambda p: jax.vmap(value_fn)(p), mesh=mesh,
        in_specs=P(axis_name), out_specs=P(axis_name))(padded)
    return out[:n_valid]


def shard_ensemble_states(states, mesh: Mesh, axis_name: str = "restarts"):
    """Place a stacked GP-ensemble state with the MCMC axis sharded."""
    sharding = NamedSharding(mesh, P(axis_name))

    def place(leaf):
        if leaf.ndim >= 1 and leaf.shape[0] == \
                states.points_sampled.shape[0]:
            return jax.device_put(leaf, sharding)
        return leaf
    return jax.tree.map(place, states)


def sharded_ensemble_mcmc_step(log_prob_fn: Callable, mesh: Mesh,
                               axis_name: str = "restarts"):
    """Return a stretch-move step function with walkers sharded.

    The two half-ensembles are materialized on every device (all_gather of
    half the walkers — small) while log-prob evaluation, the expensive part
    (a Cholesky per walker), stays sharded.
    """
    from cornell_moe_tpu.models.mcmc import stretch_move_step

    def step(key, positions, log_probs):
        # positions replicated in, computation sharded by vmapping log_prob
        def sharded_lp(pos):
            return jax.shard_map(
                lambda p: log_prob_fn(p), mesh=mesh,
                in_specs=P(axis_name), out_specs=P(axis_name))(pos)
        return stretch_move_step(key, positions, log_probs, sharded_lp)

    return step
