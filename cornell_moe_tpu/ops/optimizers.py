"""Multistart stochastic-gradient-ascent optimization, TPU style.

Counterpart of the reference's optimizer layer
(/root/reference/moe/optimal_learning/cpp/gpp_optimization.hpp and
``python/cpp_wrappers/optimization.py``).  The reference parallelizes
restarts with OpenMP threads over per-thread State objects
(gpp_optimization.hpp:1452-1564); here a restart is just a batch element:
``vmap`` over starts x ``lax.scan`` over steps compiles the entire
multistart into one XLA program, and restarts shard across chips via
``shard_map`` (see cornell_moe_tpu.parallel).

Semantics preserved from the reference GD loop (gpp_optimization.hpp:619-705):
  * decaying step size ``pre_mult * (i+1)^(-gamma)`` (resets each restart)
  * steps clamped by ``domain.limit_update(max_relative_change, x, step)``
  * Polyak-Ruppert averaging over the trailing ``num_steps_averaged`` steps
    (python_version/optimization.py:392-530)
  * ``max_num_restarts`` outer rounds re-entering from the current point.

The objective convention is MAXIMIZATION (as in the reference: EI, KG, and
-posterior-mean are all maximized).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax


@dataclasses.dataclass(frozen=True)
class GradientDescentParameters:
    """Mirror of the reference struct (gpp_optimizer_parameters.hpp:79)."""

    num_multistarts: int = 40
    max_num_steps: int = 100
    max_num_restarts: int = 2
    num_steps_averaged: int = 0
    gamma: float = 0.7
    pre_mult: float = 1.0
    max_relative_change: float = 1.0
    tolerance: float = 1.0e-7


@dataclasses.dataclass(frozen=True)
class NewtonParameters:
    """Mirror of NewtonParameters (gpp_optimizer_parameters.hpp:130)."""

    num_multistarts: int = 8
    max_num_steps: int = 100
    gamma: float = 1.05
    time_factor: float = 1.0e-2
    max_relative_change: float = 1.0
    tolerance: float = 1.0e-9


class MultistartResult(NamedTuple):
    best_point: jax.Array       # (point_shape...)
    best_value: jax.Array       # scalar
    all_points: jax.Array       # (num_starts, point_shape...)
    all_values: jax.Array       # (num_starts,)


def _trailing_window_mean(buf: jax.Array, rows: jax.Array,
                          width: int) -> jax.Array:
    """Mean of a circular trajectory buffer in TRAJECTORY order.

    ``rows % width`` is the next write slot == the oldest row; rolling it
    to the front makes the summation order identical to the scan path's
    ``mean(traj[-width:])``, so gated runs that never exit early are
    bit-identical to the fixed-depth runs regardless of how the buffer
    happens to be rotated.
    """
    ordered = jnp.roll(buf, -(rows % width), axis=0)
    return jnp.mean(ordered, axis=0)


def gradient_ascent(value_and_grad_fn: Callable, domain, x0: jax.Array,
                    params: GradientDescentParameters,
                    conv_tol: Optional[float] = None) -> jax.Array:
    """One restarted GD trajectory from x0; returns the final point.

    ``value_and_grad_fn(x) -> (value, grad)``; only the grad is used inside
    the loop (matching the reference, which never evaluates the objective
    during descent).  The domain may be a RepeatedDomain for q-point blocks.

    ``conv_tol``: optional step-norm convergence gate (the C++ GD's
    tolerance-exit, gpp_optimization.hpp:641,667-671): a round ends once
    the domain-limited step norm falls below the threshold, but never
    before the trailing Polyak window holds ``num_steps_averaged`` rows.
    Under vmap the while_loop batches with per-lane masking, so each
    start exits on its own schedule (converged lanes freeze).  With
    ``conv_tol=None`` the fixed-depth scan path runs, bit-identical to
    previous behavior.
    """
    avg_n = max(int(params.num_steps_averaged), 0)
    use_avg = 0 < avg_n <= params.max_num_steps
    num_steps = int(params.max_num_steps)
    num_rounds = max(int(params.max_num_restarts), 1)

    def one_round(x, _):
        def step(carry, i):
            x = carry
            _, g = value_and_grad_fn(x)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            alpha = params.pre_mult * (i + 1.0) ** (-params.gamma)
            dx = domain.limit_update(params.max_relative_change, x,
                                     alpha * g)
            return x + dx, x + dx

        steps = jnp.arange(params.max_num_steps, dtype=x.dtype)
        x_final, traj = lax.scan(step, x, steps)
        if use_avg:
            x_final = jnp.mean(traj[-avg_n:], axis=0)
            x_final = domain.clip(x_final)
        return x_final, None

    if conv_tol is None:
        x, _ = lax.scan(one_round, x0, None, length=num_rounds)
        return x

    # Gated variant: circular Polyak buffer over a dynamic-length
    # trajectory (same scheme as gradient_ascent_batch's gated round).
    width = max(avg_n, 1)
    min_rows = width if use_avg else 1

    def one_round_gated(x):
        buf = jnp.zeros((width,) + x.shape, x.dtype) + (x * 0)[None]

        def cond(state):
            i, _x, _buf, rows, norm = state
            return (i < num_steps) & ((norm >= conv_tol) |
                                      (rows < min_rows))

        def body(state):
            i, x, buf, rows, _ = state
            _, g = value_and_grad_fn(x)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            alpha = params.pre_mult * (i + 1.0) ** (-params.gamma)
            dx = domain.limit_update(params.max_relative_change, x,
                                     alpha * g)
            x_new = x + dx
            buf = lax.dynamic_update_index_in_dim(
                buf, x_new, rows % width, axis=0)
            norm = jnp.sqrt(jnp.sum(dx * dx))
            return (i + 1.0, x_new, buf, rows + 1, norm)

        norm0 = jnp.asarray(jnp.inf, x.dtype) + jnp.sum(x) * 0
        state = (jnp.asarray(0.0, x.dtype), x, buf,
                 jnp.asarray(0, jnp.int32), norm0)
        _, xf, buf, rows, _ = lax.while_loop(cond, body, state)
        if use_avg:
            xf = domain.clip(_trailing_window_mean(buf, rows, width))
        return xf

    x = x0
    for _ in range(num_rounds):
        x = one_round_gated(x)
    return x


def gradient_ascent_line_search(value_and_grad_fn: Callable, domain,
                                x0: jax.Array,
                                params: GradientDescentParameters,
                                max_backtracks: int = 8,
                                shrink: float = 0.5) -> jax.Array:
    """Backtracking line-search gradient ascent.

    Counterpart of GradientDescentOptimizationLineSearch
    (gpp_optimization.hpp:707) — the optimizer the reference's inner
    posterior-mean polish uses: propose ``alpha_i * grad`` (domain-limited),
    halve the step while the objective does not improve, with a fixed
    backtrack budget so the whole search jits as a lax.scan.
    """
    def step(carry, i):
        x, v = carry
        _, g = value_and_grad_fn(x)
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        alpha = params.pre_mult * (i + 1.0) ** (-params.gamma)
        dx0 = domain.limit_update(params.max_relative_change, x,
                                  alpha * g)

        def backtrack(carry, _):
            dx, accepted = carry
            x_try = x + dx
            v_try, _ = value_and_grad_fn(x_try)
            ok = v_try > v
            # first acceptance wins; afterwards keep the accepted step
            new_dx = jnp.where(ok & ~accepted, dx, dx * jnp.where(
                accepted, 1.0, shrink))
            return (new_dx, accepted | ok), None

        (dx, accepted), _ = lax.scan(
            backtrack, (dx0, jnp.asarray(False)), None,
            length=max_backtracks)
        x_new = jnp.where(accepted, x + dx, x)
        v_new, _ = value_and_grad_fn(x_new)
        return (x_new, v_new), None

    v0, _ = value_and_grad_fn(x0)
    (x, _v), _ = lax.scan(step, (x0, v0),
                          jnp.arange(params.max_num_steps,
                                     dtype=x0.dtype))
    return x


def gradient_ascent_batch(batched_value_and_grad: Callable, domain,
                          x0: jax.Array,
                          params: GradientDescentParameters,
                          conv_tol: Optional[float] = None) -> jax.Array:
    """Restarted GD on a whole batch of starts at once.

    ``batched_value_and_grad((B, ...)) -> ((B,), (B, ...))``.  Unlike
    vmap(gradient_ascent), the batch axis lives INSIDE the objective's
    matmuls, which lets fused implementations use full MXU tiles (the
    KG union-precompute becomes one wide matmul instead of B thin ones).
    Semantics identical to the vmapped path.

    ``conv_tol``: optional step-norm convergence gate (the C++ GD's
    tolerance-exit semantics, gpp_optimization.hpp:641,667-671): a round
    ends once EVERY point's domain-limited step norm falls below the
    threshold (max-reduction over the batch), but never before the
    trailing Polyak window holds ``num_steps_averaged`` rows.  With
    ``conv_tol=None`` the fixed-depth scan path runs, bit-identical to
    previous behavior.
    """
    avg_n = max(int(params.num_steps_averaged), 0)
    use_avg = 0 < avg_n <= params.max_num_steps
    num_steps = int(params.max_num_steps)
    num_rounds = max(int(params.max_num_restarts), 1)

    def one_round(x, _):
        def step(carry, i):
            x = carry
            _, g = batched_value_and_grad(x)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            alpha = params.pre_mult * (i + 1.0) ** (-params.gamma)
            dx = domain.limit_update(params.max_relative_change, x,
                                     alpha * g)
            return x + dx, x + dx

        steps = jnp.arange(params.max_num_steps, dtype=x.dtype)
        x_final, traj = lax.scan(step, x, steps)
        if use_avg:
            x_final = jnp.mean(traj[-avg_n:], axis=0)
            x_final = domain.clip(x_final)
        return x_final, None

    if conv_tol is None:
        x, _ = lax.scan(one_round, x0, None, length=num_rounds)
        return x

    # Gated variant: circular Polyak buffer over a dynamic-length
    # trajectory (same scheme as multistart_optimize_batched_warm's
    # run_round_gated); when no exit fires the result matches the scan
    # path exactly.  Buffer/norm are derived from x so their varying-
    # axis types survive shard_map.
    width = max(avg_n, 1)
    min_rows = width if use_avg else 1
    axes = tuple(range(1, x0.ndim))

    def one_round_gated(x):
        buf = jnp.zeros((width,) + x.shape, x.dtype) + (x * 0)[None]

        def cond(state):
            i, _x, _buf, rows, norm = state
            return (i < num_steps) & ((norm >= conv_tol) |
                                      (rows < min_rows))

        def body(state):
            i, x, buf, rows, _ = state
            _, g = batched_value_and_grad(x)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            alpha = params.pre_mult * (i + 1.0) ** (-params.gamma)
            dx = domain.limit_update(params.max_relative_change, x,
                                     alpha * g)
            x_new = x + dx
            buf = lax.dynamic_update_index_in_dim(
                buf, x_new, rows % width, axis=0)
            norm = jnp.max(jnp.sqrt(jnp.sum(dx * dx, axis=axes)))
            return (i + 1.0, x_new, buf, rows + 1, norm)

        norm0 = jnp.asarray(jnp.inf, x.dtype) + jnp.sum(x) * 0
        state = (jnp.asarray(0.0, x.dtype), x, buf,
                 jnp.asarray(0, jnp.int32), norm0)
        _, xf, buf, rows, _ = lax.while_loop(cond, body, state)
        if use_avg:
            xf = domain.clip(_trailing_window_mean(buf, rows, width))
        return xf

    x = x0
    for _ in range(num_rounds):
        x = one_round_gated(x)
    return x


def _chunked_multistart(run_batch: Callable, value_fn: Callable,
                        initial_points: jax.Array,
                        chunk_size: Optional[int],
                        with_aux: bool = False):
    """Dispatch restarts (whole or in sequential lax.map chunks), score the
    endpoints with ``value_fn``, and argmax-select (NaN values lose).

    ``with_aux``: ``run_batch`` returns ``(points, aux)`` and the result
    is ``(MultistartResult, aux)`` with aux stacked per chunk — used by
    the FLOP-accounting path to surface executed gated-step counts.
    """
    n = initial_points.shape[0]
    aux = None
    if chunk_size and n % chunk_size == 0 and n > chunk_size:
        chunked = initial_points.reshape(
            (n // chunk_size, chunk_size) + initial_points.shape[1:])
        if with_aux:
            final_points, aux = jax.lax.map(run_batch, chunked)
        else:
            final_points = jax.lax.map(run_batch, chunked)
        values = jax.lax.map(
            value_fn, final_points).reshape(-1)
        final_points = final_points.reshape(initial_points.shape)
    else:
        if with_aux:
            final_points, aux = run_batch(initial_points)
        else:
            final_points = run_batch(initial_points)
        values = value_fn(final_points)
    safe_values = jnp.where(jnp.isfinite(values), values, -jnp.inf)
    best = jnp.argmax(safe_values)
    result = MultistartResult(best_point=final_points[best],
                              best_value=values[best],
                              all_points=final_points, all_values=values)
    return (result, aux) if with_aux else result


def multistart_optimize_batched(batched_value_and_grad: Callable, domain,
                                initial_points: jax.Array,
                                params: GradientDescentParameters,
                                chunk_size: Optional[int] = None,
                                conv_tol: Optional[float] = None
                                ) -> MultistartResult:
    """Multistart GD with a batched objective (see gradient_ascent_batch).

    ``conv_tol``: optional per-chunk step-norm convergence gate; see
    :func:`gradient_ascent_batch`.
    """
    def run_batch(starts):
        return gradient_ascent_batch(batched_value_and_grad, domain,
                                     starts, params, conv_tol=conv_tol)

    return _chunked_multistart(run_batch,
                               lambda c: batched_value_and_grad(c)[0],
                               initial_points, chunk_size)


def multistart_optimize_batched_warm(bvg_cold: Callable, bvg_warm: Callable,
                                     domain, initial_points: jax.Array,
                                     params: GradientDescentParameters,
                                     chunk_size: Optional[int] = None,
                                     conv_tol: Optional[float] = None,
                                     return_stats: bool = False
                                     ) -> MultistartResult:
    """Multistart GD threading an inner-problem carry across outer steps.

    ``bvg_cold(x) -> (values, grads, carry)`` is the full (seeded)
    objective, called once at the start of each chunk to initialize the
    carry and once at the end for the final values;
    ``bvg_warm(x, carry) -> (values, grads, carry)`` is the warm-started
    objective used for every subsequent GD step.  Outer GD semantics are
    identical to :func:`multistart_optimize_batched` (decaying LR reset
    per restart round, domain-limited steps, trailing Polyak averaging).

    ``conv_tol``: optional convergence gate mirroring the reference GD's
    per-step exit, ``||step||_2 < tolerance`` (gpp_optimization.hpp:
    641,667-671 — there tolerance/max_num_steps with an effectively-
    unreachable 1e-10 driver setting; here an explicit, measured
    threshold).  A chunk's round ends early once EVERY point's domain-
    limited step norm falls below ``conv_tol`` (max-reduction over the
    chunk — no point exits before its own convergence), but never
    before the Polyak window holds ``num_steps_averaged`` rows, so the
    returned average is always over a full trailing window.  With
    ``conv_tol=None`` (default) the fixed-depth scan path runs and
    results are bit-identical to previous behavior.

    ``return_stats``: also return the number of executed warm-objective
    evaluations per chunk, shape (n_chunks,) — XLA's cost analysis
    counts each loop body once, so honest FLOP/MFU accounting needs
    these measured trip counts (benchmarks/profile_mfu.py).
    """
    avg_n = max(int(params.num_steps_averaged), 0)
    use_avg = 0 < avg_n <= params.max_num_steps
    num_steps = int(params.max_num_steps)
    num_rounds = max(int(params.max_num_restarts), 1)

    def update(x, g, i):
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        alpha = params.pre_mult * (i + 1.0) ** (-params.gamma)
        dx = domain.limit_update(params.max_relative_change, x, alpha * g)
        return x + dx

    def run_round(x, carry, first_round):
        # the very first GD step of the first round consumes the cold
        # gradients computed while initializing the carry; that already-
        # updated point is row 0 of the round's trajectory, so Polyak
        # averaging sees the same num_steps-row window as the cold path
        start_i = 1 if first_round else 0

        def step(sc, i):
            x, carry = sc
            _, g, carry = bvg_warm(x, carry)
            x_new = update(x, g, i)
            return (x_new, carry), x_new

        (xf, carry), traj = lax.scan(
            step, (x, carry),
            jnp.arange(start_i, num_steps, dtype=x.dtype))
        if first_round:
            traj = jnp.concatenate([x[None], traj], axis=0)
        if use_avg:
            xf = domain.clip(jnp.mean(traj[-avg_n:], axis=0))
        return xf, carry, jnp.asarray(num_steps - start_i, jnp.int32)

    def run_round_gated(x, carry, first_round):
        """run_round with the conv_tol while-loop early exit.

        Polyak averaging over a dynamic-length trajectory uses a
        circular buffer of the last ``avg_n`` points; when no exit
        fires the result matches run_round (same trailing window).
        """
        start_i = 1 if first_round else 0
        width = max(avg_n, 1)
        # derive the zero buffer and the +inf initial norm from x so
        # their varying-axis type matches the body outputs when this
        # runs device-local under shard_map (see the sharded warm
        # multistart in parallel/sharding.py)
        buf = jnp.zeros((width,) + x.shape, x.dtype) + (x * 0)[None]
        rows0 = jnp.asarray(0, jnp.int32)
        if first_round:
            buf = buf.at[0].set(x)          # row 0 = the cold-step point
            rows0 = jnp.asarray(1, jnp.int32)
        # minimum rows before an exit may fire: a full averaging window
        min_rows = width if use_avg else 1
        axes = tuple(range(1, x.ndim))      # per-point step-norm axes

        def cond(state):
            i, _x, _carry, _buf, rows, norm = state
            return (i < num_steps) & ((norm >= conv_tol) |
                                      (rows < min_rows))

        def body(state):
            i, x, carry, buf, rows, _ = state
            _, g, carry = bvg_warm(x, carry)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            alpha = params.pre_mult * (i + 1.0) ** (-params.gamma)
            dx = domain.limit_update(params.max_relative_change, x,
                                     alpha * g)
            x_new = x + dx
            buf = lax.dynamic_update_index_in_dim(
                buf, x_new, rows % width, axis=0)
            norm = jnp.max(jnp.sqrt(jnp.sum(dx * dx, axis=axes)))
            return (i + 1.0, x_new, carry, buf, rows + 1, norm)

        i0 = jnp.asarray(float(start_i), x.dtype)
        norm0 = jnp.asarray(jnp.inf, x.dtype) + jnp.sum(x) * 0
        state = (i0, x, carry, buf, rows0, norm0)
        i_f, xf, carry, buf, rows, _ = lax.while_loop(cond, body, state)
        if use_avg:
            # rows >= width here (min_rows gate), so the buffer holds
            # exactly the last ``width`` trajectory rows
            xf = domain.clip(_trailing_window_mean(buf, rows, width))
        return xf, carry, (i_f - i0).astype(jnp.int32)

    round_fn = run_round if conv_tol is None else run_round_gated

    def run_batch(starts):
        if num_steps == 0:        # cold semantics: no update at all
            return starts, jnp.asarray(0, jnp.int32)
        _, g0, carry = bvg_cold(starts)
        x = update(starts, g0, 0)
        x, carry, n_evals = round_fn(x, carry, True)
        for _ in range(num_rounds - 1):
            x, carry, n = round_fn(x, carry, False)
            n_evals = n_evals + n
        return x, n_evals

    if return_stats:
        return _chunked_multistart(run_batch, lambda c: bvg_cold(c)[0],
                                   initial_points, chunk_size,
                                   with_aux=True)
    return _chunked_multistart(lambda s: run_batch(s)[0],
                               lambda c: bvg_cold(c)[0],
                               initial_points, chunk_size)


def multistart_optimize(value_and_grad_fn: Callable, domain,
                        initial_points: jax.Array,
                        params: GradientDescentParameters,
                        value_fn: Optional[Callable] = None,
                        chunk_size: Optional[int] = None,
                        conv_tol: Optional[float] = None
                        ) -> MultistartResult:
    """vmapped multistart GD with argmax reduction.

    Counterpart of MultistartOptimizer::MultistartOptimize
    (gpp_optimization.hpp:1452-1564).  NaN objective values lose the argmax
    (the reference captures per-thread exceptions and keeps going).

    ``chunk_size``: when set (and dividing num_starts), restarts run in
    sequential chunks of that width via lax.map — same results, bounded
    peak memory for very wide multistarts over expensive objectives.

    ``conv_tol``: optional per-start step-norm convergence gate; see
    :func:`gradient_ascent` (the vmapped while_loop masks per lane, so
    each start exits on its own schedule).
    """
    if value_fn is None:
        def value_fn(x):
            return value_and_grad_fn(x)[0]

    def run_batch(starts):
        return jax.vmap(
            lambda x0: gradient_ascent(value_and_grad_fn, domain, x0,
                                       params, conv_tol=conv_tol))(starts)

    n = initial_points.shape[0]
    if chunk_size and n % chunk_size == 0 and n > chunk_size:
        chunked = initial_points.reshape(
            (n // chunk_size, chunk_size) + initial_points.shape[1:])
        final_points = jax.lax.map(run_batch, chunked).reshape(
            initial_points.shape)
    else:
        final_points = run_batch(initial_points)
    values = jax.vmap(value_fn)(final_points)
    safe_values = jnp.where(jnp.isfinite(values), values, -jnp.inf)
    best = jnp.argmax(safe_values)
    return MultistartResult(best_point=final_points[best],
                            best_value=values[best],
                            all_points=final_points, all_values=values)


def multistart_optimize_with_dumb_search_fallback(
        value_and_grad_fn: Callable, domain, initial_points: jax.Array,
        search_points: jax.Array, params: GradientDescentParameters,
        value_fn: Optional[Callable] = None) -> MultistartResult:
    """GD multistart, then compare against a brute-force point evaluation.

    Counterpart of ComputeOptimalPointsToSample (gpp_math.hpp:2010): run
    multistart GD, and also evaluate the objective over a large
    latin-hypercube set; return whichever is best.  Inside one XLA program
    the "fallback" is free parallel work rather than a serial retry.
    """
    if value_fn is None:
        def value_fn(x):
            return value_and_grad_fn(x)[0]

    gd = multistart_optimize(value_and_grad_fn, domain, initial_points,
                             params, value_fn)
    search_values = jax.vmap(value_fn)(search_points)
    safe = jnp.where(jnp.isfinite(search_values), search_values, -jnp.inf)
    best_search = jnp.argmax(safe)
    take_search = safe[best_search] > gd.best_value
    best_point = jnp.where(take_search, search_points[best_search],
                           gd.best_point)
    best_value = jnp.where(take_search, safe[best_search], gd.best_value)
    return MultistartResult(best_point=best_point, best_value=best_value,
                            all_points=gd.all_points,
                            all_values=gd.all_values)


def newton_optimize(value_and_grad_fn: Callable, domain, x0: jax.Array,
                    params: NewtonParameters,
                    hessian_fn: Optional[Callable] = None) -> jax.Array:
    """Modified Newton with diagonal damping (gpp_optimization.hpp Newton).

    The reference damps with ``1/(time_factor * gamma^(i+1))`` added to the
    Hessian diagonal, fading as iterations proceed.  Used for hyperparameter
    MAP polishing.
    """
    if hessian_fn is None:
        hessian_fn = jax.hessian(lambda x: value_and_grad_fn(x)[0])

    def step(x, i):
        _, g = value_and_grad_fn(x)
        h = hessian_fn(x)
        damp = 1.0 / (params.time_factor * params.gamma ** (i + 1.0))
        # maximization: solve (-H + damp I) dx = g
        a = -h + damp * jnp.eye(x.shape[-1], dtype=x.dtype)
        dx = jnp.linalg.solve(a, g)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        dx = domain.limit_update(params.max_relative_change, x, dx)
        return x + dx, None

    x, _ = lax.scan(step, x0, jnp.arange(params.max_num_steps,
                                         dtype=x0.dtype))
    return x
