"""Pallas TPU kernels for the GP hot ops.

Fused covariance-matrix construction: XLA's broadcast pipeline for
``k(x_i, x_j)`` materializes the (n1, n2, d) difference tensor in HBM;
this kernel tiles both point sets through VMEM, computes the scaled
squared distances with the Gram trick (the cross term is a (T, d) x
(d, T) MXU matmul), and fuses the Matérn/SE transcendentals into the
same tile — one HBM write of the (n1, n2) output and nothing else.

Used by the fit path for large n (training covariance, batched over the
hyperparameter ensemble via vmap); falls back to the jnp builder for
small n, derivative channels, or non-TPU backends (f64 is not a TPU
dtype).  Accuracy note: the Gram trick carries ~eps*|u|^2 absolute error
in s, clamped at 0 — negligible against the observation-noise floors used
in f32, and the parity test suite runs the jnp builder in f64.

Measured on v5e at (2048, 2048, d=6): 0.61 ms/build vs 0.58 ms for the
XLA builder — the op is VPU-transcendental-bound, so both sit at the same
hardware limit (XLA fuses the broadcast pipeline without materializing
the (n, n, d) tensor after all).  The kernel is kept as the foundation
for fused multi-stage pipelines (K build + noise + blocked Cholesky) where
staging through HBM does cost; the gate keeps it off the differentiated
paths (no VJP).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT5 = math.sqrt(5.0)
_TILE = 128


def _cdiv(a, b):
    return -(-a // b)


def _cov_tile_kernel(u1_ref, u2_ref, alpha_ref, out_ref, *, kernel_name):
    """One (T, T) output tile: Gram-trick distances + fused kernel."""
    u1 = u1_ref[:]                                  # (T, d)
    u2 = u2_ref[:]                                  # (T, d)
    cross = jax.lax.dot_general(
        u1, u2, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)        # (T, T)
    n1 = jnp.sum(u1 * u1, axis=1, keepdims=True)    # (T, 1)
    n2 = jnp.sum(u2 * u2, axis=1, keepdims=True)    # (T, 1)
    s = jnp.maximum(n1 + n2.T - 2.0 * cross, 0.0)
    alpha = alpha_ref[0, 0]
    if kernel_name == "square_exponential":
        out_ref[:] = alpha * jnp.exp(-0.5 * s)
    else:                                            # matern 2.5
        r = jnp.sqrt(s)
        out_ref[:] = alpha * (1.0 + _SQRT5 * r + (5.0 / 3.0) * s) * \
            jnp.exp(-_SQRT5 * r)


@functools.partial(jax.jit, static_argnames=("kernel_name", "interpret"))
def pallas_covariance_matrix(x1: jax.Array, x2: jax.Array,
                             hyperparameters: jax.Array,
                             kernel_name: str = "matern_2.5",
                             interpret: bool = False) -> jax.Array:
    """Value-channel covariance matrix k(x1, x2) via the fused kernel.

    x1: (n1, d), x2: (n2, d), hyperparameters: [alpha, lengths...].
    Returns (n1, n2) in float32.
    """
    alpha = hyperparameters[0].reshape(1, 1).astype(jnp.float32)
    lengths = hyperparameters[1:]
    u1 = (x1 / lengths).astype(jnp.float32)
    u2 = (x2 / lengths).astype(jnp.float32)
    n1, d = u1.shape
    n2 = u2.shape[0]
    n1p, n2p = _cdiv(n1, _TILE) * _TILE, _cdiv(n2, _TILE) * _TILE
    # pad points far away so padded entries are ~0 (and sliced off anyway)
    if n1p != n1:
        u1 = jnp.pad(u1, ((0, n1p - n1), (0, 0)), constant_values=1e6)
    if n2p != n2:
        u2 = jnp.pad(u2, ((0, n2p - n2), (0, 0)), constant_values=-1e6)

    out = pl.pallas_call(
        functools.partial(_cov_tile_kernel, kernel_name=kernel_name),
        out_shape=jax.ShapeDtypeStruct((n1p, n2p), jnp.float32),
        grid=(n1p // _TILE, n2p // _TILE),
        in_specs=[
            pl.BlockSpec((_TILE, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, _TILE), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(u1, u2, alpha)
    return out[:n1, :n2]


def _cov_full_kernel(us_ref, alpha_ref, noise_ref, out_ref, *,
                     kernel_name):
    """Whole K + diag(noise) in one program (one walker / ensemble member).

    XLA's pipeline and the tiled kernel above pay per-program overhead on
    ~(500, 500) fit matrices (the MCMC hot loop builds 16 of them per
    stretch-move step); at n <= ~768 the full matrix fits VMEM, so one
    program per member does the fields and the diagonal add in one pass.
    """
    us = us_ref[:]                                   # (d, Np)
    d = us.shape[0]
    s = None
    for dd in range(d):
        diff = us[dd][:, None] - us[dd][None, :]
        s = diff * diff if s is None else s + diff * diff
    alpha = alpha_ref[0, 0]
    if kernel_name == "square_exponential":
        k = alpha * jnp.exp(-0.5 * s)
    else:
        r = jnp.sqrt(s)
        k = alpha * (1.0 + _SQRT5 * r + (5.0 / 3.0) * s) * \
            jnp.exp(-_SQRT5 * r)
    n = k.shape[0]
    ii = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    out_ref[:] = k + jnp.where(ii == jj, noise_ref[0][:, None], 0.0)


@functools.partial(jax.jit, static_argnames=("kernel_name", "interpret"))
def pallas_covariance_with_noise_full(points: jax.Array,
                                      hyperparameters: jax.Array,
                                      noise_vec: jax.Array,
                                      kernel_name: str = "matern_2.5",
                                      interpret: bool = False) -> jax.Array:
    """K(x, x) + diag(noise_vec) via the single-program fused kernel.

    points: (n, d); noise_vec: (n,) total per-point diagonal noise.
    Returns (n, n) float32.  Use for n <= ~768 (whole matrix in VMEM).
    """
    alpha = hyperparameters[0].reshape(1, 1).astype(jnp.float32)
    lengths = hyperparameters[1:]
    us = (points / lengths).T.astype(jnp.float32)    # (d, n)
    d, n = us.shape
    np_ = _cdiv(n, _TILE) * _TILE
    us = jnp.pad(us, ((0, 0), (0, np_ - n)), constant_values=1e6)
    noise = jnp.pad(noise_vec.astype(jnp.float32), (0, np_ - n))[None]

    out = pl.pallas_call(
        functools.partial(_cov_full_kernel, kernel_name=kernel_name),
        out_shape=jax.ShapeDtypeStruct((np_, np_), jnp.float32),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((d, np_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, np_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((np_, np_), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(us, alpha, noise)
    return out[:n, :n]


# ---------------------------------------------------------------------------
# Fused LML kernel: K build + blocked Cholesky + solve + logdet
# ---------------------------------------------------------------------------
#
# The MCMC hot loop evaluates the log marginal likelihood of ~16 walker
# proposals per stretch-move step; XLA runs the batched Cholesky as a long
# sequence of tiny panel ops (latency-bound, ~1.5 ms) plus separate build
# and solve passes.  This kernel processes WB walkers per program with the
# walker axis vectorized through every column step: build K in VMEM,
# blocked left-looking-in-panel/right-looking-across-panel Cholesky in the
# (column, row) layout, forward substitution fused into the column loop,
# and the log-determinant accumulated from the pivots.  Nothing but the
# (WB,) scalars returns to HBM.

def _lml_kernel(us_ref, alpha_ref, noise_ref, y_ref, quad_ref, logdet_ref,
                kb, dscr, *, kernel_name, d, n_real, np_, pb, wb):
    # --- build K + diag(noise), (col, row) layout (K is symmetric);
    # per-walker to keep the (Np, Np) temporaries at one matrix ---------
    ii = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 0)
    jj_ = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    eye = (ii == jj_).astype(jnp.float32)
    for w in range(wb):
        s = None
        for dd in range(d):
            u = us_ref[w, dd, :]                     # (Np,)
            diff = u[:, None] - u[None, :]
            s = diff * diff if s is None else s + diff * diff
        if kernel_name == "square_exponential":
            k = jnp.exp(-0.5 * s)
        else:
            r = jnp.sqrt(s)
            k = (1.0 + _SQRT5 * r + (5.0 / 3.0) * s) * \
                jnp.exp(-_SQRT5 * r)
        kb[w] = alpha_ref[0, 0, w] * k + eye * noise_ref[0, w][:, None]

    iota_n = jax.lax.broadcasted_iota(
        jnp.int32, (np_, 1), 0)[:, 0]                # (Np,)
    iota_p = jax.lax.broadcasted_iota(
        jnp.int32, (pb, 1), 0)[:, 0]                 # (PB,)

    yres = y_ref[0]                                  # (WB, Np) residual
    quad = jnp.zeros((wb,), jnp.float32)
    logdet = jnp.zeros((wb,), jnp.float32)

    num_panels = np_ // pb
    for p in range(num_panels):                      # static
        j0 = p * pb
        # scratch starts as garbage; unwritten rows must contract to 0
        dscr[:] = jnp.zeros((wb, pb, pb), jnp.float32)

        def col_step(j, carry):
            yres, quad, logdet = carry
            jj = j0 + j
            onehot_p = (iota_p == j).astype(jnp.float32)     # (PB,)
            onehot_f = (iota_n == jj).astype(jnp.float32)    # (Np,)
            # L[jj, j0+k] for k<j from the panel-diagonal scratch
            # (masked reduce — Mosaic has no batched in-kernel dots)
            vrow = jnp.sum(dscr[:] * onehot_p[None, None, :],
                           axis=2)                           # (WB, PB)
            vrow = vrow * (iota_p < j).astype(jnp.float32)
            rows = []
            for w in range(wb):                              # per-walker dot
                prod = jax.lax.dot_general(
                    vrow[w][None, :], kb[w, j0:j0 + pb, :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)      # (1, Np)
                rows.append(kb[w, jj, :] - prod[0])
            c = jnp.stack(rows)                              # (WB, Np)
            dsq = jnp.sum(c * onehot_f[None, :], axis=1)     # (WB,)
            dpiv = jnp.sqrt(dsq)
            below = (iota_n > jj).astype(jnp.float32)
            lcol = c * below[None, :] / dpiv[:, None] + \
                onehot_f[None, :] * dpiv[:, None]
            kb[:, jj, :] = lcol
            dscr[:, j, :] = lcol[:, j0:j0 + pb]
            # forward substitution step
            yj = jnp.sum(yres * onehot_f[None, :], axis=1)   # (WB,)
            z = yj / dpiv
            yres = yres - z[:, None] * lcol * below[None, :]
            real = (jj < n_real).astype(jnp.float32)
            quad = quad + real * z * z
            logdet = logdet + real * jnp.log(dpiv)
            return (yres, quad, logdet)

        yres, quad, logdet = jax.lax.fori_loop(
            0, pb, col_step, (yres, quad, logdet))

        if p + 1 < num_panels:
            # trailing residual update: columns >= j0+pb
            mask_c = (iota_n >= j0 + pb).astype(jnp.float32)
            for w in range(wb):
                lp = kb[w, j0:j0 + pb, :]                    # (PB, Np)
                lpt = jnp.transpose(lp)                      # (Np, PB)
                upd = jax.lax.dot_general(
                    lpt, lp, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)      # (Np, Np)
                kb[w] = kb[w] - upd * mask_c[:, None]

    quad_ref[0, 0, :] = quad
    logdet_ref[0, 0, :] = logdet


@functools.partial(jax.jit, static_argnames=("kernel_name", "n_real",
                                             "wb", "interpret"))
def pallas_lml_quad_logdet(us: jax.Array, alpha: jax.Array,
                           noise_vec: jax.Array, y: jax.Array,
                           kernel_name: str = "matern_2.5",
                           n_real: int = None, wb: int = 4,
                           interpret: bool = False):
    """(y^T K^-1 y, sum log diag(chol K)) for a batch of walkers.

    us: (W, d, Np) scaled points per walker, padded columns at distinct
    huge offsets; alpha: (W,) amplitudes; noise_vec: (W, Np) total
    per-point diagonal noise (huge on padding); y: (W, Np) centered
    values (zero on padding).  Np must be a multiple of 128 and W of wb.
    """
    w, d, np_ = us.shape
    pb = 128
    grid = w // wb
    # blocked axes lead; the last two dims of every operand block equal the
    # array's (Mosaic's block-shape constraint)
    quad, logdet = pl.pallas_call(
        functools.partial(_lml_kernel, kernel_name=kernel_name, d=d,
                          n_real=n_real, np_=np_, pb=pb, wb=wb),
        out_shape=(jax.ShapeDtypeStruct((grid, 1, wb), jnp.float32),
                   jax.ShapeDtypeStruct((grid, 1, wb), jnp.float32)),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((wb, d, np_), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, wb), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, wb, np_), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wb, np_), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, 1, wb), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, wb), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((wb, np_, np_), jnp.float32),
            pltpu.VMEM((wb, pb, pb), jnp.float32),
        ],
        interpret=interpret,
    )(us.astype(jnp.float32),
      alpha.reshape(grid, 1, wb).astype(jnp.float32),
      noise_vec.reshape(grid, wb, np_).astype(jnp.float32),
      y.reshape(grid, wb, np_).astype(jnp.float32))
    return quad.reshape(w), logdet.reshape(w)


def pallas_available_for(x: jax.Array, derivatives) -> bool:
    """Gate: TPU backend, float32, value-only channels, worthwhile size."""
    try:
        on_tpu = jax.default_backend() == "tpu"
    except RuntimeError:
        return False
    return (on_tpu and x.dtype == jnp.float32 and len(derivatives) == 0
            and x.shape[0] >= 256)


# ---------------------------------------------------------------------------
# Fused KG inner-descent gradient
# ---------------------------------------------------------------------------
#
# The KG hot loop runs thousands of lockstep posterior-mean descents; each
# GD step needs only the gradient of the fantasized mean
#
#   d mu'/dx = -sum_n P(s_n) (x - X_n)/l^2 w_eff_n  - union term,
#
# which contracts into moments of the training inputs: one (Wr, N) x (N, M)
# matmul against the P field.  XLA keeps ~3 (P, N)-sized HBM round trips per
# step (diff/s/P materializations feeding the einsum); this kernel computes
# the field tile-wise in VMEM and fuses the moment contraction, so per step
# only the (d, M) gradients and the tiny weight blocks touch HBM.
# No VJP is needed: the descent sits under stop_gradient (envelope theorem).

def _descent_grad_kernel(xs_ref, ws_ref, wt_ref, beta_ref, z_ref, us_ref,
                         out_ref, *, kernel_name, q, d):
    """Ascent direction of -mu' in scaled coordinates for one union b.

    xs: (1, d, M) scaled descent points; ws: (d, Np) scaled training pts;
    wt: (1, Wr, Np) moment weights [c*K^-1y | c*V | (those)*ws_dd];
    beta: (1, q, M) c-scaled fantasy betas; z: (q, M) normals^T;
    us: (1, q, d) scaled union coords (SMEM).  Out: (1, d, M).
    """
    def us_read(j, dd):
        return us_ref[0, j, dd]

    out_ref[0] = _field_grad(xs_ref[0], ws_ref[:], wt_ref[0], beta_ref[0],
                             z_ref[:], us_read, kernel_name=kernel_name,
                             q=q, d=d)


def _field_grad(xs, ws, wt, beta, z, us_read, *, kernel_name, q, d):
    """Shared body: ascent direction of -mu' at xs (d, M), scaled coords.

    ws (d, Np), wt (Wr, Np), beta (q, M), z (q, M); ``us_read(j, dd)``
    returns the scaled union coordinate (traced scalar).
    """
    s = None
    for dd in range(d):
        diff = ws[dd][:, None] - xs[dd][None, :]     # (Np, M)
        s = diff * diff if s is None else s + diff * diff
    if kernel_name == "square_exponential":
        phi = jnp.exp(-0.5 * s)
    else:                                            # matern 2.5
        r = jnp.sqrt(s)
        phi = (1.0 + _SQRT5 * r) * jnp.exp(-_SQRT5 * r)

    # MXU-native precision: the moment contraction feeds only the inner
    # GD direction (the acquisition's values/gradients are computed by
    # exact f32-HIGHEST evaluations outside the kernel); forcing HIGHEST
    # here measured +0.18 s on the bench for no change beyond the MC
    # estimator's own noise level.
    a = jax.lax.dot_general(
        wt, phi, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (Wr, M)

    s0 = a[0:1]
    for j in range(q):
        s0 = s0 - a[1 + j:2 + j] * z[j:j + 1]
    rows = []
    for dd in range(d):
        sx = a[1 + q + dd:2 + q + dd]
        for j in range(q):
            ro = 1 + q + (j + 1) * d + dd
            sx = sx - a[ro:ro + 1] * z[j:j + 1]
        rows.append(xs[dd:dd + 1] * s0 - sx)

    for j in range(q):
        su = None
        for dd in range(d):
            du = xs[dd:dd + 1] - us_read(j, dd)
            su = du * du if su is None else su + du * du
        if kernel_name == "square_exponential":
            phi_u = jnp.exp(-0.5 * su)
        else:
            ru = jnp.sqrt(su)
            phi_u = (1.0 + _SQRT5 * ru) * jnp.exp(-_SQRT5 * ru)
        pb = phi_u * beta[j:j + 1]
        for dd in range(d):
            rows[dd] = rows[dd] + pb * (xs[dd:dd + 1] - us_read(j, dd))
    return jnp.concatenate(rows, axis=0)             # (d, M)


def _descent_run_kernel(xs0_ref, ws_ref, wt_ref, beta_ref, z_ref, us_ref,
                        geom_ref, out_ref, *, kernel_name, q, d, b,
                        steps, restarts, avg_n, gamma, pre_mult, mrc):
    """Full inner descent for one ensemble member: B unions x M draws.

    Replicates optimizers.gradient_ascent_batch over the analytic descent
    direction: ``restarts`` rounds of ``steps`` GD steps with the decaying
    step size, TensorProductDomain.LimitUpdate step clamping
    (gpp_domain.cpp:64-110 semantics) and Polyak averaging of the last
    ``avg_n`` steps — everything in VMEM, one kernel per outer GD step.

    geom rows: 0 = lower/l, 1 = upper/l, 2 = 1/l^2 (scaled-coordinate
    update: dx_scaled = alpha * g_scaled / l^2).
    """
    ws = ws_ref[0]                                   # (d, Np)
    z = z_ref[:]                                     # (q, M)

    def one_union(bi, _):
        xs = xs0_ref[bi]                             # (d, M)
        wt = wt_ref[bi]                              # (Wr, Np)
        beta = beta_ref[bi]                          # (q, M)

        def us_read(j, dd):
            return us_ref[0, bi, j, dd]

        for _rnd in range(restarts):
            traj = []
            for i in range(steps):
                g = _field_grad(xs, ws, wt, beta, z, us_read,
                                kernel_name=kernel_name, q=q, d=d)
                alpha = float(pre_mult) * (i + 1.0) ** (-float(gamma))
                rows = []
                for dd in range(d):
                    lo = geom_ref[0, 0, dd]
                    hi = geom_ref[0, 1, dd]
                    il2 = geom_ref[0, 2, dd]
                    x_r = xs[dd:dd + 1]
                    dx = alpha * g[dd:dd + 1] * il2
                    dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
                    dist = jnp.minimum(x_r - lo, hi - x_r)
                    cap = mrc * dist
                    step = jnp.where(jnp.abs(dx) > cap,
                                     jnp.sign(dx) * cap, dx)
                    nxt = x_r + step
                    half = step * 0.5
                    fix_lo = jnp.where((x_r + half) < lo,
                                       (lo - x_r) * 0.5, half)
                    fix_hi = jnp.where((x_r + half) > hi,
                                       (hi - x_r) * 0.5, half)
                    step = jnp.where(nxt < lo, fix_lo,
                                     jnp.where(nxt > hi, fix_hi, step))
                    rows.append(x_r + step)
                xs = jnp.concatenate(rows, axis=0)
                if avg_n:
                    traj.append(xs)
                    traj = traj[-avg_n:]
            if avg_n and traj:
                acc = traj[0]
                for t in traj[1:]:
                    acc = acc + t
                xs = acc / float(len(traj))
                rows = []
                for dd in range(d):
                    lo = geom_ref[0, 0, dd]
                    hi = geom_ref[0, 1, dd]
                    rows.append(jnp.clip(xs[dd:dd + 1], lo, hi))
                xs = jnp.concatenate(rows, axis=0)
        out_ref[bi] = xs
        return 0

    jax.lax.fori_loop(0, b, one_union, 0)


@functools.partial(jax.jit, static_argnames=(
    "kernel_name", "steps", "restarts", "avg_n", "gamma", "pre_mult",
    "mrc", "interpret"))
def pallas_descent_run(xs0: jax.Array, ws: jax.Array, wt: jax.Array,
                       beta_t: jax.Array, z_t: jax.Array, us: jax.Array,
                       geom: jax.Array, kernel_name: str, steps: int,
                       restarts: int, avg_n: int, gamma: float,
                       pre_mult: float, mrc: float,
                       interpret: bool = False) -> jax.Array:
    """Run the whole inner descent in one kernel; returns final scaled xs.

    xs0: (B, d, M); ws: (d, Np); wt: (B, Wr, Np); beta_t: (B, q, M);
    z_t: (q, M); us: (B, q, d); geom: (3, d) [lower/l, upper/l, 1/l^2].
    """
    b, d, m = xs0.shape
    q = z_t.shape[0]
    np_ = ws.shape[1]
    wr = wt.shape[1]
    kern = functools.partial(
        _descent_run_kernel, kernel_name=kernel_name, q=q, d=d, b=b,
        steps=steps, restarts=restarts, avg_n=avg_n, gamma=gamma,
        pre_mult=pre_mult, mrc=mrc)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, d, m), jnp.float32),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b, d, m), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, np_), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, wr, np_), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, q, m), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q, m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, q, d), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, d), lambda i: (0, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((b, d, m), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xs0, ws[None], wt, beta_t, z_t, us[None], geom[None])


@functools.partial(jax.jit, static_argnames=("kernel_name", "interpret"))
def pallas_descent_grad(xs: jax.Array, ws: jax.Array, wt: jax.Array,
                        beta_t: jax.Array, z_t: jax.Array, us: jax.Array,
                        kernel_name: str = "matern_2.5",
                        interpret: bool = False) -> jax.Array:
    """Fused inner-descent ascent direction (scaled coordinates).

    xs: (B, d, M) scaled descent points (M padded to 128 multiple by the
    caller); ws: (d, Np); wt: (B, Wr, Np); beta_t: (B, q, M);
    z_t: (q, M); us: (B, q, d).  Returns (B, d, M) float32.
    """
    b, d, m = xs.shape
    q = z_t.shape[0]
    np_ = ws.shape[1]
    wr = wt.shape[1]
    kern = functools.partial(_descent_grad_kernel, kernel_name=kernel_name,
                             q=q, d=d)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, d, m), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, d, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, np_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wr, np_), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q, m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, d, m), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xs, ws, wt, beta_t, z_t, us)
