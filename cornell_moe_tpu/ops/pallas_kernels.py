"""Pallas TPU kernels for the GP hot ops.

Three kernel families, each targeting a measured hot spot:

* ``pallas_covariance_with_noise_full`` — fused K build + noise diagonal
  as one program per matrix, used by the fit/LML paths at n <= 768 where
  per-op pipeline overhead dominates XLA's broadcast chain.  (A tiled
  Gram-trick variant for larger n measured 0.95x vs XLA at 2048^2 —
  the op is VPU-transcendental-bound either way — and was removed;
  larger builds use the XLA builder.)
* ``pallas_lml_fused`` — the MCMC chain's batched LML: K build +
  depth-2 blocked Cholesky + forward substitution + logdet in one
  program per walker batch (0.74 ms vs XLA's 1.50 ms at (8, 512), K
  build included).  A panel-hybrid splitting Pallas panels from XLA
  trailing updates measured 1.15 ms and was removed once this landed.
* ``pallas_descent_run`` / ``pallas_descent_grad`` — the KG inner
  posterior-mean descent, the throughput core of the suggest bench.

Gates keep every kernel off non-TPU backends, f64, and derivative
channels; the XLA paths remain the equivalence oracles.
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
# Fully-fused LML kernel: K build + blocked Cholesky + solve + logdet
# ---------------------------------------------------------------------------
#
# One program per WB-walker batch; everything lives in VMEM: build K +
# noise diagonal, factor it with a depth-2 blocked right-looking
# Cholesky (32-column blocks: the latency-critical scalar chain runs on
# (WB, 32, 32) tensors, the rank-32 trailing/off-diagonal updates are
# per-walker MXU dots over STATIC block slices), forward-substitute y in
# lockstep, and emit only (quad, logdet).  This replaces the round-2
# fused kernel that NaN'd in the compiled Mosaic lowering — every store
# here is a static slice and every column update is a one-hot/mask
# algebra op (no dynamic indexing anywhere), the idioms the working
# descent/panel kernels already established.

_LML_SB = 32      # inner block width (v5e sweep: 16 -> 0.93 ms, 32 -> 0.74 ms, 64 -> 0.89 ms)

# Row-panel sizes bounding the kernel's live temporaries so large Np
# compiles (the round-3 cutoff at Np >= 1024 was the K-build's full
# (Np, Np) diff/field temporaries plus the trailing Schur update's
# (rem, rem) product exceeding VMEM, NOT a_scr itself): K is built
# _LML_BUILD_PANEL rows at a time ((panel, Np) temps) and the trailing
# update subtracts in _LML_TRAIL_PANEL-row slabs ((panel, rem) temps).
# Element-for-element identical math to the unpaneled build/update.
_LML_BUILD_PANEL = 256
_LML_TRAIL_PANEL = 256


def _lml_fused_kernel(us_ref, alpha_ref, noise_ref, y_ref, quad_ref,
                      logdet_ref, a_scr, y_scr, *, kernel_name, d,
                      n_real, np_, wb):
    sb = _LML_SB
    bp = min(_LML_BUILD_PANEL, np_)
    jj = jax.lax.broadcasted_iota(jnp.int32, (bp, np_), 1)
    ii0 = jax.lax.broadcasted_iota(jnp.int32, (bp, np_), 0)
    # --- build K + diag(noise) per walker, bp rows at a time -----------
    for w in range(wb):
        for p0 in range(0, np_, bp):
            s = None
            for dd in range(d):
                u = us_ref[0, w, dd, :]              # (Np,)
                diff = u[p0:p0 + bp][:, None] - u[None, :]
                s = diff * diff if s is None else s + diff * diff
            if kernel_name == "square_exponential":
                k = jnp.exp(-0.5 * s)
            else:                                    # matern 2.5
                r = jnp.sqrt(s)
                k = (1.0 + _SQRT5 * r + (5.0 / 3.0) * s) * \
                    jnp.exp(-_SQRT5 * r)
            eye_mask = ((ii0 + p0) == jj).astype(jnp.float32)
            a_scr[w, p0:p0 + bp, :] = alpha_ref[0, 0, w] * k + \
                eye_mask * noise_ref[0, w][p0:p0 + bp][:, None]
    y_scr[:] = y_ref[0]

    iota32 = jax.lax.broadcasted_iota(jnp.int32, (sb, 1), 0)[:, 0]
    eye32 = (iota32[:, None] == iota32[None, :]).astype(jnp.float32)
    quad = jnp.zeros((wb,), jnp.float32)
    logdet = jnp.zeros((wb,), jnp.float32)

    for b in range(np_ // sb):                       # static block loop
        c0 = b * sb
        d0 = a_scr[:, c0:c0 + sb, c0:c0 + sb]        # (wb, 32, 32)

        # Column update in reciprocal form: one rsqrt replaces the
        # sqrt + two divides (VPU divides are multi-pass), and the
        # pivot carry is gone entirely — diag(L11^-1) = 1/diag(L11),
        # so logdet is read off `inv` after the loop.  The column loop
        # body is unrolled 2x (col2) to halve the Mosaic fori_loop
        # per-iteration overhead on this latency-bound chain.
        def col(j, carry):
            dmat, rres, inv = carry
            onehot = (iota32 == j).astype(jnp.float32)
            below = (iota32 > j).astype(jnp.float32)
            cj = jnp.sum(dmat * onehot[None, None, :], axis=2)
            dsq = jnp.sum(cj * onehot[None, :], axis=1)
            rpiv = jax.lax.rsqrt(dsq)
            lcol = cj * below[None, :] * rpiv[:, None]
            rj = jnp.sum(rres * onehot[None, :, None], axis=1)
            sj = rj * rpiv[:, None]
            inv = inv + onehot[None, :, None] * sj[:, None, :]
            rres = rres - lcol[:, :, None] * sj[:, None, :]
            dmat = dmat - lcol[:, :, None] * lcol[:, None, :]
            return (dmat, rres, inv)

        def col2(j2, carry):
            return col(2 * j2 + 1, col(2 * j2, carry))

        _, _, inv = jax.lax.fori_loop(
            0, sb // 2, col2,
            (d0, jnp.broadcast_to(eye32[None], (wb, sb, sb)),
             jnp.zeros((wb, sb, sb), jnp.float32)))

        yblk = y_scr[:, c0:c0 + sb]                  # (wb, 32)
        z = jnp.sum(inv * yblk[:, None, :], axis=2)  # z = L11^-1 y_blk
        mask = ((c0 + iota32) < n_real).astype(jnp.float32)
        quad = quad + jnp.sum(z * z * mask[None], axis=1)
        rdiag = jnp.sum(inv * eye32[None], axis=2)   # 1 / diag(L11)
        logdet = logdet - jnp.sum(jnp.log(rdiag) * mask[None], axis=1)

        if c0 + sb < np_:
            # t = L11^-T z, batched over walkers on the VPU, so the
            # trailing y update a21 @ t rides the L21 dot as one extra
            # output column instead of costing a third MXU dot per
            # walker (the trailing dots are issue-bound, not FLOP-bound:
            # sb=16's doubled dot count measured 0.93 ms vs 0.74 ms).
            t = jnp.sum(inv * z[:, :, None], axis=1)         # (wb, 32)
            for w in range(wb):
                a21 = a_scr[w, c0 + sb:, c0:c0 + sb]         # (rem, 32)
                # L21 = A21 L11^-T: contract a21 cols with inv cols
                # (row 32 of the stacked operand carries t, so column
                # 32 of the output is the y-forward-substitution term).
                # Explicit precision: the MXU's default bf16 multiplies
                # carry ~1e-2 relative error, enough to drive trailing
                # Schur diagonals negative -> sqrt NaN (the round-2
                # fused kernel's multi-panel failure mode; its
                # single-panel case worked because it had no trailing
                # dots).  HIGHEST = bf16x6; Mosaic rejects HIGH, and the
                # MXU passes are not the bottleneck here anyway
                # (0.74 ms total vs XLA's 1.50 ms at (8, 512)).
                invt = jnp.concatenate([inv[w], t[w][None, :]], axis=0)
                l21e = jax.lax.dot_general(
                    a21, invt,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)      # (rem, 33)
                l21 = l21e[:, :sb]
                # trailing Schur update in row slabs: bounds the live
                # product temporary to (panel, rem) instead of
                # (rem, rem) — the (rem, rem) form was the other VMEM
                # blocker above Np = 896 (each output row's dot is
                # unchanged, so the slabbed update is bit-identical)
                rem = np_ - (c0 + sb)
                for r0 in range(0, rem, _LML_TRAIL_PANEL):
                    tp = min(_LML_TRAIL_PANEL, rem - r0)
                    upd = jax.lax.dot_general(
                        l21[r0:r0 + tp], l21,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)  # (tp, rem)
                    a_scr[w, c0 + sb + r0:c0 + sb + r0 + tp, c0 + sb:] = \
                        a_scr[w, c0 + sb + r0:c0 + sb + r0 + tp,
                              c0 + sb:] - upd
                y_scr[w, c0 + sb:] = y_scr[w, c0 + sb:] - l21e[:, sb]

    quad_ref[0, 0, :] = quad
    logdet_ref[0, 0, :] = logdet


@functools.partial(jax.jit, static_argnames=("kernel_name", "n_real",
                                             "wb", "interpret"))
def pallas_lml_fused(us: jax.Array, alpha: jax.Array,
                     noise_vec: jax.Array, y: jax.Array,
                     kernel_name: str = "matern_2.5",
                     n_real: int = None, wb: int = 8,
                     interpret: bool = False):
    """(y^T K^-1 y, sum log diag chol K) fully fused in one program/WB.

    us: (W, d, Np) scaled points (padded columns at distinct huge
    offsets); alpha: (W,); noise_vec: (W, Np) total per-point diagonal
    noise (huge on padding); y: (W, Np) centered values (zero on
    padding).  Np a multiple of 128; W a multiple of wb.
    """
    w, d, np_ = us.shape
    grid = w // wb
    quad, logdet = pl.pallas_call(
        functools.partial(_lml_fused_kernel, kernel_name=kernel_name,
                          d=d, n_real=n_real, np_=np_, wb=wb),
        out_shape=(jax.ShapeDtypeStruct((grid, 1, wb), jnp.float32),
                   jax.ShapeDtypeStruct((grid, 1, wb), jnp.float32)),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, wb, d, np_), lambda i: (i, 0, 0, 0),
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
            pltpu.VMEM((wb, np_), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=14 * 1024 * 1024),
        interpret=interpret,
    )(us.astype(jnp.float32).reshape(grid, wb, d, np_),
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
