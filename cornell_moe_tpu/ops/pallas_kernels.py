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


def pallas_available_for(x: jax.Array, derivatives) -> bool:
    """Gate: TPU backend, float32, value-only channels, worthwhile size."""
    try:
        on_tpu = jax.default_backend() == "tpu"
    except RuntimeError:
        return False
    return (on_tpu and x.dtype == jnp.float32 and len(derivatives) == 0
            and x.shape[0] >= 256)
