"""Dev check: fused LML kernel (interpret) vs numpy reference."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from cornell_moe_tpu.ops import pallas_kernels as pk

rng = np.random.default_rng(0)
W, n, d = 8, 37, 2
np_ = 128
x = rng.random((n, d)).astype(np.float32)
lengths = (0.3 + 0.4 * rng.random((W, d))).astype(np.float32)
alphas = (0.8 + rng.random(W)).astype(np.float32)
noises = (1e-2 + 1e-2 * rng.random(W)).astype(np.float32)
y = np.sin(3 * x[:, 0]).astype(np.float32)

us = np.zeros((W, d, np_), np.float32)
noise_vec = np.zeros((W, np_), np.float32)
y_pad = np.zeros((W, np_), np.float32)
for w in range(W):
    us[w, :, :n] = (x / lengths[w]).T
    us[w, :, n:] = 1e6 * (np.arange(np_ - n) + 1)[None, :]
    noise_vec[w, :n] = noises[w]
    noise_vec[w, n:] = 1e8
    y_pad[w, :n] = y

quad, logdet = pk.pallas_lml_quad_logdet(
    jnp.asarray(us), jnp.asarray(alphas), jnp.asarray(noise_vec),
    jnp.asarray(y_pad), "matern_2.5", n_real=n, wb=4, interpret=True)

S5 = np.sqrt(5.0)
for w in range(W):
    diff = (x[:, None, :] - x[None, :, :]) / lengths[w]
    s = np.sum(diff * diff, -1)
    r = np.sqrt(s)
    K = alphas[w] * (1 + S5 * r + 5 * s / 3) * np.exp(-S5 * r) + \
        noises[w] * np.eye(n)
    L = np.linalg.cholesky(K.astype(np.float64))
    ref_logdet = np.sum(np.log(np.diag(L)))
    z = np.linalg.solve(L, y.astype(np.float64))
    ref_quad = float(z @ z)
    eq = abs(float(quad[w]) - ref_quad) / max(abs(ref_quad), 1)
    el = abs(float(logdet[w]) - ref_logdet) / max(abs(ref_logdet), 1)
    print(f"w={w}: quad {float(quad[w]):.6f} vs {ref_quad:.6f} "
          f"(rel {eq:.2e}); logdet {float(logdet[w]):.6f} vs "
          f"{ref_logdet:.6f} (rel {el:.2e})")
    assert eq < 5e-4 and el < 5e-4
print("OK")
