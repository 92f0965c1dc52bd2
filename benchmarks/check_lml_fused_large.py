"""Dev check: the panel-built fused LML kernel ABOVE the round-3 cutoff.

Round 3 measured every padded size >= 1024 failing to Mosaic-compile;
the round-5 rebuild panels the K build ((panel, Np) temps instead of
(Np, Np)) and slabs the trailing Schur update ((panel, rem) instead of
(rem, rem)), leaving a_scr as the only O(Np^2) VMEM resident — which
fits to Np ~= 1536 at wb=1.  This probe compile-checks each candidate
size on the real chip, validates against numpy, and times the fused
path vs the XLA batched-Cholesky fallback at chain shapes.

Run on the TPU tunnel:  python benchmarks/check_lml_fused_large.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from cornell_moe_tpu.config import enable_compilation_cache
from cornell_moe_tpu.ops import pallas_kernels as pk

enable_compilation_cache()
rng = np.random.default_rng(0)
W = 16
results = {}

for N, wb in ((1024, 2), (1024, 1), (1280, 1), (1536, 1), (1792, 1)):
    n_real = N - 16
    xs, a, y = [], np.zeros((W, N, N)), np.zeros((W, N))
    for w in range(W):
        x = rng.random((n_real, 2))
        xs.append(x)
    us_np = np.zeros((W, 2, N), np.float32)
    nv = np.zeros((W, N), np.float32)
    for w in range(W):
        us_np[w, :, :n_real] = (xs[w] / 0.3).T
        us_np[w, :, n_real:] = 1e6 * (np.arange(N - n_real) + 1)[None, :]
        nv[w, :n_real] = 1e-2
        nv[w, n_real:] = 1e8
        y[w, :n_real] = rng.standard_normal(n_real)
    usj = jnp.asarray(us_np)
    nvj = jnp.asarray(nv)
    yj = jnp.asarray(y, jnp.float32)
    alj = jnp.full((W,), 1.3, jnp.float32)

    tag = f"N={N},wb={wb}"
    try:
        t0 = time.time()
        qf, ldf = jax.block_until_ready(pk.pallas_lml_fused(
            usj, alj, nvj, yj, "square_exponential", n_real=n_real,
            wb=wb))
        compile_s = time.time() - t0
    except Exception as e:  # Mosaic compile failure is the datum here
        results[tag] = {"compiles": False,
                        "error": str(e).splitlines()[0][:200]}
        print(json.dumps({"tag": tag, **results[tag]}), flush=True)
        continue

    # correctness vs numpy f64 on 3 members
    max_rel = 0.0
    for w in range(3):
        d2 = ((xs[w][:, None, :] - xs[w][None, :, :]) ** 2).sum(-1)
        k = 1.3 * np.exp(-0.5 * d2 / 0.3**2) + 1e-2 * np.eye(n_real)
        chol = np.linalg.cholesky(k)
        z = np.linalg.solve(chol, y[w, :n_real])
        q_ref, ld_ref = float(z @ z), float(np.log(np.diag(chol)).sum())
        max_rel = max(max_rel,
                      abs(float(qf[w]) - q_ref) / max(abs(q_ref), 1),
                      abs(float(ldf[w]) - ld_ref) / max(abs(ld_ref), 1))

    # chain-shaped timing: 50 fused evals in one program vs XLA chol
    def fused_scan(us0):
        def body(c, _):
            q, ld = pk.pallas_lml_fused(c, alj, nvj, yj,
                                        "square_exponential",
                                        n_real=n_real, wb=wb)
            return c + (jnp.sum(q) + jnp.sum(ld)) * 1e-20, None
        return lax.scan(body, us0, None, length=50)[0]

    for w in range(W):
        d2 = ((xs[w][:, None, :] - xs[w][None, :, :]) ** 2).sum(-1)
        a[w, :n_real, :n_real] = \
            1.3 * np.exp(-0.5 * d2 / 0.3**2) + 1e-2 * np.eye(n_real)
        a[w, np.arange(n_real, N), np.arange(n_real, N)] = 1e8
    aj = jnp.asarray(a, jnp.float32)

    def xla_scan(a0):
        def body(c, _):
            chol = jnp.linalg.cholesky(c)
            z = jax.scipy.linalg.solve_triangular(
                chol, yj[..., None], lower=True)[..., 0]
            q = jnp.sum(z * z, axis=1)
            ld = jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)),
                         axis=1)
            return c + (jnp.sum(q) + jnp.sum(ld)) * 1e-20, None
        return lax.scan(body, a0, None, length=50)[0]

    entry = {"compiles": True, "max_rel_dev_vs_numpy": round(max_rel, 6),
             "compile_s": round(compile_s, 1)}
    for name, fn, arg in (("fused_ms", fused_scan, usj),
                          ("xla_ms", xla_scan, aj)):
        f = jax.jit(fn)
        jax.block_until_ready(f(arg))
        ts = []
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(f(arg))
            ts.append(time.time() - t0)
        entry[name] = round(min(ts) / 50 * 1000, 3)
    entry["speedup"] = round(entry["xla_ms"] / entry["fused_ms"], 2)
    results[tag] = entry
    print(json.dumps({"tag": tag, **entry}), flush=True)

out = os.path.join(os.path.dirname(__file__), "LML_LARGE_r05.json")
with open(out, "w") as f:
    json.dump(results, f, indent=1)
print(f"# wrote {out}", file=sys.stderr)
