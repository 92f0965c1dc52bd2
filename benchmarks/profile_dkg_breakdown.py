"""Ablation breakdown of the d-KG chunk evaluation (verdict item 3).

MFU_r04 measured the d-KG suggest at 97% HBM-bandwidth utilization and
6.3x plain q-KG wall; the per-eval FLOP model says the fantasy-build
solve chain (6 forward + ~6 transposed-backward (N_ch, N_ch) HIGHEST
matmuls per hyper, N_ch = 500 * 3) should be ~96% of per-eval FLOPs —
but the cost-analysis byte count (22.9 GB/eval) is ~4x what those
matmuls alone stream.  Before optimizing, this harness measures where
the 28.6 ms warm-eval wall actually goes by timing standalone subgraphs
at the exact bench shapes:

  fantasy_fwd      _build_fantasy_model_batch forward only
  fantasy_vjp      value_and_grad of a scalar reduction of the fantasy
                   model (forward + solve-chain backward)
  eval_value       full KG chunk evaluation, value only (no outer grad)
  eval_vg_warm     full warm evaluation (value+grad, 1 inner step) —
                   the program the gated solver runs 41x per suggest
  eval_vg_cold     full cold evaluation (6-step inner descent seeding)

Each line reports wall, XLA cost-analysis FLOPs/bytes, and the implied
HBM time (bytes / 819 GB/s) so fwd/bwd and solve/descent splits are
read off by subtraction.

Run on the real chip:  python benchmarks/profile_dkg_breakdown.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from profile_mfu import PEAK_HBM, build_bench_problem, cost, timeit  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from cornell_moe_tpu.acquisition import knowledge_gradient as kg_mod
    from cornell_moe_tpu.acquisition.expected_improvement import (
        draw_antithetic_normals)
    from cornell_moe_tpu.config import enable_compilation_cache
    enable_compilation_cache()

    ds = (0, 1)
    p = build_bench_problem(gp_derivatives=ds)
    states, q = p["states"], p["q"]
    chunk = 25
    normals = draw_antithetic_normals(
        jax.random.PRNGKey(0), p["normals"].shape[0], q * (1 + len(ds)),
        dtype=p["normals"].dtype)
    chunk_starts = p["starts"][:chunk]

    def to_union(pts_batch):
        return pts_batch.reshape(pts_batch.shape[0], q, -1)

    results = {}
    REPS = 16

    def _looped(fn_of_pts):
        """Run fn 16x in-program on perturbed inputs (defeats CSE) so the
        ~30 ms tunnel dispatch floor amortizes away; the standalone
        single-dispatch wall is dispatch-dominated at these sizes."""
        from jax import lax

        def run(st, pts):
            def body(carry, i):
                out = fn_of_pts(st, pts + 1e-6 * i)
                s = jax.tree_util.tree_reduce(
                    lambda a, b: a + jnp.sum(b), out,
                    jnp.zeros((), pts.dtype))
                return carry + s, None
            tot, _ = lax.scan(body, jnp.zeros((), pts.dtype),
                              jnp.arange(REPS, dtype=pts.dtype))
            return tot
        return run

    def report(tag, wall, ca, looped_wall=None):
        entry = {
            "tag": tag, "wall_ms": round(wall * 1e3, 3),
            "xla_flops": ca["flops"], "xla_bytes": ca["bytes"],
            "hbm_implied_ms": round(ca["bytes"] / PEAK_HBM * 1e3, 3),
            "mxu_implied_ms": round(
                ca["flops"] / (197e12 / 6.0) * 1e3, 3),
        }
        if looped_wall is not None:
            entry["in_program_ms"] = round(looped_wall / REPS * 1e3, 3)
        results[tag] = entry
        print(json.dumps(entry), flush=True)

    # ---- fantasy build: forward only ---------------------------------
    def fantasy_fwd(st, pts_batch):
        unions = to_union(pts_batch)

        def one(s):
            mu_u, chol_u, v, _ = kg_mod._build_fantasy_model_batch(
                s, unions, ds)
            return (jnp.sum(mu_u) + jnp.sum(chol_u) + jnp.sum(v))

        return jnp.sum(jax.vmap(one)(st))

    c = jax.jit(fantasy_fwd).lower(states, chunk_starts).compile()
    wall, _ = timeit(c, states, chunk_starts)
    cl = jax.jit(_looped(fantasy_fwd)).lower(states, chunk_starts).compile()
    lwall, _ = timeit(cl, states, chunk_starts, reps=3)
    report("fantasy_fwd", wall, cost(c), lwall)

    # ---- fantasy build: forward + backward (solve-chain VJP) ---------
    # state stays a jit ARGUMENT (the 16 x 1512 x 1512 ensemble baked in
    # as a closure constant exceeds the tunnel's request-size limit)
    def fantasy_vjp(st, pts_batch):
        return jax.value_and_grad(fantasy_fwd, argnums=1)(st, pts_batch)

    c = jax.jit(fantasy_vjp).lower(states, chunk_starts).compile()
    wall, _ = timeit(c, states, chunk_starts)
    cl = jax.jit(_looped(fantasy_vjp)).lower(states, chunk_starts).compile()
    lwall, _ = timeit(cl, states, chunk_starts, reps=3)
    report("fantasy_vjp", wall, cost(c), lwall)

    # ---- full evaluation: value only ----------------------------------
    def eval_value(st, pts_batch):
        unions = to_union(pts_batch)
        kg = kg_mod.knowledge_gradient_mcmc_batch(
            st, unions, p["discrete"], normals, p["domain"],
            p["inner_cold"], p["best_so_far"], q,
            derivatives_to_sample=ds)
        return kg

    c = jax.jit(eval_value).lower(states, chunk_starts).compile()
    wall, _ = timeit(c, states, chunk_starts)
    cl = jax.jit(_looped(eval_value)).lower(states, chunk_starts).compile()
    lwall, _ = timeit(cl, states, chunk_starts, reps=3)
    report("eval_value_cold", wall, cost(c), lwall)

    # ---- full evaluations: value+grad, warm and cold ------------------
    def eval_vg_cold(st, pts_batch):
        return kg_mod.knowledge_gradient_mcmc_batch_vg_carry(
            st, pts_batch, p["discrete"], normals, p["domain"],
            p["inner_cold"], p["best_so_far"], q,
            derivatives_to_sample=ds)

    c_cold = jax.jit(eval_vg_cold).lower(states, chunk_starts).compile()
    wall, out = timeit(c_cold, states, chunk_starts)
    cl = jax.jit(_looped(eval_vg_cold)).lower(states,
                                              chunk_starts).compile()
    lwall, _ = timeit(cl, states, chunk_starts, reps=3)
    report("eval_vg_cold", wall, cost(c_cold), lwall)
    carry = out[2]

    def eval_vg_warm(st, pts_batch, carry):
        return kg_mod.knowledge_gradient_mcmc_batch_vg_carry(
            st, pts_batch, p["discrete"], normals, p["domain"],
            p["inner_warm"], p["best_so_far"], q,
            derivatives_to_sample=ds, inner_x0=carry,
            warm_mode="reseed")

    c_warm = jax.jit(eval_vg_warm).lower(states, chunk_starts,
                                         carry).compile()
    wall, _ = timeit(c_warm, states, chunk_starts, carry)
    cl = jax.jit(_looped(
        lambda st, pts: eval_vg_warm(st, pts, carry))).lower(
            states, chunk_starts).compile()
    lwall, _ = timeit(cl, states, chunk_starts, reps=3)
    report("eval_vg_warm", wall, cost(c_warm), lwall)

    # derived splits (in-program, dispatch-free)
    fb = results["fantasy_vjp"]["in_program_ms"]
    warm = results["eval_vg_warm"]["in_program_ms"]
    print(json.dumps({
        "tag": "derived",
        "fantasy_share_of_warm_eval": round(fb / warm, 3),
        "note": "fantasy_vjp approximates the solve-chain fwd+bwd cost "
                "inside every warm evaluation; the remainder is descent "
                "+ seeding + live scoring",
    }), flush=True)

    out_path = os.path.join(os.path.dirname(__file__),
                            "DKG_BREAKDOWN_r05.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"# wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
