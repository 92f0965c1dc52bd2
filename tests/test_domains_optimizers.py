"""Domain geometry and multistart-SGA optimizer tests."""

import jax
import jax.numpy as jnp
import numpy as np

from cornell_moe_tpu.ops import optimizers
from cornell_moe_tpu.ops.domains import (RepeatedDomain,
                                         SimplexIntersectTensorProductDomain,
                                         TensorProductDomain)


def test_tensor_product_domain_basics():
    dom = TensorProductDomain.from_bounds([[0.0, 1.0], [-2.0, 3.0]])
    assert dom.dim == 2
    assert bool(dom.check_point_inside(jnp.asarray([0.5, 0.0])))
    assert not bool(dom.check_point_inside(jnp.asarray([1.5, 0.0])))

    pts = dom.generate_uniform_random_points_in_domain(
        jax.random.PRNGKey(0), 200)
    assert pts.shape == (200, 2)
    assert bool(jnp.all(dom.check_point_inside(pts)))


def test_latin_hypercube_stratification():
    dom = TensorProductDomain.from_bounds([[0.0, 1.0], [0.0, 10.0]])
    n = 16
    pts = np.asarray(dom.generate_latin_hypercube_points(
        jax.random.PRNGKey(1), n))
    # exactly one point per stratum per dimension
    for d, width in enumerate([1.0, 10.0]):
        strata = np.floor(pts[:, d] / width * n).astype(int)
        assert sorted(strata.tolist()) == list(range(n))


def test_limit_update_keeps_points_inside():
    dom = TensorProductDomain.from_bounds([[0.0, 1.0], [0.0, 1.0]])
    rng = np.random.default_rng(3)
    for _ in range(50):
        x = jnp.asarray(rng.random(2))
        dx = jnp.asarray(rng.standard_normal(2) * 2.0)
        step = dom.limit_update(0.9, x, dx)
        assert bool(dom.check_point_inside(x + step))
    # small steps are unmodified
    x = jnp.asarray([0.5, 0.5])
    dx = jnp.asarray([1e-3, -1e-3])
    np.testing.assert_allclose(np.asarray(dom.limit_update(1.0, x, dx)),
                               np.asarray(dx))


def test_limit_update_matches_reference_semantics():
    """|step| capped at max_relative_change * distance-to-nearest-wall."""
    dom = TensorProductDomain.from_bounds([[0.0, 1.0]])
    x = jnp.asarray([0.2])                  # dist to nearest wall = 0.2
    step = dom.limit_update(0.5, x, jnp.asarray([0.7]))
    np.testing.assert_allclose(np.asarray(step), [0.1])   # 0.5 * 0.2
    step = dom.limit_update(0.5, x, jnp.asarray([-0.7]))
    np.testing.assert_allclose(np.asarray(step), [-0.1])


def test_simplex_domain():
    dom = SimplexIntersectTensorProductDomain.from_bounds(
        [[0.0, 1.0], [0.0, 1.0]])
    assert bool(dom.check_point_inside(jnp.asarray([0.3, 0.3])))
    assert not bool(dom.check_point_inside(jnp.asarray([0.8, 0.8])))
    pts = dom.generate_uniform_random_points_in_domain(
        jax.random.PRNGKey(0), 50)
    assert bool(jnp.all(dom.check_point_inside(pts)))
    rng = np.random.default_rng(0)
    for _ in range(30):
        x = np.asarray(dom.clip(jnp.asarray(rng.random(2))))
        dx = jnp.asarray(rng.standard_normal(2))
        nxt = jnp.asarray(x) + dom.limit_update(0.9, jnp.asarray(x), dx)
        assert float(jnp.sum(nxt)) <= 1.0 + 1e-9
        assert bool(jnp.all(nxt >= -1e-12))


def test_repeated_domain():
    base = TensorProductDomain.from_bounds([[0.0, 1.0], [0.0, 1.0]])
    dom = RepeatedDomain(domain=base, num_repeats=3)
    pts = dom.generate_latin_hypercube_points(jax.random.PRNGKey(0), 5)
    assert pts.shape == (5, 3, 2)
    assert bool(jnp.all(dom.check_point_inside(pts)))


def test_multistart_sga_finds_quadratic_max():
    dom = TensorProductDomain.from_bounds([[-1.0, 2.0], [-1.0, 2.0]])
    target = jnp.asarray([0.7, 0.3])

    def vg(x):
        val = -jnp.sum((x - target) ** 2)
        return val, -2.0 * (x - target)

    params = optimizers.GradientDescentParameters(
        num_multistarts=8, max_num_steps=200, max_num_restarts=3,
        gamma=0.6, pre_mult=0.5, max_relative_change=1.0)
    starts = dom.generate_latin_hypercube_points(jax.random.PRNGKey(2), 8)
    res = optimizers.multistart_optimize(vg, dom, starts, params)
    np.testing.assert_allclose(np.asarray(res.best_point),
                               np.asarray(target), atol=1e-3)
    assert res.all_points.shape == (8, 2)


def test_multistart_sga_respects_domain():
    """Optimum outside the box -> solution lands on the boundary."""
    dom = TensorProductDomain.from_bounds([[0.0, 1.0]])
    target = jnp.asarray([2.0])

    def vg(x):
        return -jnp.sum((x - target) ** 2), -2.0 * (x - target)

    params = optimizers.GradientDescentParameters(
        num_multistarts=4, max_num_steps=300, max_num_restarts=2,
        gamma=0.6, pre_mult=0.3)
    starts = dom.generate_uniform_random_points_in_domain(
        jax.random.PRNGKey(0), 4)
    res = optimizers.multistart_optimize(vg, dom, starts, params)
    assert 0.99 < float(res.best_point[0]) <= 1.0


def test_multistart_multimodal_with_polyak_averaging():
    dom = TensorProductDomain.from_bounds([[-3.0, 3.0]])

    def f(x):
        # two peaks: higher one at +2
        return (jnp.exp(-4 * (x[0] - 2.0) ** 2) * 2.0
                + jnp.exp(-4 * (x[0] + 2.0) ** 2))

    vg = jax.value_and_grad(f)
    params = optimizers.GradientDescentParameters(
        num_multistarts=16, max_num_steps=150, max_num_restarts=2,
        num_steps_averaged=10, gamma=0.7, pre_mult=0.4)
    starts = dom.generate_latin_hypercube_points(jax.random.PRNGKey(5), 16)
    res = optimizers.multistart_optimize(vg, dom, starts, params)
    np.testing.assert_allclose(float(res.best_point[0]), 2.0, atol=5e-2)


def test_dumb_search_fallback():
    dom = TensorProductDomain.from_bounds([[-1.0, 1.0]])

    def vg(x):
        # gradient points away from the true max at 0.9 (adversarial)
        return jnp.exp(-100 * (x[0] - 0.9) ** 2), jnp.zeros_like(x)

    params = optimizers.GradientDescentParameters(
        num_multistarts=2, max_num_steps=5, max_num_restarts=1)
    starts = jnp.asarray([[-0.5], [-0.2]])
    search = jnp.linspace(-1, 1, 201)[:, None]
    res = optimizers.multistart_optimize_with_dumb_search_fallback(
        vg, dom, starts, search, params)
    np.testing.assert_allclose(float(res.best_point[0]), 0.9, atol=1e-2)


def test_newton_polish():
    dom = TensorProductDomain.from_bounds([[-2.0, 2.0], [-2.0, 2.0]])
    target = jnp.asarray([0.4, -0.6])

    def f(x):
        return -jnp.sum((x - target) ** 2)

    vg = jax.value_and_grad(f)
    params = optimizers.NewtonParameters(max_num_steps=40, time_factor=1.0,
                                         gamma=1.1)
    x = optimizers.newton_optimize(vg, dom, jnp.asarray([1.0, 1.0]), params)
    np.testing.assert_allclose(np.asarray(x), np.asarray(target), atol=1e-6)


def test_line_search_gradient_ascent():
    """Backtracking line search: converges on a quadratic and never
    accepts a worsening step on an adversarial objective."""
    dom = TensorProductDomain.from_bounds([[-2.0, 2.0], [-2.0, 2.0]])
    target = jnp.asarray([0.5, -0.3])

    def vg(x):
        return -jnp.sum((x - target) ** 2), -2.0 * (x - target)

    params = optimizers.GradientDescentParameters(
        num_multistarts=1, max_num_steps=60, max_num_restarts=1,
        gamma=0.3, pre_mult=2.0, max_relative_change=1.0)
    x = optimizers.gradient_ascent_line_search(
        vg, dom, jnp.asarray([-1.5, 1.5]), params)
    np.testing.assert_allclose(np.asarray(x), np.asarray(target),
                               atol=1e-2)

    # monotonicity: value at output >= value at start even with a huge
    # learning rate that plain GD would diverge under
    params_huge = optimizers.GradientDescentParameters(
        num_multistarts=1, max_num_steps=20, max_num_restarts=1,
        gamma=0.0, pre_mult=500.0, max_relative_change=10.0)
    x0 = jnp.asarray([-1.5, 1.5])
    x_ls = optimizers.gradient_ascent_line_search(vg, dom, x0, params_huge)
    assert float(vg(x_ls)[0]) >= float(vg(x0)[0])


def test_plane_geometry():
    from cornell_moe_tpu.utils.geometry import Plane

    n = np.array([0.6, 0.8])
    pl = Plane(n, point=np.array([1.0, 1.0]))
    assert abs(pl.orthogonal_distance_to_point([1.0, 1.0])) < 1e-12
    d = pl.orthogonal_distance_to_point([2.0, 2.0])
    np.testing.assert_allclose(d, 0.6 + 0.8, rtol=1e-12)
    proj = pl.orthogonal_projection_onto_plane([2.0, 2.0])
    assert abs(pl.orthogonal_distance_to_point(proj)) < 1e-12
    t = pl.distance_to_plane_along_vector([2.0, 2.0], [-0.6, -0.8])
    np.testing.assert_allclose(t, 1.4, rtol=1e-12)


def test_dummy_domain():
    from cornell_moe_tpu.ops.domains import DummyDomain

    dom = DummyDomain()
    pts = jnp.asarray([[5.0, -3.0], [100.0, 0.0]])
    assert bool(jnp.all(dom.check_point_inside(pts)))
    np.testing.assert_array_equal(np.asarray(dom.clip(pts)),
                                  np.asarray(pts))
    step = jnp.asarray([1.0, -2.0])
    np.testing.assert_array_equal(
        np.asarray(dom.limit_update(0.5, pts[0], step)), np.asarray(step))


def test_warm_multistart_outer_gd_matches_cold_exactly():
    """With a carry-ignoring objective, multistart_optimize_batched_warm
    must be the same outer-GD program as multistart_optimize_batched —
    including the edge cases where the warm path's first (cold-gradient)
    step interacts with Polyak averaging (num_steps_averaged ==
    max_num_steps) and where max_num_steps == 0 (no update at all)."""
    rng = np.random.default_rng(3)
    dom = TensorProductDomain.from_bounds([[-1.5, 2.0], [-2.0, 1.0]])
    target = jnp.asarray([0.3, -0.4])

    def vg(x):
        v = -jnp.sum((x - target) ** 2, axis=-1)
        return v, -2.0 * (x - target)

    def bvg_cold(x):
        v, g = vg(x)
        return v, g, x

    def bvg_warm(x, carry):
        v, g = vg(x)
        return v, g, carry

    starts = jnp.asarray(rng.uniform(-1.5, 1.0, size=(5, 2)))

    p_avg = optimizers.GradientDescentParameters(
        num_multistarts=5, max_num_steps=4, max_num_restarts=2,
        num_steps_averaged=4, gamma=0.7, pre_mult=0.3,
        max_relative_change=0.5)
    cold = optimizers.multistart_optimize_batched(vg, dom, starts, p_avg)
    warm = optimizers.multistart_optimize_batched_warm(
        bvg_cold, bvg_warm, dom, starts, p_avg)
    np.testing.assert_allclose(np.asarray(warm.all_points),
                               np.asarray(cold.all_points),
                               rtol=1e-13, atol=1e-15)
    np.testing.assert_allclose(np.asarray(warm.all_values),
                               np.asarray(cold.all_values),
                               rtol=1e-13, atol=1e-15)

    p_zero = optimizers.GradientDescentParameters(
        num_multistarts=5, max_num_steps=0, max_num_restarts=1,
        num_steps_averaged=0, gamma=0.7, pre_mult=0.3,
        max_relative_change=0.5)
    frozen = optimizers.multistart_optimize_batched_warm(
        bvg_cold, bvg_warm, dom, starts, p_zero)
    np.testing.assert_array_equal(np.asarray(frozen.all_points),
                                  np.asarray(starts))


def test_gated_batched_multistart_matches_scan_exactly():
    """conv_tol gating on the cold batched multistart: an unreachable
    tolerance (0.0) must reproduce the fixed-depth scan path bit-exactly
    (incl. the circular Polyak buffer); a loose tolerance exits early but
    still solves the quadratic."""
    rng = np.random.default_rng(4)
    dom = TensorProductDomain.from_bounds([[-1.5, 2.0], [-2.0, 1.0]])
    target = jnp.asarray([0.3, -0.4])

    def vg(x):
        v = -jnp.sum((x - target) ** 2, axis=-1)
        return v, -2.0 * (x - target)

    starts = jnp.asarray(rng.uniform(-1.5, 1.0, size=(6, 2)))
    p = optimizers.GradientDescentParameters(
        num_multistarts=6, max_num_steps=12, max_num_restarts=2,
        num_steps_averaged=3, gamma=0.7, pre_mult=0.3,
        max_relative_change=0.5)

    ungated = optimizers.multistart_optimize_batched(vg, dom, starts, p)
    gated0 = optimizers.multistart_optimize_batched(vg, dom, starts, p,
                                                    conv_tol=0.0)
    np.testing.assert_array_equal(np.asarray(ungated.all_points),
                                  np.asarray(gated0.all_points))

    gated = optimizers.multistart_optimize_batched(vg, dom, starts, p,
                                                   conv_tol=1e-2)
    np.testing.assert_allclose(np.asarray(gated.best_point),
                               np.asarray(target), atol=0.05)

    # no-averaging config exercises the width-1 buffer corner
    p_noavg = optimizers.GradientDescentParameters(
        num_multistarts=6, max_num_steps=12, max_num_restarts=1,
        num_steps_averaged=0, gamma=0.7, pre_mult=0.3,
        max_relative_change=0.5)
    u2 = optimizers.multistart_optimize_batched(vg, dom, starts, p_noavg)
    g2 = optimizers.multistart_optimize_batched(vg, dom, starts, p_noavg,
                                                conv_tol=0.0)
    np.testing.assert_array_equal(np.asarray(u2.all_points),
                                  np.asarray(g2.all_points))


def test_gated_vmapped_multistart_matches_scan_exactly():
    """conv_tol gating on the vmapped per-start GD (the q-EI seeding
    path): conv_tol=0.0 is bit-identical to the scan; a realistic
    tolerance exits per lane (vmapped while_loop masking) and still
    solves the quadratic."""
    rng = np.random.default_rng(5)
    dom = TensorProductDomain.from_bounds([[-1.5, 2.0], [-2.0, 1.0]])
    target = jnp.asarray([0.3, -0.4])

    def vg(x):
        return -jnp.sum((x - target) ** 2), -2.0 * (x - target)

    starts = jnp.asarray(rng.uniform(-1.5, 1.0, size=(7, 2)))
    p = optimizers.GradientDescentParameters(
        num_multistarts=7, max_num_steps=15, max_num_restarts=2,
        num_steps_averaged=4, gamma=0.7, pre_mult=0.3,
        max_relative_change=0.5)

    ungated = optimizers.multistart_optimize(vg, dom, starts, p)
    gated0 = optimizers.multistart_optimize(vg, dom, starts, p,
                                            conv_tol=0.0)
    np.testing.assert_array_equal(np.asarray(ungated.all_points),
                                  np.asarray(gated0.all_points))
    np.testing.assert_array_equal(np.asarray(ungated.all_values),
                                  np.asarray(gated0.all_values))

    gated = optimizers.multistart_optimize(vg, dom, starts, p,
                                           conv_tol=1e-2)
    np.testing.assert_allclose(np.asarray(gated.best_point),
                               np.asarray(target), atol=0.05)
