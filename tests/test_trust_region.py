"""Trust-region subproblem tests (reference test/test_trust_region_utils.jl).

The exact solver is validated against a brute-force bisection oracle on
random instances and hand-computed cases.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from firstorderlp_tpu.trust_region import (
    bound_optimal_objective,
    solve_bound_constrained_trust_region,
)
from firstorderlp_tpu.ops.device_problem import to_device

from fixtures import example_lp


def oracle_tr(center, g, lb, ub, w, radius, tol=1e-12):
    """Brute-force: bisect on t for x(t) = clamp(c - t g / w) with
    ||x(t) - c||_w = radius."""
    center = np.asarray(center, float)
    g = np.asarray(g, float)
    frozen = ((center >= ub) & (g <= 0)) | ((center <= lb) & (g >= 0))
    d = np.where(frozen, 0.0, -g / w)

    def radius_at(t):
        x = np.clip(center + t * d, lb, ub)
        return np.sqrt(np.sum(w * (x - center) ** 2))

    if radius == 0 or np.linalg.norm(g) == 0:
        return center.copy()
    hi = 1.0
    while radius_at(hi) < radius and hi < 1e18:
        hi *= 2.0
    if radius_at(hi) < radius:
        # Unreachable radius: all bounds hit; t = max breakpoint.
        t = hi
    else:
        lo = 0.0
        for _ in range(200):
            mid = 0.5 * (lo + hi)
            if radius_at(mid) < radius:
                lo = mid
            else:
                hi = mid
        t = 0.5 * (lo + hi)
    return np.clip(center + t * d, lb, ub)


def check_case(center, g, lb, ub, w, radius):
    result = solve_bound_constrained_trust_region(
        jnp.asarray(center, jnp.float64),
        jnp.asarray(g, jnp.float64),
        jnp.asarray(lb, jnp.float64),
        jnp.asarray(ub, jnp.float64),
        jnp.asarray(w, jnp.float64),
        jnp.asarray(radius, jnp.float64),
    )
    expected = oracle_tr(center, g, lb, ub, w, radius)
    got = np.asarray(result.solution)
    np.testing.assert_allclose(got, expected, atol=1e-7)
    np.testing.assert_allclose(
        float(result.value),
        float(np.dot(g, expected - np.asarray(center))),
        atol=1e-7,
    )


def test_unconstrained_ball():
    # No bounds: solution = center - r * g / (w |g / sqrt(w)|).
    center = [0.0, 0.0]
    g = [3.0, 4.0]
    check_case(center, g, [-np.inf] * 2, [np.inf] * 2, [1.0, 1.0], 2.0)


def test_hits_bound_before_radius():
    # One variable clamps at its bound; remaining budget goes to other.
    check_case(
        [0.0, 0.0],
        [1.0, 1.0],
        [-0.1, -np.inf],
        [np.inf, np.inf],
        [1.0, 1.0],
        5.0,
    )


def test_all_bounds_hit():
    # Box smaller than radius: all variables stop at their bounds.
    check_case(
        [0.0, 0.0],
        [1.0, 2.0],
        [-1.0, -1.0],
        [1.0, 1.0],
        [1.0, 1.0],
        100.0,
    )


def test_zero_radius_and_zero_gradient():
    result = solve_bound_constrained_trust_region(
        jnp.asarray([1.0, 2.0]),
        jnp.asarray([1.0, 1.0]),
        jnp.asarray([-np.inf, -np.inf]),
        jnp.asarray([np.inf, np.inf]),
        jnp.asarray([1.0, 1.0]),
        jnp.asarray(0.0),
    )
    np.testing.assert_allclose(np.asarray(result.solution), [1.0, 2.0])
    assert float(result.value) == 0.0

    result = solve_bound_constrained_trust_region(
        jnp.asarray([1.0, 2.0]),
        jnp.asarray([0.0, 0.0]),
        jnp.asarray([-np.inf, -np.inf]),
        jnp.asarray([np.inf, np.inf]),
        jnp.asarray([1.0, 1.0]),
        jnp.asarray(3.0),
    )
    np.testing.assert_allclose(np.asarray(result.solution), [1.0, 2.0])


def test_weighted_norm():
    check_case(
        [0.5, -0.5, 2.0],
        [1.0, -2.0, 0.5],
        [0.0, -1.0, -np.inf],
        [3.0, 1.0, 2.5],
        [2.0, 0.5, 4.0],
        1.3,
    )


def test_frozen_at_bound_pushing_outward():
    # center at upper bound with negative gradient: frozen.
    check_case(
        [1.0, 0.0],
        [-1.0, 1.0],
        [0.0, -np.inf],
        [1.0, np.inf],
        [1.0, 1.0],
        2.0,
    )


@pytest.mark.parametrize("seed", range(8))
def test_random_against_oracle(seed):
    rng = np.random.default_rng(seed)
    n = 50
    center = rng.standard_normal(n)
    g = rng.standard_normal(n)
    w = np.exp(rng.standard_normal(n))
    lb = center - np.abs(rng.standard_normal(n))
    ub = center + np.abs(rng.standard_normal(n))
    # Some infinite bounds.
    lb[rng.random(n) < 0.3] = -np.inf
    ub[rng.random(n) < 0.3] = np.inf
    radius = float(np.abs(rng.standard_normal())) + 0.1
    check_case(center, g, lb, ub, w, radius)


def test_approximate_variant_matches_reference_formula():
    center = np.array([0.0, 1.0])
    g = np.array([1.0, -1.0])
    lb = np.array([-np.inf, 0.0])
    ub = np.array([np.inf, 1.0])
    w = np.array([1.0, 4.0])
    radius = 2.0
    result = solve_bound_constrained_trust_region(
        jnp.asarray(center),
        jnp.asarray(g),
        jnp.asarray(lb),
        jnp.asarray(ub),
        jnp.asarray(w),
        jnp.asarray(radius),
        solve_approximately=True,
    )
    # Second coordinate frozen (at ub, gradient negative pushes up).
    direction = np.array([-1.0, 0.0])
    direction *= radius / np.sqrt(np.sum(w * direction**2))
    np.testing.assert_allclose(
        np.asarray(result.solution), center + direction
    )


def test_bound_optimal_objective_lp_at_optimum():
    """At the exact optimum with a tiny ball, gap should be ~0."""
    problem = to_device(example_lp())
    x_opt = jnp.asarray([1.0, 0.0, 6.0, 2.0])
    y_opt = jnp.asarray([0.5, 4.0, 0.0])
    bound = bound_optimal_objective(
        problem,
        x_opt,
        y_opt,
        jnp.ones(4),
        jnp.ones(3),
        jnp.asarray(1e-3),
        use_max_norm=False,
    )
    assert float(bound.lagrangian_value) == pytest.approx(-1.0, abs=1e-9)
    assert float(bound.gap) == pytest.approx(0.0, abs=1e-2)
    assert float(bound.lower_bound_value) <= -1.0 + 1e-9
    assert float(bound.upper_bound_value) >= -1.0 - 1e-9


def test_bound_optimal_objective_max_norm_brackets_optimum():
    problem = to_device(example_lp())
    x = jnp.asarray([0.5, 0.5, 5.0, 1.0])
    y = jnp.asarray([0.0, 1.0, 0.5])
    bound = bound_optimal_objective(
        problem,
        x,
        y,
        jnp.ones(4),
        jnp.ones(3),
        jnp.asarray(50.0),
        use_max_norm=True,
    )
    # With a big enough ball the bounds must bracket the true optimum -1.
    assert float(bound.lower_bound_value) <= -1.0 + 1e-6
    assert float(bound.upper_bound_value) >= -1.0 - 1e-6


def test_bisect_matches_sorted_f32():
    """The f32 float-bit bisection and the f64-path sort+prefix-sum
    knot search are the same exact algorithm; on identical f32 inputs
    their t* must agree to f32 roundoff (regression: the dtype dispatch
    exists because the bisection's s64 bitcast cannot compile under TPU
    x64 emulation)."""
    from firstorderlp_tpu.trust_region import (
        _t_star_bisect,
        _t_star_sorted,
    )

    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(3, 60))
        tau = np.abs(rng.normal(size=n)).astype(np.float32)
        tau[rng.random(n) < 0.2] = np.inf
        tau[rng.random(n) < 0.2] = 0.0
        a = np.abs(rng.normal(size=n)).astype(np.float32)
        r2 = np.float32(np.abs(rng.normal()) * 2.0)
        tb = float(_t_star_bisect(jnp.asarray(tau), jnp.asarray(a), r2))
        ts = float(_t_star_sorted(jnp.asarray(tau), jnp.asarray(a), r2))
        np.testing.assert_allclose(tb, ts, rtol=1e-5, atol=1e-6)
