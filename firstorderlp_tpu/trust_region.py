"""Bound-constrained trust-region subproblem, solved with static shapes.

Solves
    argmin_x  g' x
    s.t.      l <= x <= u,  ||x - center||_w <= r            (1)
where ||v||_w = sqrt(sum_i w_i v_i^2), by parameterizing
x(t) = clamp(center - t * g / w, l, u) and finding the t at which the
weighted radius equals r.

The reference (src/trust_region_utils.jl:68-192) solves this with an
iterative median-of-breakpoints elimination - a data-dependent loop that
does not map to XLA. Here the same exact solution is obtained with
static shapes, two ways by dtype:

  radius^2(t) = sum_i a_i * min(t, tau_i)^2,   a_i = w_i d_i^2,
  with d_i the (masked) movement direction and tau_i the breakpoint at
  which component i hits its bound; radius^2 is nondecreasing in t and
  piecewise quadratic with knots at the tau.

- f32 (the fleet hot path): 31 bisection steps on the float bit pattern
  of t, two masked reductions each, isolating the exact segment
  containing r^2; then t* solves S + t^2 H = r^2 there. No TPU sort -
  the sort measured 7.6 ms for a (40k, 128-lane) vmapped solve.
- f64: one multi-operand sort + prefix sums + first-true search. The
  bisection's s64 bitcast has no rewriting rule under TPU x64
  emulation (hard compile error), and f64 is off the hot path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TrustRegionResult(NamedTuple):
    solution: jnp.ndarray
    value: jnp.ndarray  # g' (solution - center)


def solve_bound_constrained_trust_region(
    center_point,
    objective_vector,
    variable_lower_bounds,
    variable_upper_bounds,
    norm_weights,
    target_radius,
    solve_approximately: bool = False,
) -> TrustRegionResult:
    if solve_approximately:
        return _approximate_trust_region(
            center_point,
            objective_vector,
            variable_lower_bounds,
            variable_upper_bounds,
            norm_weights,
            target_radius,
        )

    g = objective_vector
    c = center_point
    lb = variable_lower_bounds
    ub = variable_upper_bounds
    w = norm_weights

    # Components already at a bound with the objective pushing outward do
    # not move (reference l.95-102).
    frozen = ((c >= ub) & (g <= 0.0)) | ((c <= lb) & (g >= 0.0))
    direction = jnp.where(frozen, 0.0, -g / w)

    # Breakpoint at which each component hits its bound; 0 for components
    # that don't move (reference l.105-116).
    tau = jnp.where(
        direction > 0,
        (ub - c) / jnp.where(direction > 0, direction, 1.0),
        jnp.where(
            direction < 0,
            (lb - c) / jnp.where(direction < 0, direction, 1.0),
            0.0,
        ),
    )
    a = w * direction * direction  # radius^2 growth coefficient per component
    target_r2 = target_radius * target_radius

    # Two exact knot searches for the same piecewise-quadratic
    # r^2(t) = S(t) + t^2 H(t), S = sum_{tau<=t} a tau^2 (clamped),
    # H = sum_{tau>t} a (still moving):
    # - f32: bisection on the float bit pattern of t (31 fixed trips of
    #   two masked reductions; no TPU sort - the sort measured 7.6 ms
    #   for a (40k, 128-lane) vmapped solve, 35% of fleet device time).
    # - f64: sort + prefix sums. The bisection's s64 bitcast has no
    #   x64-emulation rewriting rule on TPU (compile error), and f64
    #   solves are off the fleet hot path the bisection exists for.
    if tau.dtype == jnp.float32:
        t_star = _t_star_bisect(tau, a, target_r2)
    else:
        t_star = _t_star_sorted(tau, a, target_r2)

    # Degenerate cases: zero radius or zero objective -> stay at center
    # (reference l.88-91).
    degenerate = (target_radius <= 0.0) | (
        jnp.sum(g * g) == 0.0
    )
    t_star = jnp.where(degenerate, 0.0, t_star)

    solution = jnp.clip(c + t_star * direction, lb, ub)
    value = jnp.sum(g * (solution - c))
    return TrustRegionResult(solution=solution, value=value)


def _t_star_bisect(tau, a, target_r2):
    """Exact knot search by bisection on the float bits of t. For
    nonnegative floats the IEEE bit pattern orders like the value, so
    integer bisection over [0, bits(max finite tau)] isolates the EXACT
    segment [tau_(k-1), tau_k) containing the target radius: the
    largest float v with r^2(v) < r^2 yields the same S, H as the
    sorted method's segment sums (reference trust_region_utils.jl:
    126-181; duplicate knots share one r^2 value so the
    strict-inequality set is segment-consistent). f32 only: the s64
    bitcast does not lower under TPU x64 emulation."""
    tau = jnp.maximum(tau, 0.0)  # normalize -0.0 so bit ordering holds
    finite = jnp.isfinite(tau)
    dt = tau.dtype
    a_total = jnp.sum(a)
    a_finite_total = jnp.sum(jnp.where(finite, a, 0.0))
    s_total = jnp.sum(jnp.where(finite, a * tau * tau, 0.0))
    h_infinite = a_total - a_finite_total
    tau_max = jnp.max(jnp.where(finite, tau, 0.0), initial=0.0)

    def r2_parts(t):
        clamped = finite & (tau <= t)
        s = jnp.sum(jnp.where(clamped, a * tau * tau, 0.0))
        h = a_total - jnp.sum(jnp.where(clamped, a, 0.0))
        return s, h

    def bisect_body(_, lo_hi):
        lo, hi = lo_hi
        mid = lo + ((hi - lo + 1) >> 1)
        t = jax.lax.bitcast_convert_type(mid, dt)
        s, h = r2_parts(t)
        below = s + t * t * h < target_r2
        return (
            jnp.where(below, mid, lo),
            jnp.where(below, hi, mid - 1),
        )

    hi0 = jax.lax.bitcast_convert_type(tau_max.astype(dt), jnp.int32)
    lo, _ = jax.lax.fori_loop(
        0, 31, bisect_body, (jnp.zeros((), jnp.int32), hi0)
    )
    v_star = jax.lax.bitcast_convert_type(lo, dt)
    low_before, high_before = r2_parts(v_star)

    # Does any finite knot reach r^2?  r^2 at the LAST finite knot is
    # s_total + tau_max^2 * h_infinite (everything clamped except the
    # unbounded components).
    any_hit = s_total + tau_max * tau_max * h_infinite >= target_r2

    # Interior solution on the segment containing r^2.
    t_interior = jnp.sqrt(
        jnp.maximum(target_r2 - low_before, 0.0)
        / jnp.where(high_before > 0, high_before, 1.0)
    )

    # No finite knot reaches r^2: either unbounded components keep moving
    # (solve on the last segment) or all bounds are hit first (t = max tau,
    # reference l.175-181).
    t_beyond = jnp.where(
        h_infinite > 0,
        jnp.sqrt(
            jnp.maximum(target_r2 - s_total, 0.0)
            / jnp.where(h_infinite > 0, h_infinite, 1.0)
        ),
        tau_max,
    )
    return jnp.where(any_hit, t_interior, t_beyond)


def _t_star_sorted(tau, a, target_r2):
    """Exact knot search by sort + prefix sums + first-true search. The
    multi-operand sort carries `a` with the keys - one fused lax.sort
    instead of argsort + two reorder gathers (gathers are index-rate
    bound on TPU, ~2x the cost of the sort itself)."""
    tau_s, a_s = jax.lax.sort((tau, a), dimension=-1, num_keys=1)
    finite = jnp.isfinite(tau_s)

    # Prefix sums: S_k = sum_{j<=k, finite} a_j tau_j^2 (clamped part),
    # H_k = sum_{j>k} a_j (still-moving part, incl. infinite-tau comps).
    clamped_contrib = jnp.where(finite, a_s * tau_s * tau_s, 0.0)
    s_cum = jnp.cumsum(clamped_contrib)
    a_cum = jnp.cumsum(a_s)
    a_total = a_cum[-1] if a_s.shape[0] > 0 else jnp.asarray(0.0)
    h_after = a_total - a_cum

    # radius^2 at each finite knot (infinite knots -> +inf sentinel).
    r2_at_knot = jnp.where(
        finite, s_cum + tau_s * tau_s * h_after, jnp.inf
    )
    hit = r2_at_knot >= target_r2
    any_hit = jnp.any(hit & finite)
    k = jnp.argmax(hit)  # first knot with radius^2 >= r^2

    low_before = jnp.where(k > 0, s_cum[jnp.maximum(k - 1, 0)], 0.0)
    high_before = jnp.where(k > 0, h_after[jnp.maximum(k - 1, 0)], a_total)

    t_interior = jnp.sqrt(
        jnp.maximum(target_r2 - low_before, 0.0)
        / jnp.where(high_before > 0, high_before, 1.0)
    )

    a_finite_total = jnp.sum(jnp.where(finite, a_s, 0.0))
    s_total = s_cum[-1] if a_s.shape[0] > 0 else jnp.asarray(0.0)
    h_infinite = a_total - a_finite_total
    t_beyond = jnp.where(
        h_infinite > 0,
        jnp.sqrt(
            jnp.maximum(target_r2 - s_total, 0.0)
            / jnp.where(h_infinite > 0, h_infinite, 1.0)
        ),
        jnp.max(jnp.where(finite, tau_s, 0.0), initial=0.0),
    )
    return jnp.where(any_hit, t_interior, t_beyond)


def _approximate_trust_region(
    center_point,
    objective_vector,
    variable_lower_bounds,
    variable_upper_bounds,
    norm_weights,
    target_radius,
) -> TrustRegionResult:
    """Scaled projected-gradient approximation (reference l.194-224)."""
    g = objective_vector
    c = center_point
    frozen = ((c >= variable_upper_bounds) & (g <= 0.0)) | (
        (c <= variable_lower_bounds) & (g >= 0.0)
    )
    direction = jnp.where(frozen, 0.0, -g / norm_weights)
    norm = jnp.sqrt(jnp.sum(norm_weights * direction * direction))
    direction = jnp.where(
        norm > 0, direction * (target_radius / jnp.where(norm > 0, norm, 1.0)),
        direction,
    )
    return TrustRegionResult(
        solution=c + direction, value=jnp.sum(g * direction)
    )


class ObjectiveBound(NamedTuple):
    """Scalar results of bound_optimal_objective (the trust-region
    minimizer vectors themselves are not needed by the restart logic)."""

    lagrangian_value: jnp.ndarray
    lower_bound_value: jnp.ndarray
    upper_bound_value: jnp.ndarray

    @property
    def gap(self):
        return self.upper_bound_value - self.lower_bound_value


def bound_optimal_objective(
    problem,
    primal_solution,
    dual_solution,
    primal_norm_weights,
    dual_norm_weights,
    distance_to_optimality,
    use_max_norm: bool = False,
    solve_approximately: bool = False,
) -> ObjectiveBound:
    """Localized duality gap: bounds the optimal objective within a ball.

    Reference: src/trust_region_utils.jl:240-360. `problem` is a DeviceQp.
    With use_max_norm the primal and dual subproblems split; otherwise the
    ball is Euclidean in the joint (x, y) space.
    """
    qx = problem.qx(primal_solution)
    aty = problem.aty(dual_solution)
    ax = problem.ax(primal_solution)

    primal_gradient = qx + problem.objective_vector - aty
    dual_gradient = problem.right_hand_side - ax
    lagrangian_value = (
        0.5 * jnp.sum(primal_solution * qx)
        + jnp.sum(primal_solution * problem.objective_vector)
        - jnp.sum(primal_solution * aty)
        + jnp.sum(dual_solution * problem.right_hand_side)
        + problem.objective_constant
    )

    dual_lb = jnp.where(problem.is_equality, -jnp.inf, 0.0)
    dual_ub = jnp.full_like(dual_solution, jnp.inf)

    if use_max_norm:
        # The primal (n) and dual (m) subproblems are independent; batch
        # them into ONE vmapped trust-region solve of shape (2, max(n, m))
        # to halve the op count (TPU evals are dispatch-bound at Netlib
        # scale). Padded slots use c=l=u=0, g=0, w=1: frozen, zero
        # contribution to both the radius and the objective value.
        n = primal_solution.shape[0]
        m = dual_solution.shape[0]
        size = max(n, m)
        dt = primal_solution.dtype

        def pad(v, fill=0.0):
            return jnp.pad(v, (0, size - v.shape[0]), constant_values=fill)

        centers = jnp.stack([pad(primal_solution), pad(dual_solution)])
        gradients = jnp.stack([pad(primal_gradient), pad(-dual_gradient)])
        lbs = jnp.stack(
            [pad(problem.variable_lower_bound), pad(dual_lb)]
        )
        ubs = jnp.stack(
            [pad(problem.variable_upper_bound), pad(dual_ub)]
        )
        weights = jnp.stack(
            [pad(primal_norm_weights, 1.0), pad(dual_norm_weights, 1.0)]
        )
        radii = jnp.stack(
            [
                jnp.asarray(distance_to_optimality, dt),
                jnp.asarray(distance_to_optimality, dt),
            ]
        )
        result = jax.vmap(
            solve_bound_constrained_trust_region,
            in_axes=(0, 0, 0, 0, 0, 0, None),
        )(centers, gradients, lbs, ubs, weights, radii, solve_approximately)
        return ObjectiveBound(
            lagrangian_value=lagrangian_value,
            lower_bound_value=lagrangian_value + result.value[0],
            upper_bound_value=lagrangian_value - result.value[1],
        )

    z = jnp.concatenate([primal_solution, dual_solution])
    z_gradient = jnp.concatenate([primal_gradient, -dual_gradient])
    z_lb = jnp.concatenate([problem.variable_lower_bound, dual_lb])
    z_ub = jnp.concatenate([problem.variable_upper_bound, dual_ub])
    weights = jnp.concatenate([primal_norm_weights, dual_norm_weights])

    result = solve_bound_constrained_trust_region(
        z, z_gradient, z_lb, z_ub, weights, distance_to_optimality,
        solve_approximately,
    )
    n = primal_solution.shape[0]
    primal_tr = result.solution[:n]
    dual_tr = result.solution[n:]
    return ObjectiveBound(
        lagrangian_value=lagrangian_value,
        lower_bound_value=lagrangian_value
        + jnp.sum((primal_tr - primal_solution) * primal_gradient),
        upper_bound_value=lagrangian_value
        + jnp.sum((dual_tr - dual_solution) * dual_gradient),
    )


def bound_optimal_objective_euclidean_batched(
    problem,
    primal_solutions,  # (B, n)
    dual_solutions,  # (B, m)
    primal_norm_weights,  # (n,)
    dual_norm_weights,  # (m,)
    radii,  # (B,)
    solve_approximately: bool = False,
) -> ObjectiveBound:
    """Euclidean-ball localized gaps at B points in one batched solve.

    Semantically identical to B independent bound_optimal_objective calls
    with use_max_norm=False (reference trust_region_utils.jl:271-360), but
    the matvecs and the trust-region solve are vmapped so the whole batch
    costs one op sequence. Used by the restart scheme, which needs the gap
    at 2-3 points per evaluation (average, current, last restart).
    """
    qx = jax.vmap(problem.qx)(primal_solutions)
    aty = jax.vmap(problem.aty)(dual_solutions)
    ax = jax.vmap(problem.ax)(primal_solutions)

    primal_gradient = qx + problem.objective_vector[None, :] - aty
    dual_gradient = problem.right_hand_side[None, :] - ax
    lagrangian_value = (
        0.5 * jnp.sum(primal_solutions * qx, axis=1)
        + primal_solutions @ problem.objective_vector
        - jnp.sum(primal_solutions * aty, axis=1)
        + dual_solutions @ problem.right_hand_side
        + problem.objective_constant
    )

    b = primal_solutions.shape[0]
    dual_lb = jnp.where(problem.is_equality, -jnp.inf, 0.0)
    dual_ub = jnp.full_like(dual_solutions[0], jnp.inf)

    z = jnp.concatenate([primal_solutions, dual_solutions], axis=1)
    z_gradient = jnp.concatenate([primal_gradient, -dual_gradient], axis=1)
    z_lb = jnp.concatenate([problem.variable_lower_bound, dual_lb])
    z_ub = jnp.concatenate([problem.variable_upper_bound, dual_ub])
    weights = jnp.concatenate([primal_norm_weights, dual_norm_weights])

    result = jax.vmap(
        solve_bound_constrained_trust_region,
        in_axes=(0, 0, None, None, None, 0, None),
    )(z, z_gradient, z_lb, z_ub, weights, radii, solve_approximately)

    n = primal_solutions.shape[1]
    primal_tr = result.solution[:, :n]
    dual_tr = result.solution[:, n:]
    del b
    return ObjectiveBound(
        lagrangian_value=lagrangian_value,
        lower_bound_value=lagrangian_value
        + jnp.sum((primal_tr - primal_solutions) * primal_gradient, axis=1),
        upper_bound_value=lagrangian_value
        + jnp.sum((dual_tr - dual_solutions) * dual_gradient, axis=1),
    )
