"""Shared saddle-point runtime: projections, iterate averaging, restart
schemes and primal-weight balancing (used by both PDHG and Mirror Prox).

Reference semantics: src/saddle_point.jl. Everything in this module that
runs per-evaluation is pure jnp on pytrees so it stays inside the jitted
solve loop.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .solve_log import (
    IterationStats,
    RestartChoice,
    TerminationReason,
    termination_reason_to_string,
)
from .trust_region import (
    ObjectiveBound,
    bound_optimal_objective,
    bound_optimal_objective_euclidean_batched,
)


# ---------------------------------------------------------------------------
# Output struct (host side)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class SaddlePointOutput:
    """Reference: src/saddle_point.jl:18-53."""

    primal_solution: np.ndarray
    dual_solution: np.ndarray
    termination_reason: TerminationReason
    termination_string: str
    iteration_count: int
    iteration_stats: List[IterationStats]




def fetch_global(x) -> np.ndarray:
    """np.asarray for possibly cross-process-sharded arrays.

    Single-process (or fully-addressable) arrays fetch directly;
    under multi-host runs the value is allgathered first
    (jax.experimental.multihost_utils), since a host cannot read
    shards living on other processes.
    """
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(
            multihost_utils.process_allgather(x, tiled=True)
        )
    return np.asarray(x)


def unscaled_saddle_point_output(
    scaled_problem,
    primal_solution,
    dual_solution,
    termination_reason: TerminationReason,
    iterations_completed: int,
    iteration_stats: List[IterationStats],
) -> SaddlePointOutput:
    """Unscales the iterates (reference l.55-77)."""
    original_primal = fetch_global(primal_solution) / np.asarray(
        scaled_problem.variable_rescaling
    )
    original_dual = fetch_global(dual_solution) / np.asarray(
        scaled_problem.constraint_rescaling
    )
    return SaddlePointOutput(
        primal_solution=original_primal,
        dual_solution=original_dual,
        termination_reason=termination_reason,
        termination_string=termination_reason_to_string(termination_reason),
        iteration_count=iterations_completed,
        iteration_stats=iteration_stats,
    )


# ---------------------------------------------------------------------------
# Projections and norms (device)
# ---------------------------------------------------------------------------


def project_primal(primal, problem):
    """Clamp onto variable bounds (reference l.79-106)."""
    return jnp.clip(
        primal, problem.variable_lower_bound, problem.variable_upper_bound
    )


def project_dual(dual, problem):
    """Inequality duals clamped to >= 0 (reference l.108-117)."""
    return jnp.where(problem.is_equality, dual, jnp.maximum(dual, 0.0))


def weighted_norm(vec, weights):
    """sqrt(sum_i w_i v_i^2) (reference l.119-129)."""
    return jnp.sqrt(jnp.sum(weights * vec * vec))


# ---------------------------------------------------------------------------
# Weighted average of iterates (device pytree)
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SolutionWeightedAverage:
    """Reference: src/saddle_point.jl:215-301."""

    sum_primal_solutions: jax.Array
    sum_dual_solutions: jax.Array
    sum_primal_solutions_count: jax.Array  # int64 scalar
    sum_dual_solutions_count: jax.Array  # int64 scalar
    sum_primal_solution_weights: jax.Array  # scalar
    sum_dual_solution_weights: jax.Array  # scalar


def initialize_solution_weighted_average(
    primal_size: int, dual_size: int, dtype=jnp.float64
) -> SolutionWeightedAverage:
    return SolutionWeightedAverage(
        sum_primal_solutions=jnp.zeros(primal_size, dtype),
        sum_dual_solutions=jnp.zeros(dual_size, dtype),
        sum_primal_solutions_count=jnp.int64(0),
        sum_dual_solutions_count=jnp.int64(0),
        sum_primal_solution_weights=jnp.asarray(0.0, dtype),
        sum_dual_solution_weights=jnp.asarray(0.0, dtype),
    )


def reset_solution_weighted_average(
    avg: SolutionWeightedAverage,
) -> SolutionWeightedAverage:
    return SolutionWeightedAverage(
        sum_primal_solutions=jnp.zeros_like(avg.sum_primal_solutions),
        sum_dual_solutions=jnp.zeros_like(avg.sum_dual_solutions),
        sum_primal_solutions_count=jnp.zeros_like(
            avg.sum_primal_solutions_count
        ),
        sum_dual_solutions_count=jnp.zeros_like(avg.sum_dual_solutions_count),
        sum_primal_solution_weights=jnp.zeros_like(
            avg.sum_primal_solution_weights
        ),
        sum_dual_solution_weights=jnp.zeros_like(
            avg.sum_dual_solution_weights
        ),
    )


def add_to_primal_solution_weighted_average(
    avg: SolutionWeightedAverage, primal, weight
) -> SolutionWeightedAverage:
    return dataclasses.replace(
        avg,
        sum_primal_solutions=avg.sum_primal_solutions + primal * weight,
        sum_primal_solutions_count=avg.sum_primal_solutions_count + 1,
        sum_primal_solution_weights=avg.sum_primal_solution_weights + weight,
    )


def add_to_dual_solution_weighted_average(
    avg: SolutionWeightedAverage, dual, weight
) -> SolutionWeightedAverage:
    return dataclasses.replace(
        avg,
        sum_dual_solutions=avg.sum_dual_solutions + dual * weight,
        sum_dual_solutions_count=avg.sum_dual_solutions_count + 1,
        sum_dual_solution_weights=avg.sum_dual_solution_weights + weight,
    )


def add_to_solution_weighted_average(
    avg: SolutionWeightedAverage, primal, dual, weight
) -> SolutionWeightedAverage:
    avg = add_to_primal_solution_weighted_average(avg, primal, weight)
    avg = add_to_dual_solution_weighted_average(avg, dual, weight)
    return avg


def compute_average(avg: SolutionWeightedAverage):
    return (
        avg.sum_primal_solutions / avg.sum_primal_solution_weights,
        avg.sum_dual_solutions / avg.sum_dual_solution_weights,
    )


# ---------------------------------------------------------------------------
# Restart schemes
# ---------------------------------------------------------------------------


class RestartScheme(enum.Enum):
    """Reference: src/saddle_point.jl:303-325."""

    NO_RESTARTS = "no_restarts"
    FIXED_FREQUENCY = "fixed_frequency"
    ADAPTIVE_NORMALIZED = "adaptive_normalized"
    ADAPTIVE_LOCALIZED = "adaptive_localized"
    ADAPTIVE_DISTANCE = "adaptive_distance"


class RestartToCurrentMetric(enum.Enum):
    """Reference: src/saddle_point.jl:327-340."""

    NO_RESTART_TO_CURRENT = "no_restart_to_current"
    GAP_OVER_DISTANCE = "gap_over_distance"
    GAP_OVER_DISTANCE_SQUARED = "gap_over_distance_squared"


@dataclasses.dataclass(frozen=True)
class RestartParameters:
    """Reference: src/saddle_point.jl:342-400 (static per solve)."""

    restart_scheme: RestartScheme
    restart_to_current_metric: RestartToCurrentMetric
    restart_frequency_if_fixed: int
    artificial_restart_threshold: float
    sufficient_reduction_for_restart: float
    necessary_reduction_for_restart: float
    primal_weight_update_smoothing: float
    use_approximate_localized_duality_gap: bool


def construct_restart_parameters(
    restart_scheme: RestartScheme,
    restart_to_current_metric: RestartToCurrentMetric,
    restart_frequency_if_fixed: int,
    artificial_restart_threshold: float,
    sufficient_reduction_for_restart: float,
    necessary_reduction_for_restart: float,
    primal_weight_update_smoothing: float,
    use_approximate_localized_duality_gap: bool,
) -> RestartParameters:
    """Validated constructor (reference l.402-430)."""
    assert restart_frequency_if_fixed > 1
    assert 0.0 < artificial_restart_threshold <= 1.0
    assert (
        0.0
        < sufficient_reduction_for_restart
        <= necessary_reduction_for_restart
        <= 1.0
    )
    assert 0.0 <= primal_weight_update_smoothing <= 1.0
    return RestartParameters(
        restart_scheme=restart_scheme,
        restart_to_current_metric=restart_to_current_metric,
        restart_frequency_if_fixed=restart_frequency_if_fixed,
        artificial_restart_threshold=artificial_restart_threshold,
        sufficient_reduction_for_restart=sufficient_reduction_for_restart,
        necessary_reduction_for_restart=necessary_reduction_for_restart,
        primal_weight_update_smoothing=primal_weight_update_smoothing,
        use_approximate_localized_duality_gap=(
            use_approximate_localized_duality_gap
        ),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RestartInfo:
    """Reference: src/saddle_point.jl:158-213.

    The localized gap of the last restart is stored by value (only its gap
    enters later decisions); has_gap distinguishes "no restart yet".
    """

    primal_solution: jax.Array
    dual_solution: jax.Array
    has_gap: jax.Array  # bool scalar
    gap: jax.Array  # scalar
    last_restart_length: jax.Array  # int64 scalar
    primal_distance_moved_last_restart_period: jax.Array  # scalar
    dual_distance_moved_last_restart_period: jax.Array  # scalar
    gap_reduction_ratio_last_trial: jax.Array  # scalar


def create_last_restart_info(primal, dual) -> RestartInfo:
    return RestartInfo(
        primal_solution=primal,
        dual_solution=dual,
        has_gap=jnp.asarray(False),
        gap=jnp.asarray(0.0, primal.dtype),
        last_restart_length=jnp.int64(1),
        primal_distance_moved_last_restart_period=jnp.asarray(
            0.0, primal.dtype
        ),
        dual_distance_moved_last_restart_period=jnp.asarray(0.0, primal.dtype),
        gap_reduction_ratio_last_trial=jnp.asarray(1.0, primal.dtype),
    )


def compute_localized_duality_gap(
    problem,
    primal_solution,
    dual_solution,
    primal_norm_params,
    dual_norm_params,
    distance_to_optimality,
    use_approximate: bool,
) -> ObjectiveBound:
    """Euclidean-ball localized gap (reference l.131-156)."""
    return bound_optimal_objective(
        problem,
        primal_solution,
        dual_solution,
        primal_norm_params,
        dual_norm_params,
        distance_to_optimality,
        use_max_norm=False,
        solve_approximately=use_approximate,
    )


class LocalizedDualityGaps(NamedTuple):
    gap_at_average: ObjectiveBound
    distance_traveled_by_average: jnp.ndarray
    gap_at_current: ObjectiveBound
    distance_traveled_by_current: jnp.ndarray


def compute_localized_duality_gaps(
    problem,
    current_primal,
    current_dual,
    avg_primal,
    avg_dual,
    primal_norm_params,
    dual_norm_params,
    restart_info: RestartInfo,
    use_approximate: bool,
) -> LocalizedDualityGaps:
    """Reference: src/saddle_point.jl:432-496."""
    dist_avg = jnp.sqrt(
        weighted_norm(
            avg_primal - restart_info.primal_solution, primal_norm_params
        )
        ** 2
        + weighted_norm(
            avg_dual - restart_info.dual_solution, dual_norm_params
        )
        ** 2
    )
    gap_avg = compute_localized_duality_gap(
        problem,
        avg_primal,
        avg_dual,
        primal_norm_params,
        dual_norm_params,
        dist_avg,
        use_approximate,
    )
    dist_cur = jnp.sqrt(
        weighted_norm(
            current_primal - restart_info.primal_solution, primal_norm_params
        )
        ** 2
        + weighted_norm(
            current_dual - restart_info.dual_solution, dual_norm_params
        )
        ** 2
    )
    gap_cur = compute_localized_duality_gap(
        problem,
        current_primal,
        current_dual,
        primal_norm_params,
        dual_norm_params,
        dist_cur,
        use_approximate,
    )
    return LocalizedDualityGaps(
        gap_at_average=gap_avg,
        distance_traveled_by_average=dist_avg,
        gap_at_current=gap_cur,
        distance_traveled_by_current=dist_cur,
    )


def should_reset_to_average(
    gap_current: ObjectiveBound,
    dist_current,
    gap_average: ObjectiveBound,
    dist_average,
    metric: RestartToCurrentMetric,
):
    """Reference: src/saddle_point.jl:498-547. Returns a bool scalar."""
    current_norm_gap = gap_current.gap / dist_current
    average_norm_gap = gap_average.gap / dist_average
    if metric == RestartToCurrentMetric.GAP_OVER_DISTANCE_SQUARED:
        return (
            current_norm_gap / dist_current >= average_norm_gap / dist_average
        )
    if metric == RestartToCurrentMetric.GAP_OVER_DISTANCE:
        return current_norm_gap >= average_norm_gap
    return jnp.asarray(True)


class RestartSchemeResult(NamedTuple):
    restart_choice: jnp.ndarray  # int32 RestartChoice code
    primal_solution: jnp.ndarray
    dual_solution: jnp.ndarray
    avg: SolutionWeightedAverage
    restart_info: RestartInfo


def run_restart_scheme(
    problem,
    avg: SolutionWeightedAverage,
    current_primal,
    current_dual,
    restart_info: RestartInfo,
    iterations_completed,
    primal_norm_params,
    dual_norm_params,
    primal_weight,
    restart_params: RestartParameters,
) -> RestartSchemeResult:
    """Decides whether to restart and applies the restart.

    Reference: src/saddle_point.jl:651-846. The scheme/metric are static
    (trace-time) parameters; all decisions are jnp scalars.
    """
    no_restart = RestartSchemeResult(
        restart_choice=jnp.int32(RestartChoice.RESTART_CHOICE_NO_RESTART),
        primal_solution=current_primal,
        dual_solution=current_dual,
        avg=avg,
        restart_info=restart_info,
    )
    has_average = (avg.sum_primal_solutions_count > 0) & (
        avg.sum_dual_solutions_count > 0
    )
    # Guard the division when the average is empty (result unused then).
    safe_avg_primal = avg.sum_primal_solutions / jnp.where(
        avg.sum_primal_solution_weights > 0, avg.sum_primal_solution_weights, 1
    )
    safe_avg_dual = avg.sum_dual_solutions / jnp.where(
        avg.sum_dual_solution_weights > 0, avg.sum_dual_solution_weights, 1
    )

    restart_length = avg.sum_primal_solutions_count
    artificial_restart = (
        restart_length
        >= restart_params.artificial_restart_threshold * iterations_completed
    )
    do_restart = artificial_restart

    scheme = restart_params.restart_scheme
    if scheme == RestartScheme.NO_RESTARTS:
        reset_to_average = jnp.asarray(False)
        candidate_gap = ObjectiveBound(
            lagrangian_value=jnp.asarray(0.0),
            lower_bound_value=jnp.asarray(0.0),
            upper_bound_value=jnp.asarray(0.0),
        )
        candidate_distance = jnp.asarray(0.0)
    else:
        # All localized-gap evaluations this scheme needs (average point,
        # current point, and - for ADAPTIVE_NORMALIZED - the last restart
        # point) are batched into ONE vmapped trust-region solve; TPU evals
        # are dispatch-bound, so this cuts the restart cost ~3x versus
        # sequential bound_optimal_objective calls.
        dist_avg = jnp.sqrt(
            weighted_norm(
                safe_avg_primal - restart_info.primal_solution,
                primal_norm_params,
            )
            ** 2
            + weighted_norm(
                safe_avg_dual - restart_info.dual_solution, dual_norm_params
            )
            ** 2
        )
        dist_cur = jnp.sqrt(
            weighted_norm(
                current_primal - restart_info.primal_solution,
                primal_norm_params,
            )
            ** 2
            + weighted_norm(
                current_dual - restart_info.dual_solution, dual_norm_params
            )
            ** 2
        )
        batch_primals = [safe_avg_primal, current_primal]
        batch_duals = [safe_avg_dual, current_dual]
        batch_radii = [dist_avg, dist_cur]
        if scheme == RestartScheme.ADAPTIVE_NORMALIZED:
            dist_last_restart = jnp.sqrt(
                restart_info.primal_distance_moved_last_restart_period**2
                * primal_weight
                + restart_info.dual_distance_moved_last_restart_period**2
                / primal_weight
            )
            batch_primals.append(restart_info.primal_solution)
            batch_duals.append(restart_info.dual_solution)
            batch_radii.append(dist_last_restart)
        bounds = bound_optimal_objective_euclidean_batched(
            problem,
            jnp.stack(batch_primals),
            jnp.stack(batch_duals),
            primal_norm_params,
            dual_norm_params,
            jnp.stack(batch_radii),
            restart_params.use_approximate_localized_duality_gap,
        )

        def bound_row(i):
            return ObjectiveBound(
                lagrangian_value=bounds.lagrangian_value[i],
                lower_bound_value=bounds.lower_bound_value[i],
                upper_bound_value=bounds.upper_bound_value[i],
            )

        gaps = LocalizedDualityGaps(
            gap_at_average=bound_row(0),
            distance_traveled_by_average=dist_avg,
            gap_at_current=bound_row(1),
            distance_traveled_by_current=dist_cur,
        )
        reset_to_average = should_reset_to_average(
            gaps.gap_at_current,
            gaps.distance_traveled_by_current,
            gaps.gap_at_average,
            gaps.distance_traveled_by_average,
            restart_params.restart_to_current_metric,
        )
        candidate_gap = ObjectiveBound(
            lagrangian_value=jnp.where(
                reset_to_average,
                gaps.gap_at_average.lagrangian_value,
                gaps.gap_at_current.lagrangian_value,
            ),
            lower_bound_value=jnp.where(
                reset_to_average,
                gaps.gap_at_average.lower_bound_value,
                gaps.gap_at_current.lower_bound_value,
            ),
            upper_bound_value=jnp.where(
                reset_to_average,
                gaps.gap_at_average.upper_bound_value,
                gaps.gap_at_current.upper_bound_value,
            ),
        )
        candidate_distance = jnp.where(
            reset_to_average,
            gaps.distance_traveled_by_average,
            gaps.distance_traveled_by_current,
        )

    gap_ratio_update = restart_info.gap_reduction_ratio_last_trial

    if scheme == RestartScheme.ADAPTIVE_NORMALIZED:
        last_restart_gap = bound_row(2)  # batched above
        normalized_candidate = candidate_gap.gap / candidate_distance
        normalized_last = last_restart_gap.gap / dist_last_restart
        gap_reduction_ratio = normalized_candidate / normalized_last
        adaptive_restart = (
            gap_reduction_ratio
            < restart_params.necessary_reduction_for_restart
        ) & (
            (
                gap_reduction_ratio
                < restart_params.sufficient_reduction_for_restart
            )
            | (
                gap_reduction_ratio
                > restart_info.gap_reduction_ratio_last_trial
            )
        )
        do_restart = do_restart | adaptive_restart
        gap_ratio_update = gap_reduction_ratio
    elif scheme in (
        RestartScheme.ADAPTIVE_LOCALIZED,
        RestartScheme.ADAPTIVE_DISTANCE,
    ):
        if scheme == RestartScheme.ADAPTIVE_LOCALIZED:
            new_potential = candidate_gap.gap / restart_length
            old_potential = restart_info.gap / restart_info.last_restart_length
            scheme_restart = (
                new_potential / old_potential
                < restart_params.necessary_reduction_for_restart
            )
        else:
            dist_last_restart = jnp.sqrt(
                restart_info.primal_distance_moved_last_restart_period**2
                * primal_weight
                + restart_info.dual_distance_moved_last_restart_period**2
                / primal_weight
            )
            new_potential = candidate_distance / restart_length
            old_potential = (
                dist_last_restart / restart_info.last_restart_length
            )
            scheme_restart = (
                new_potential / old_potential
                < restart_params.necessary_reduction_for_restart
            )
        # Automatically restart if no restart has occurred yet.
        do_restart = do_restart | jnp.where(
            restart_info.has_gap, scheme_restart, jnp.asarray(True)
        )
    elif scheme == RestartScheme.FIXED_FREQUENCY:
        do_restart = do_restart | (
            restart_params.restart_frequency_if_fixed <= restart_length
        )

    do_restart = do_restart & has_average

    new_primal = jnp.where(
        do_restart & reset_to_average, safe_avg_primal, current_primal
    )
    new_dual = jnp.where(
        do_restart & reset_to_average, safe_avg_dual, current_dual
    )

    def where_tree(cond, a, b):
        return jax.tree_util.tree_map(
            lambda u, v: jnp.where(cond, u, v), a, b
        )

    new_avg = where_tree(do_restart, reset_solution_weighted_average(avg), avg)

    updated_info = RestartInfo(
        primal_solution=new_primal,
        dual_solution=new_dual,
        has_gap=(
            jnp.asarray(scheme != RestartScheme.NO_RESTARTS)
            & jnp.asarray(True)
        ),
        gap=candidate_gap.gap,
        last_restart_length=restart_length,
        primal_distance_moved_last_restart_period=weighted_norm(
            safe_avg_primal - restart_info.primal_solution, primal_norm_params
        )
        / jnp.sqrt(primal_weight),
        dual_distance_moved_last_restart_period=weighted_norm(
            safe_avg_dual - restart_info.dual_solution, dual_norm_params
        )
        * jnp.sqrt(primal_weight),
        gap_reduction_ratio_last_trial=gap_ratio_update,
    )
    # gap_reduction_ratio_last_trial is updated on every ADAPTIVE_NORMALIZED
    # trial (restart or not), mirroring the mutable update in the reference
    # (l.590); other restart_info fields change only on restart.
    kept_info = dataclasses.replace(
        restart_info, gap_reduction_ratio_last_trial=gap_ratio_update
    )
    new_info = where_tree(do_restart, updated_info, kept_info)

    restart_choice = jnp.where(
        ~do_restart,
        jnp.int32(RestartChoice.RESTART_CHOICE_NO_RESTART),
        jnp.where(
            reset_to_average,
            jnp.int32(RestartChoice.RESTART_CHOICE_RESTART_TO_AVERAGE),
            jnp.int32(RestartChoice.RESTART_CHOICE_WEIGHTED_AVERAGE_RESET),
        ),
    )

    result = RestartSchemeResult(
        restart_choice=restart_choice,
        primal_solution=new_primal,
        dual_solution=new_dual,
        avg=new_avg,
        restart_info=new_info,
    )
    # If there is no average at all, nothing happens (reference l.703-709).
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(has_average, a, b), result, no_restart
    )


def compute_new_primal_weight(
    restart_info: RestartInfo,
    primal_weight,
    primal_weight_update_smoothing: float,
):
    """Exponentially smoothed (in log space) primal weight update.

    Reference: src/saddle_point.jl:848-891.
    """
    primal_distance = restart_info.primal_distance_moved_last_restart_period
    dual_distance = restart_info.dual_distance_moved_last_restart_period
    eps = jnp.finfo(jnp.float64).eps
    valid = (primal_distance > eps) & (dual_distance > eps)
    safe_primal = jnp.where(valid, primal_distance, 1.0)
    safe_dual = jnp.where(valid, dual_distance, 1.0)
    new_estimate = safe_dual / safe_primal
    log_primal_weight = primal_weight_update_smoothing * jnp.log(
        new_estimate
    ) + (1 - primal_weight_update_smoothing) * jnp.log(primal_weight)
    return jnp.where(valid, jnp.exp(log_primal_weight), primal_weight)


def select_initial_primal_weight(
    problem,
    primal_norm_params,
    dual_norm_params,
    primal_importance: float,
):
    """Scale-invariant initial primal weight (reference l.1049-1075)."""
    rhs_norm = weighted_norm(problem.right_hand_side, dual_norm_params)
    obj_norm = weighted_norm(problem.objective_vector, primal_norm_params)
    use_ratio = (obj_norm > 0.0) & (rhs_norm > 0.0)
    return jnp.where(
        use_ratio,
        primal_importance
        * (obj_norm / jnp.where(rhs_norm > 0, rhs_norm, 1.0)),
        primal_importance,
    )


# ---------------------------------------------------------------------------
# Lagrangian gradients (device)
# ---------------------------------------------------------------------------


def compute_primal_gradient_from_dual_product(problem, primal, dual_product):
    """Q x + c - A'y given the cached A'y (reference l.1093-1100)."""
    return problem.qx(primal) + problem.objective_vector - dual_product


def compute_primal_gradient(problem, primal, dual):
    return compute_primal_gradient_from_dual_product(
        problem, primal, problem.aty(dual)
    )


def compute_dual_gradient(problem, primal):
    """b - A x (reference l.1102-1107)."""
    return problem.right_hand_side - problem.ax(primal)


def compute_lagrangian_value(problem, primal, dual):
    """0.5 x'Qx + c'x - x'A'y + b'y + const (reference l.1109-1120)."""
    return (
        0.5 * jnp.sum(primal * problem.qx(primal))
        + jnp.sum(primal * problem.objective_vector)
        - jnp.sum(primal * problem.aty(dual))
        + jnp.sum(dual * problem.right_hand_side)
        + problem.objective_constant
    )


def update_objective_bound_estimates(
    problem, primal, dual, primal_norm_weights, dual_norm_weights
):
    """Estimated optimal-objective range via a MAX_NORM localized gap.

    Reference: src/saddle_point.jl:1015-1047. Returns (lagrangian, lower,
    upper) scalars for method_specific_stats.
    """
    est_primal_dist = jnp.maximum(
        1e-8, weighted_norm(primal, primal_norm_weights)
    )
    est_dual_dist = jnp.maximum(1e-8, weighted_norm(dual, dual_norm_weights))
    bound = bound_optimal_objective(
        problem,
        primal,
        dual,
        primal_norm_weights / est_primal_dist**2,
        dual_norm_weights / est_dual_dist**2,
        jnp.asarray(1.0),
        use_max_norm=True,
        solve_approximately=False,
    )
    return (
        bound.lagrangian_value,
        bound.lower_bound_value,
        bound.upper_bound_value,
    )
