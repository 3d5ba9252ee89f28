"""Termination criteria (reference: src/termination.jl).

The criteria struct lives on the host; the checks themselves are pure jnp
scalar functions evaluated on device inside the solve loop (they feed the
lax.while_loop continuation predicate).
"""

from __future__ import annotations

import dataclasses
import enum

import jax.numpy as jnp
import numpy as np

from .solve_log import TerminationReason


class OptimalityNorm(enum.Enum):
    L_INF = "l_inf"
    L2 = "l2"


@dataclasses.dataclass
class TerminationCriteria:
    """Reference: src/termination.jl:29-98.

    With termination_reason == OPTIMAL the following hold (p = the chosen
    norm):
      |primal_obj - dual_obj| <= eps_abs + eps_rel (|primal_obj|+|dual_obj|)
      ||primal_residual||_p   <= eps_abs + eps_rel ||b||_p
      ||dual_residual||_p     <= eps_abs + eps_rel ||c||_p
    """

    optimality_norm: OptimalityNorm = OptimalityNorm.L2
    eps_optimal_absolute: float = 1.0e-6
    eps_optimal_relative: float = 1.0e-6
    eps_primal_infeasible: float = 1.0e-8
    eps_dual_infeasible: float = 1.0e-8
    time_sec_limit: float = np.inf
    iteration_limit: int = np.iinfo(np.int32).max
    kkt_matrix_pass_limit: float = np.inf


def construct_termination_criteria(**kwargs) -> TerminationCriteria:
    return TerminationCriteria(**kwargs)


def validate_termination_criteria(criteria: TerminationCriteria) -> None:
    """Reference: src/termination.jl:122-138."""
    if criteria.eps_primal_infeasible < 0:
        raise ValueError("eps_primal_infeasible must be nonnegative")
    if criteria.eps_dual_infeasible < 0:
        raise ValueError("eps_dual_infeasible must be nonnegative")
    if criteria.time_sec_limit <= 0:
        raise ValueError("time_sec_limit must be positive")
    if criteria.iteration_limit <= 0:
        raise ValueError("iteration_limit must be positive")
    if criteria.kkt_matrix_pass_limit <= 0:
        raise ValueError("kkt_matrix_pass_limit must be positive")


@dataclasses.dataclass(frozen=True)
class CachedQuadraticProgramInfo:
    """Norms of c and b cached once per solve (reference l.140-158).

    Stored as plain floats; they are baked into the jitted check as
    constants of the original (unscaled) problem.
    """

    l_inf_norm_primal_linear_objective: float
    l_inf_norm_primal_right_hand_side: float
    l2_norm_primal_linear_objective: float
    l2_norm_primal_right_hand_side: float


def cached_quadratic_program_info(qp) -> CachedQuadraticProgramInfo:
    c = np.asarray(qp.objective_vector, dtype=np.float64)
    b = np.asarray(qp.right_hand_side, dtype=np.float64)
    return CachedQuadraticProgramInfo(
        l_inf_norm_primal_linear_objective=(
            float(np.max(np.abs(c))) if c.size else 0.0
        ),
        l_inf_norm_primal_right_hand_side=(
            float(np.max(np.abs(b))) if b.size else 0.0
        ),
        l2_norm_primal_linear_objective=float(np.linalg.norm(c)),
        l2_norm_primal_right_hand_side=float(np.linalg.norm(b)),
    )


# ---------------------------------------------------------------------------
# Device-side checks. `conv` / `infeas` are the device stats namedtuples
# defined in iteration_stats.py; all returns are jnp scalars.
# ---------------------------------------------------------------------------


def optimality_criteria_met(criteria, conv, qp_cache):
    """Reference: src/termination.jl:160-193."""
    abs_tol = criteria.eps_optimal_absolute
    rel_tol = criteria.eps_optimal_relative
    abs_obj = jnp.abs(conv.primal_objective) + jnp.abs(conv.dual_objective)
    gap = jnp.abs(conv.primal_objective - conv.dual_objective)
    if criteria.optimality_norm == OptimalityNorm.L_INF:
        primal_err = conv.l_inf_primal_residual
        primal_err_baseline = qp_cache.l_inf_norm_primal_right_hand_side
        dual_err = conv.l_inf_dual_residual
        dual_err_baseline = qp_cache.l_inf_norm_primal_linear_objective
    else:
        primal_err = conv.l2_primal_residual
        primal_err_baseline = qp_cache.l2_norm_primal_right_hand_side
        dual_err = conv.l2_dual_residual
        dual_err_baseline = qp_cache.l2_norm_primal_linear_objective
    return (
        (dual_err < abs_tol + rel_tol * dual_err_baseline)
        & (primal_err < abs_tol + rel_tol * primal_err_baseline)
        & (gap < abs_tol + rel_tol * abs_obj)
    )


def primal_infeasibility_criteria_met(eps_primal_infeasible, infeas):
    """Approximate dual ray certificate (reference l.195-210)."""
    return (infeas.dual_ray_objective > 0.0) & (
        infeas.max_dual_ray_infeasibility / infeas.dual_ray_objective
        <= eps_primal_infeasible
    )


def dual_infeasibility_criteria_met(eps_dual_infeasible, infeas):
    """Approximate primal ray certificate (reference l.212-227)."""
    neg_obj = -infeas.primal_ray_linear_objective
    return (
        (infeas.primal_ray_linear_objective < 0.0)
        & (infeas.max_primal_ray_infeasibility / neg_obj
           <= eps_dual_infeasible)
        & (infeas.primal_ray_quadratic_norm / neg_obj <= eps_dual_infeasible)
    )


def check_termination_criteria(
    criteria: TerminationCriteria,
    qp_cache: CachedQuadraticProgramInfo,
    conv,
    infeas,
    iteration_number,
    cumulative_kkt_matrix_passes,
    cumulative_time_sec,
):
    """Returns a TerminationReason code (int32 scalar), 0 = don't terminate.

    Reference: src/termination.jl:229-273 (same precedence order).
    """
    reason = jnp.int32(TerminationReason.TERMINATION_REASON_UNSPECIFIED)

    def maybe(reason, cond, value):
        return jnp.where(
            (reason == 0) & cond, jnp.int32(value), reason
        )

    reason = maybe(
        reason,
        optimality_criteria_met(criteria, conv, qp_cache),
        TerminationReason.TERMINATION_REASON_OPTIMAL,
    )
    reason = maybe(
        reason,
        primal_infeasibility_criteria_met(
            criteria.eps_primal_infeasible, infeas
        ),
        TerminationReason.TERMINATION_REASON_PRIMAL_INFEASIBLE,
    )
    reason = maybe(
        reason,
        dual_infeasibility_criteria_met(criteria.eps_dual_infeasible, infeas),
        TerminationReason.TERMINATION_REASON_DUAL_INFEASIBLE,
    )
    reason = maybe(
        reason,
        iteration_number >= criteria.iteration_limit,
        TerminationReason.TERMINATION_REASON_ITERATION_LIMIT,
    )
    reason = maybe(
        reason,
        cumulative_kkt_matrix_passes >= criteria.kkt_matrix_pass_limit,
        TerminationReason.TERMINATION_REASON_KKT_MATRIX_PASS_LIMIT,
    )
    reason = maybe(
        reason,
        cumulative_time_sec >= criteria.time_sec_limit,
        TerminationReason.TERMINATION_REASON_TIME_LIMIT,
    )
    return reason
