"""Shared pieces of the PDHG / Mirror Prox solve loops.

The solvers run as a host loop over jitted *segments*: each segment
performs one termination/restart evaluation followed by the steps up to
the next evaluation point, entirely on device (lax.while_loop). The host
reads back only the handful of stats scalars per evaluation - every ~40
iterations with the default settings (mirrors the reference loop
structure, src/primal_dual_hybrid_gradient.jl:885-1048).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..iteration_stats import (
    DeviceConvergenceInfo,
    DeviceInfeasibilityInfo,
    compute_convergence_information,
    compute_infeasibility_information,
)
from ..solve_log import TerminationReason
from ..termination import (
    CachedQuadraticProgramInfo,
    TerminationCriteria,
    check_termination_criteria,
)


class EvalResult(NamedTuple):
    """Per-evaluation scalars shipped to the host."""

    conv: DeviceConvergenceInfo
    infeas: DeviceInfeasibilityInfo
    lagrangian_value: jnp.ndarray
    estimated_lower_bound: jnp.ndarray
    estimated_upper_bound: jnp.ndarray
    termination_reason: jnp.ndarray  # int32, 0 = keep going
    restart_used: jnp.ndarray  # int32 RestartChoice
    iteration: jnp.ndarray  # int64, the iteration evaluated (ref: iter - 1)
    cumulative_kkt_passes: jnp.ndarray
    step_size: jnp.ndarray
    primal_weight: jnp.ndarray


def evaluate_unscaled_stats(
    bundle,
    criteria: TerminationCriteria,
    avg_primal,
    avg_dual,
    numerical_error,
    iteration_number,
    cumulative_kkt_passes,
    elapsed_time,
):
    """Unscales the iterates and evaluates stats + termination on the
    ORIGINAL problem (reference src/iteration_stats_utils.jl:408-451 and
    the termination block of the solve loops)."""
    original_primal = avg_primal / bundle.variable_rescaling
    original_dual = avg_dual / bundle.constraint_rescaling
    # Julia division semantics: 0/0 -> NaN, x/0 -> Inf (not an exception).
    with np.errstate(divide="ignore", invalid="ignore"):
        eps_ratio = float(
            np.float64(criteria.eps_optimal_absolute)
            / np.float64(criteria.eps_optimal_relative)
        )
    conv = compute_convergence_information(
        bundle.original, bundle.qp_cache, original_primal, original_dual,
        eps_ratio,
    )
    if (
        criteria.eps_primal_infeasible == 0.0
        and criteria.eps_dual_infeasible == 0.0
    ):
        # Infeasibility detection disabled (both tolerances exactly 0):
        # skip the certificate evaluation - roughly half the matvecs of
        # an evaluation - and record zeros. Trace-time decision; the
        # criteria are static config.
        zero = jnp.zeros((), original_primal.dtype)
        infeas = DeviceInfeasibilityInfo(
            max_primal_ray_infeasibility=zero,
            primal_ray_linear_objective=zero,
            primal_ray_quadratic_norm=zero,
            max_dual_ray_infeasibility=zero,
            dual_ray_objective=zero,
        )
    else:
        infeas = compute_infeasibility_information(
            bundle.original, original_primal, original_dual
        )
    reason = check_termination_criteria(
        criteria,
        bundle.qp_cache,
        conv,
        infeas,
        iteration_number,
        cumulative_kkt_passes,
        elapsed_time,
    )
    reason = jnp.where(
        (reason == 0) & numerical_error,
        jnp.int32(TerminationReason.TERMINATION_REASON_NUMERICAL_ERROR),
        reason,
    )
    return conv, infeas, reason


def matrix_inf_norm_entrywise(matrix: sp.spmatrix) -> float:
    """Max |a_ij| (Julia's norm(A, Inf) on sparse treats A as a vector of
    entries; used for the initial step size, reference pdhg.jl:823)."""
    if matrix.nnz == 0:
        return 0.0
    return float(np.max(np.abs(matrix.tocoo().data)))


def power_method_failure_probability(
    dimension: int, epsilon: float, k: int
) -> float:
    """Reference: src/primal_dual_hybrid_gradient.jl:372-391."""
    if k < 2 or epsilon <= 0.0:
        return 1.0
    return (
        min(0.824, 0.354 / np.sqrt(epsilon * (k - 1)))
        * np.sqrt(dimension)
        * (1.0 - epsilon) ** (k - 0.5)
    )


def estimate_maximum_singular_value(
    matrix: sp.spmatrix,
    probability_of_failure: float = 0.01,
    desired_relative_error: float = 0.1,
    seed: int = 1,
):
    """Power method on A'A with a rigorous failure-probability bound.

    Reference: src/primal_dual_hybrid_gradient.jl:393-440. Runs host-side
    (it is a one-time setup cost); the seeded numpy Generator replaces the
    seeded MersenneTwister.
    """
    epsilon = 1.0 - (1.0 - desired_relative_error) ** 2
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(matrix.shape[1])
    csr = sp.csr_matrix(matrix)
    csr_t = sp.csr_matrix(matrix.T)
    number_of_power_iterations = 0
    while (
        power_method_failure_probability(
            matrix.shape[1], epsilon, number_of_power_iterations
        )
        > probability_of_failure
    ):
        x = x / np.linalg.norm(x, 2)
        x = csr_t @ (csr @ x)
        number_of_power_iterations += 1
    sigma_sq = float(x @ (csr_t @ (csr @ x))) / float(np.linalg.norm(x, 2)) ** 2
    return np.sqrt(sigma_sq), number_of_power_iterations


def initial_primal_weight_host(
    scaled_qp, primal_importance: float, scale_invariant: bool, verbosity: int
) -> float:
    """Host-side select_initial_primal_weight (reference
    src/saddle_point.jl:1049-1075) with all-ones norm weights."""
    if not scale_invariant:
        return float(primal_importance)
    obj_norm = float(np.linalg.norm(scaled_qp.objective_vector, 2))
    rhs_norm = float(np.linalg.norm(scaled_qp.right_hand_side, 2))
    if obj_norm > 0.0 and rhs_norm > 0.0:
        primal_weight = primal_importance * (obj_norm / rhs_norm)
    else:
        primal_weight = primal_importance
    if verbosity >= 6:
        print(f"Initial primal weight = {primal_weight}")
    return float(primal_weight)


@dataclasses.dataclass(frozen=True)
class HashableQpCache:
    """CachedQuadraticProgramInfo as a hashable static jit argument."""

    l_inf_norm_primal_linear_objective: float
    l_inf_norm_primal_right_hand_side: float
    l2_norm_primal_linear_objective: float
    l2_norm_primal_right_hand_side: float

    @classmethod
    def from_cache(cls, cache: CachedQuadraticProgramInfo):
        return cls(
            cache.l_inf_norm_primal_linear_objective,
            cache.l_inf_norm_primal_right_hand_side,
            cache.l2_norm_primal_linear_objective,
            cache.l2_norm_primal_right_hand_side,
        )


@dataclasses.dataclass(frozen=True)
class HashableCriteria:
    """TerminationCriteria as a hashable static jit argument."""

    optimality_norm: str
    eps_optimal_absolute: float
    eps_optimal_relative: float
    eps_primal_infeasible: float
    eps_dual_infeasible: float
    time_sec_limit: float
    iteration_limit: int
    kkt_matrix_pass_limit: float

    @classmethod
    def from_criteria(cls, criteria: TerminationCriteria):
        return cls(
            criteria.optimality_norm.value,
            criteria.eps_optimal_absolute,
            criteria.eps_optimal_relative,
            criteria.eps_primal_infeasible,
            criteria.eps_dual_infeasible,
            criteria.time_sec_limit,
            int(criteria.iteration_limit),
            criteria.kkt_matrix_pass_limit,
        )

    def to_criteria(self) -> TerminationCriteria:
        from ..termination import OptimalityNorm

        return TerminationCriteria(
            optimality_norm=OptimalityNorm(self.optimality_norm),
            eps_optimal_absolute=self.eps_optimal_absolute,
            eps_optimal_relative=self.eps_optimal_relative,
            eps_primal_infeasible=self.eps_primal_infeasible,
            eps_dual_infeasible=self.eps_dual_infeasible,
            time_sec_limit=self.time_sec_limit,
            iteration_limit=self.iteration_limit,
            kkt_matrix_pass_limit=self.kkt_matrix_pass_limit,
        )
