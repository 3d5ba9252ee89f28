"""Test helpers mirroring reference test/utilities.jl."""

import numpy as np

from firstorderlp_tpu import (
    PdhgParameters,
    AdaptiveStepsizeParams,
    RestartParameters,
    RestartScheme,
    RestartToCurrentMetric,
    TerminationCriteria,
    construct_restart_parameters,
)
from firstorderlp_tpu.termination import OptimalityNorm


def terminate_on_iteration_limit(iteration_limit: int) -> TerminationCriteria:
    """Zero-tolerance criteria so tests run an exact number of iterations
    (reference test/utilities.jl:85-97)."""
    return TerminationCriteria(
        optimality_norm=OptimalityNorm.L2,
        eps_optimal_absolute=0.0,
        eps_optimal_relative=0.0,
        eps_primal_infeasible=0.0,
        eps_dual_infeasible=0.0,
        time_sec_limit=np.inf,
        iteration_limit=iteration_limit,
        kkt_matrix_pass_limit=np.inf,
    )


def optimality_criteria(eps: float) -> TerminationCriteria:
    return TerminationCriteria(
        optimality_norm=OptimalityNorm.L2,
        eps_optimal_absolute=eps,
        eps_optimal_relative=eps,
        eps_primal_infeasible=1e-8,
        eps_dual_infeasible=1e-8,
        time_sec_limit=np.inf,
        iteration_limit=np.iinfo(np.int32).max,
        kkt_matrix_pass_limit=np.inf,
    )


def default_restart_params(
    scheme=RestartScheme.ADAPTIVE_NORMALIZED,
    metric=RestartToCurrentMetric.GAP_OVER_DISTANCE_SQUARED,
) -> RestartParameters:
    """The PDLP defaults (reference scripts/solve_qp.jl:193-473)."""
    return construct_restart_parameters(
        restart_scheme=scheme,
        restart_to_current_metric=metric,
        restart_frequency_if_fixed=100,
        artificial_restart_threshold=0.5,
        sufficient_reduction_for_restart=0.1,
        necessary_reduction_for_restart=0.9,
        primal_weight_update_smoothing=0.5,
        use_approximate_localized_duality_gap=False,
    )


def pdhg_params(
    criteria: TerminationCriteria,
    restart_params=None,
    step_size_policy=None,
    ruiz_iterations=0,
    l2_norm_rescaling=False,
    pock_chambolle_alpha=None,
    primal_importance=1.0,
    scale_invariant_initial_primal_weight=True,
    verbosity=0,
    record_iteration_stats=True,
    frequency=40,
) -> PdhgParameters:
    if restart_params is None:
        restart_params = default_restart_params()
    if step_size_policy is None:
        step_size_policy = AdaptiveStepsizeParams(
            reduction_exponent=0.3, growth_exponent=0.6
        )
    return PdhgParameters(
        l_inf_ruiz_iterations=ruiz_iterations,
        l2_norm_rescaling=l2_norm_rescaling,
        pock_chambolle_alpha=pock_chambolle_alpha,
        primal_importance=primal_importance,
        scale_invariant_initial_primal_weight=(
            scale_invariant_initial_primal_weight
        ),
        verbosity=verbosity,
        record_iteration_stats=record_iteration_stats,
        termination_evaluation_frequency=frequency,
        termination_criteria=criteria,
        restart_params=restart_params,
        step_size_policy_params=step_size_policy,
    )
