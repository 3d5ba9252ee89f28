"""Termination criteria truth table (reference test/test_termination.jl)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from firstorderlp_tpu.iteration_stats import (
    DeviceConvergenceInfo,
    DeviceInfeasibilityInfo,
)
from firstorderlp_tpu.solve_log import TerminationReason
from firstorderlp_tpu.termination import (
    OptimalityNorm,
    TerminationCriteria,
    cached_quadratic_program_info,
    check_termination_criteria,
    construct_termination_criteria,
    dual_infeasibility_criteria_met,
    optimality_criteria_met,
    primal_infeasibility_criteria_met,
)

from fixtures import example_qp

EPS_PRIMAL_INFEASIBLE = 1e-6
EPS_DUAL_INFEASIBLE = 1e-6


def conv_info(**overrides):
    base = {f: jnp.asarray(0.0) for f in DeviceConvergenceInfo._fields}
    base.update({k: jnp.asarray(v) for k, v in overrides.items()})
    return DeviceConvergenceInfo(**base)


def infeas_info(**overrides):
    base = {f: jnp.asarray(0.0) for f in DeviceInfeasibilityInfo._fields}
    base.update({k: jnp.asarray(v) for k, v in overrides.items()})
    return DeviceInfeasibilityInfo(**base)


# Reference scenarios (test_termination.jl:17-28).
INFEAS_NONE1 = infeas_info()
INFEAS_NONE2 = infeas_info(
    primal_ray_linear_objective=-1.0,
    primal_ray_quadratic_norm=1.0,
    max_dual_ray_infeasibility=1.0,
)
INFEAS_DUAL = infeas_info(primal_ray_linear_objective=-1.0)
INFEAS_PRIMAL = infeas_info(dual_ray_objective=1.0)


def test_primal_infeasibility_criteria():
    assert not bool(
        primal_infeasibility_criteria_met(EPS_PRIMAL_INFEASIBLE, INFEAS_NONE1)
    )
    assert not bool(
        primal_infeasibility_criteria_met(EPS_PRIMAL_INFEASIBLE, INFEAS_NONE2)
    )
    assert not bool(
        primal_infeasibility_criteria_met(EPS_PRIMAL_INFEASIBLE, INFEAS_DUAL)
    )
    assert bool(
        primal_infeasibility_criteria_met(EPS_PRIMAL_INFEASIBLE, INFEAS_PRIMAL)
    )


def test_dual_infeasibility_criteria():
    assert not bool(
        dual_infeasibility_criteria_met(EPS_DUAL_INFEASIBLE, INFEAS_NONE1)
    )
    assert not bool(
        dual_infeasibility_criteria_met(EPS_DUAL_INFEASIBLE, INFEAS_NONE2)
    )
    assert bool(
        dual_infeasibility_criteria_met(EPS_DUAL_INFEASIBLE, INFEAS_DUAL)
    )
    assert not bool(
        dual_infeasibility_criteria_met(EPS_DUAL_INFEASIBLE, INFEAS_PRIMAL)
    )


CONV_OPTIMAL = conv_info(
    primal_objective=1.0,
    dual_objective=1.0,
    l_inf_primal_variable=1.0,
    l2_primal_variable=1.0,
    l_inf_dual_variable=2.0,
    l2_dual_variable=2.0,
)
CONV_BAD_GAP = CONV_OPTIMAL._replace(primal_objective=jnp.asarray(10.0))
CONV_BAD_PRIMAL = CONV_OPTIMAL._replace(
    l_inf_primal_residual=jnp.asarray(1.0),
    l2_primal_residual=jnp.asarray(1.0),
)
CONV_BAD_DUAL = CONV_OPTIMAL._replace(
    l_inf_dual_residual=jnp.asarray(1.0), l2_dual_residual=jnp.asarray(1.0)
)


def criteria(norm, **overrides):
    base = dict(
        optimality_norm=norm,
        eps_optimal_absolute=1e-4,
        eps_optimal_relative=1e-4,
        eps_primal_infeasible=EPS_PRIMAL_INFEASIBLE,
        eps_dual_infeasible=EPS_DUAL_INFEASIBLE,
        time_sec_limit=100.0,
        iteration_limit=10,
        kkt_matrix_pass_limit=10000.0,
    )
    base.update(overrides)
    return construct_termination_criteria(**base)


def test_optimality_and_termination_reasons():
    qp_cache = cached_quadratic_program_info(example_qp())
    for norm in (OptimalityNorm.L_INF, OptimalityNorm.L2):
        crit = criteria(norm)
        for bad in (CONV_BAD_GAP, CONV_BAD_PRIMAL, CONV_BAD_DUAL):
            assert not bool(optimality_criteria_met(crit, bad, qp_cache))
        assert bool(optimality_criteria_met(crit, CONV_OPTIMAL, qp_cache))

        def check(crit, conv, iteration=5, kkt=100.5, time_sec=5.0):
            return int(
                check_termination_criteria(
                    crit, qp_cache, conv, INFEAS_NONE1,
                    jnp.asarray(iteration), jnp.asarray(kkt),
                    jnp.asarray(time_sec),
                )
            )

        assert (
            check(crit, CONV_OPTIMAL)
            == TerminationReason.TERMINATION_REASON_OPTIMAL
        )
        assert check(crit, CONV_BAD_GAP) == 0

        assert (
            check(criteria(norm, time_sec_limit=1.0), CONV_BAD_GAP)
            == TerminationReason.TERMINATION_REASON_TIME_LIMIT
        )
        assert (
            check(
                criteria(norm, time_sec_limit=10.0, iteration_limit=1),
                CONV_BAD_GAP,
            )
            == TerminationReason.TERMINATION_REASON_ITERATION_LIMIT
        )
        assert (
            check(
                criteria(norm, kkt_matrix_pass_limit=40.0), CONV_BAD_GAP
            )
            == TerminationReason.TERMINATION_REASON_KKT_MATRIX_PASS_LIMIT
        )
