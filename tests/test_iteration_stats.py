"""Hand-computed stats oracles (reference test/test_iteration_stats.jl)."""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from firstorderlp_tpu.iteration_stats import (
    compute_convergence_information,
    compute_dual_stats,
    compute_infeasibility_information,
    primal_residual_norms,
    print_to_screen_this_iteration,
)
from firstorderlp_tpu.ops.device_problem import to_device
from firstorderlp_tpu.problem import linear_programming_problem
from firstorderlp_tpu.termination import cached_quadratic_program_info

from fixtures import example_qp


def make_lp(lb, ub, c, const, a, b, num_eq):
    return linear_programming_problem(
        np.asarray(lb, float),
        np.asarray(ub, float),
        np.asarray(c, float),
        const,
        sp.csc_matrix(np.asarray(a, float)),
        np.asarray(b, float),
        num_eq,
    )


def cache_tuple(problem):
    """DeviceQpCache-compatible plain object from the host cache."""
    return cached_quadratic_program_info(problem)


def test_max_primal_violation():
    # min 0  s.t. y == 10, z >= 11, -1 <= x <= 1 (reference l.27-48).
    lp = make_lp(
        [-1.0, -np.inf, -np.inf],
        [1.0, np.inf, np.inf],
        np.zeros(3),
        0.0,
        [[0.0, 1.0, 0.0], [0.0, 0.0, 1.0]],
        [10.0, 11.0],
        1,
    )
    dev = to_device(lp)

    def viol(x):
        return float(primal_residual_norms(dev, jnp.asarray(x, float))[0])

    assert viol([0.0, 10.0, 11.0]) == 0.0
    assert np.isclose(viol([-2.0, 10.0, 11.0]), 1.0)
    assert np.isclose(viol([3.0, 10.0, 11.0]), 2.0)
    assert np.isclose(viol([0.0, 11.0, 11.0]), 1.0)
    assert np.isclose(viol([0.0, 9.0, 11.0]), 1.0)
    assert np.isclose(viol([0.0, 11.0, 0.0]), 11.0)


DUAL_LP = make_lp(
    [-1.0, -np.inf], [1.0, np.inf], [1.0, 2.0], 0.0, [[1.0, 1.0]], [1.0], 0
)


def dual_stats_for(lp, primal, dual):
    dev = to_device(lp)
    primal = jnp.asarray(primal, float)
    dual = jnp.asarray(dual, float)
    qx = dev.qx(primal)
    pg = qx + dev.objective_vector - dev.aty(dual)
    return compute_dual_stats(dev, primal, dual, pg, jnp.sum(primal * qx))


def test_dual_stats_lp():
    # Reference l.49-101: dual is max a - b - c s.t. a + b - c = 1, a = 2.
    ds0 = dual_stats_for(DUAL_LP, [0.0, 0.0], [0.0])
    assert float(ds0.dual_objective) == -1.0
    assert float(ds0.l_inf_dual_residual) == 2.0

    ds1 = dual_stats_for(DUAL_LP, [0.0, 0.0], [1.0])
    assert float(ds1.dual_objective) == 1.0
    assert float(ds1.l_inf_dual_residual) == 1.0

    ds2 = dual_stats_for(DUAL_LP, [0.0, 0.0], [2.0])
    assert float(ds2.dual_objective) == 1.0
    assert float(ds2.l_inf_dual_residual) == 0.0

    ds3 = dual_stats_for(DUAL_LP, [0.0, 0.0], [3.0])
    assert float(ds3.dual_objective) == 1.0
    assert float(ds3.l_inf_dual_residual) == 1.0

    ds4 = dual_stats_for(DUAL_LP, [0.0, 1.0], [-1.0])
    assert float(ds4.dual_objective) == -3.0
    assert float(ds4.l2_dual_residual) == np.linalg.norm([1.0, 0.0, 3.0])


def test_dual_stats_free_variable_lp():
    # Reference l.92-102: first variable has empty bound interval in the
    # reference ([Inf, Inf] lower/upper means no finite bound to assign a
    # reduced cost to).
    lp = make_lp(
        [np.inf, -np.inf], [np.inf, np.inf], [1.0, 2.0], 0.0,
        [[1.0, 1.0]], [1.0], 0,
    )
    ds5 = dual_stats_for(lp, [0.0, 1.0], [-1.0])
    assert float(ds5.dual_objective) == -1.0
    assert float(ds5.l2_dual_residual) == np.linalg.norm([1.0, 2.0, 3.0])


def test_dual_stats_qp():
    # Reference l.104-116 on example_qp.
    qp = example_qp()
    ds6 = dual_stats_for(qp, [0.0, 0.0], [3.0])
    assert float(ds6.dual_objective) == -3.0
    assert float(ds6.l_inf_dual_residual) == 0.0

    ds7 = dual_stats_for(qp, [0.0, 0.0], [1.0])
    assert float(ds7.dual_objective) == -1.0
    assert float(ds7.l_inf_dual_residual) == 0.0

    ds8 = dual_stats_for(qp, [0.5, 0.5], [1.0])
    assert float(ds8.dual_objective) == -1.625
    assert float(ds8.l_inf_dual_residual) == 0.0


def conv_for(lp, primal, dual, eps_ratio=1.0):
    dev = to_device(lp)
    cache = cached_quadratic_program_info(lp)
    return compute_convergence_information(
        dev, cache, jnp.asarray(primal, float), jnp.asarray(dual, float),
        eps_ratio,
    )


def test_primal_dual_optimal_stats():
    # Reference l.120-178: optimal pair of the small LP.
    conv = conv_for(DUAL_LP, [1.0, 0.0], [2.0])
    assert float(conv.primal_objective) == 1.0
    assert float(conv.dual_objective) == 1.0
    assert float(conv.corrected_dual_objective) == 1.0
    assert float(conv.l_inf_primal_residual) == 0.0
    assert float(conv.l2_primal_residual) == 0.0
    assert float(conv.l_inf_dual_residual) == 0.0
    assert float(conv.l_inf_primal_variable) == 1.0
    assert float(conv.l2_primal_variable) == 1.0
    assert float(conv.l_inf_dual_variable) == 2.0
    assert float(conv.l2_dual_variable) == 2.0

    infeas = compute_infeasibility_information(
        to_device(DUAL_LP), jnp.zeros(2), jnp.zeros(1)
    )
    for field in infeas._fields:
        assert float(getattr(infeas, field)) == 0.0


def test_primal_infeasible_stats():
    # Reference l.179-247: min x + 2 s.t. x = 10, 0 <= x <= 1.
    lp = make_lp([0.0], [1.0], [1.0], 2.0, [[1.0]], [10.0], 1)
    conv = conv_for(lp, [2.0], [1.0])
    assert float(conv.primal_objective) == 4.0
    assert float(conv.dual_objective) == 12.0
    assert float(conv.corrected_dual_objective) == 12.0
    assert float(conv.l_inf_primal_residual) == 8.0
    assert np.isclose(
        float(conv.l2_primal_residual), np.linalg.norm([8.0, 1.0])
    )
    assert np.isclose(
        float(conv.relative_l_inf_primal_residual), 8.0 / (1.0 + 10.0)
    )
    assert np.isclose(float(conv.relative_optimality_gap), 8.0 / (1.0 + 16.0))
    assert float(conv.l_inf_primal_variable) == 2.0
    assert float(conv.l_inf_dual_variable) == 1.0

    infeas = compute_infeasibility_information(
        to_device(lp), jnp.asarray([0.0]), jnp.asarray([1.0])
    )
    assert float(infeas.dual_ray_objective) == 9.0
    assert float(infeas.max_dual_ray_infeasibility) == 0.0


def test_dual_infeasible_stats():
    # Reference l.248-305: min -x s.t. x >= 10 (unbounded below).
    lp = make_lp([-np.inf], [np.inf], [-1.0], 0.0, [[1.0]], [10.0], 0)
    conv = conv_for(lp, [10.0], [0.0])
    assert float(conv.primal_objective) == -10.0
    assert float(conv.corrected_dual_objective) == -np.inf
    assert float(conv.l_inf_dual_residual) == 1.0
    assert float(conv.l2_dual_residual) == 1.0
    assert np.isclose(
        float(conv.relative_l_inf_dual_residual), 1.0 / (1.0 + 1.0)
    )
    assert np.isclose(
        float(conv.relative_optimality_gap), 10.0 / (1.0 + 10.0)
    )
    assert float(conv.l_inf_primal_variable) == 10.0

    infeas = compute_infeasibility_information(
        to_device(lp), jnp.asarray([1.0]), jnp.asarray([0.0])
    )
    assert float(infeas.primal_ray_linear_objective) == -1.0
    assert float(infeas.max_primal_ray_infeasibility) == 0.0


def test_print_to_screen_this_iteration():
    # Reference l.306-343.
    freq = 10
    assert print_to_screen_this_iteration(False, 1, 2, freq)
    assert print_to_screen_this_iteration(False, 101, 5, freq)
    assert not print_to_screen_this_iteration(False, 31, 5, freq)
    assert not print_to_screen_this_iteration(False, 531, 5, freq)
    assert print_to_screen_this_iteration(True, 124, 5, freq)
