"""Preprocess tests mirroring reference test/test_qp_processing.jl."""

import copy

import numpy as np
import pytest
import scipy.sparse as sp

from firstorderlp_tpu import (
    l2_norm_rescaling,
    pock_chambolle_rescaling,
    presolve,
    rescale_problem,
    ruiz_rescaling,
    scale_problem,
    undo_presolve,
    unscale_problem,
)
from firstorderlp_tpu.preprocess import PrimalInfeasibleError
from firstorderlp_tpu.problem import (
    get_col_l_inf_norms,
    get_row_l_inf_norms,
    get_col_l2_norms,
    get_row_l2_norms,
)

from fixtures import example_lp, example_qp


def test_scale_unscale_roundtrip():
    problem = example_lp()
    original = copy.deepcopy(problem)
    con = np.array([2.0, 0.5, 4.0])
    var = np.array([1.0, 2.0, 0.25, 8.0])
    scale_problem(problem, con, var)
    # Spot-check the contract: A_scaled = E^-1 A D^-1.
    np.testing.assert_allclose(
        problem.constraint_matrix.toarray(),
        original.constraint_matrix.toarray() / np.outer(con, var),
    )
    np.testing.assert_allclose(
        problem.right_hand_side, original.right_hand_side / con
    )
    np.testing.assert_allclose(
        problem.objective_vector, original.objective_vector / var
    )
    np.testing.assert_allclose(
        problem.variable_lower_bound, original.variable_lower_bound * var
    )
    unscale_problem(problem, con, var)
    np.testing.assert_allclose(
        problem.constraint_matrix.toarray(),
        original.constraint_matrix.toarray(),
    )
    np.testing.assert_allclose(
        problem.right_hand_side, original.right_hand_side
    )


def test_ruiz_converges_to_unit_linf_norms():
    """After many L_inf Ruiz iterations all row/col norms of M = [Q A'; A 0]
    approach 1 (reference test asserts the same, l.483-514)."""
    problem = example_lp()
    ruiz_rescaling(problem, 20, np.inf)
    a = problem.constraint_matrix
    np.testing.assert_allclose(
        get_row_l_inf_norms(a), np.ones(a.shape[0]), atol=1e-6
    )
    np.testing.assert_allclose(
        get_col_l_inf_norms(a), np.ones(a.shape[1]), atol=1e-6
    )


def test_ruiz_qp_converges():
    problem = example_qp()
    ruiz_rescaling(problem, 30, np.inf)
    a = problem.constraint_matrix.toarray()
    q = problem.objective_matrix.toarray()
    m_top = np.hstack([q, a.T])
    m_bottom = np.hstack([a, np.zeros((a.shape[0], a.shape[0]))])
    m = np.vstack([m_top, m_bottom])
    norms = np.max(np.abs(m), axis=0)
    np.testing.assert_allclose(norms, np.ones(len(norms)), atol=1e-6)


def test_ruiz_l2_lp_row_norm_target():
    problem = example_lp()
    ruiz_rescaling(problem, 200, 2.0)
    a = problem.constraint_matrix
    m, n = a.shape
    np.testing.assert_allclose(
        get_row_l2_norms(a), np.sqrt(n / m) * np.ones(m), atol=1e-4
    )
    np.testing.assert_allclose(
        get_col_l2_norms(a), np.ones(n), atol=1e-4
    )


def test_pock_chambolle_alpha_one():
    """alpha=1: col j / sqrt(sum |a_ij|), row i / sqrt(sum |a_ij|)."""
    problem = example_lp()
    original = copy.deepcopy(problem)
    con, var = pock_chambolle_rescaling(problem, alpha=1.0)
    a0 = np.abs(original.constraint_matrix.toarray())
    np.testing.assert_allclose(var, np.sqrt(a0.sum(axis=0)))
    np.testing.assert_allclose(con, np.sqrt(a0.sum(axis=1)))
    # Operator norm of the rescaled matrix is <= 1 (Lemma 2).
    s = np.linalg.svd(problem.constraint_matrix.toarray(), compute_uv=False)
    assert s[0] <= 1.0 + 1e-12


def test_l2_norm_rescaling_known_values():
    problem = example_lp()
    original = copy.deepcopy(problem)
    con, var = l2_norm_rescaling(problem)
    np.testing.assert_allclose(
        con, np.sqrt(get_row_l2_norms(original.constraint_matrix))
    )
    np.testing.assert_allclose(
        var, np.sqrt(get_col_l2_norms(original.constraint_matrix))
    )


def test_rescale_problem_composition():
    problem = example_lp()
    scaled = rescale_problem(10, True, 1.0, 0, problem)
    # unscale recovers the original problem.
    recovered = copy.deepcopy(scaled.scaled_qp)
    unscale_problem(
        recovered, scaled.constraint_rescaling, scaled.variable_rescaling
    )
    np.testing.assert_allclose(
        recovered.constraint_matrix.toarray(),
        problem.constraint_matrix.toarray(),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        recovered.right_hand_side, problem.right_hand_side, atol=1e-12
    )
    np.testing.assert_allclose(
        recovered.objective_vector, problem.objective_vector, atol=1e-12
    )
    # Original problem untouched.
    np.testing.assert_allclose(
        problem.constraint_matrix.toarray(),
        example_lp().constraint_matrix.toarray(),
    )


def _lp_with_empty_row_and_col():
    from firstorderlp_tpu import linear_programming_problem

    return linear_programming_problem(
        [0.0, 0.0, 0.0],
        [np.inf, np.inf, np.inf],
        [1.0, 2.0, 3.0],
        0.0,
        [
            [1.0, 1.0, 0.0],
            [0.0, 0.0, 0.0],  # empty row (>= with rhs 0 is satisfiable)
        ],
        [1.0, 0.0],
        0,
    )


def test_presolve_removes_empty_rows_and_columns():
    problem = _lp_with_empty_row_and_col()
    info = presolve(problem, verbosity=0)
    assert problem.constraint_matrix.shape == (1, 2)
    assert info.empty_rows == [1]
    assert info.empty_columns == [2]
    # x3 fixed at lower bound 0 with coefficient 3 -> constant += 0.
    assert problem.objective_constant == 0.0

    primal, dual = undo_presolve(info, np.array([0.5, 0.5]), np.array([7.0]))
    np.testing.assert_allclose(primal, [0.5, 0.5, 0.0])
    np.testing.assert_allclose(dual, [7.0, 0.0])


def test_presolve_empty_column_objective_constant():
    from firstorderlp_tpu import linear_programming_problem

    problem = linear_programming_problem(
        [0.0, 2.0],
        [np.inf, 5.0],
        [1.0, -3.0],
        0.0,
        [[1.0, 0.0]],
        [1.0],
        0,
    )
    presolve(problem, verbosity=0)
    # Empty col with negative coefficient fixed at upper bound 5: -15.
    assert problem.objective_constant == -15.0


def test_presolve_detects_infeasible_empty_row():
    from firstorderlp_tpu import linear_programming_problem

    problem = linear_programming_problem(
        [0.0],
        [1.0],
        [1.0],
        0.0,
        [[1.0], [0.0]],
        [0.5, 1.0],  # empty inequality row with rhs 1 > 0 -> infeasible
        0,
    )
    with pytest.raises(PrimalInfeasibleError):
        presolve(problem, verbosity=0)


def test_undo_presolve_projects_primal():
    problem = _lp_with_empty_row_and_col()
    problem.variable_lower_bound = np.array([0.0, 0.0, 2.0])
    info = presolve(problem, verbosity=0)
    primal, _ = undo_presolve(info, np.array([0.5, -1.0]), np.array([0.0]))
    # Reinserted empty column gets 0 then projected to its lower bound 2;
    # the negative entry is clipped to the original bounds.
    np.testing.assert_allclose(primal, [0.5, 0.0, 2.0])


# ---------------------------------------------------------------------------
# Bound-width rescaling (round-4 framework addition, no reference
# counterpart - preprocess.bound_width_rescaling)
# ---------------------------------------------------------------------------


def test_bound_width_rescaling_normalizes_widths():
    import numpy as np
    import scipy.sparse as sp

    from firstorderlp_tpu import linear_programming_problem
    from firstorderlp_tpu.preprocess import rescale_problem

    lo = np.array([0.0, -1e4, 0.0, -np.inf, 2.0])
    hi = np.array([1e-3, 1e4, np.inf, 5.0, 2.0])  # widths: 1e-3, 2e4,
    # inf (one-sided), inf (one-sided), 0 (fixed)
    problem = linear_programming_problem(
        lo, hi, np.ones(5), 0.0,
        sp.eye(5, format="csc"), np.zeros(5), 0,
    )
    scaled = rescale_problem(
        0, False, None, 0, problem, bound_width_rescaling_flag=True
    )
    slo = scaled.scaled_qp.variable_lower_bound
    shi = scaled.scaled_qp.variable_upper_bound
    width = shi - slo
    # two-sided finite variables -> unit width
    np.testing.assert_allclose(width[0], 1.0)
    np.testing.assert_allclose(width[1], 1.0)
    # one-sided / free / fixed variables untouched
    np.testing.assert_allclose(scaled.variable_rescaling[2:], 1.0)
    # invertibility: cumulative vectors recover the original bounds
    np.testing.assert_allclose(
        slo / scaled.variable_rescaling, lo
    )


def test_bound_width_rescaling_solves_badly_scaled_lp():
    """A planted bound-width spread makes the duality-gap criterion
    ill-conditioned even with a perfectly Ruiz-equilibrated matrix;
    the bound-width step fixes the conditioning (measured 13x fewer
    KKT passes on the campaign's badly_scaled family; here a small
    instance must certify 1e-8 within a budget the plain pipeline
    busts)."""
    import dataclasses

    import numpy as np
    import scipy.sparse as sp

    from firstorderlp_tpu import (
        TerminationReason,
        linear_programming_problem,
    )
    from firstorderlp_tpu.models.pdhg import optimize

    from utils import optimality_criteria, pdhg_params

    rng = np.random.default_rng(7)
    m, n = 80, 60
    a = sp.random(
        m, n, density=0.15, random_state=np.random.RandomState(7),
        data_rvs=rng.standard_normal, format="csc",
    )
    a = sp.csc_matrix(
        a + sp.csc_matrix(
            (np.ones(m), (np.arange(m), rng.integers(0, n, m))),
            shape=(m, n),
        )
    )
    x0 = rng.uniform(-1, 1, n)
    b = np.asarray(a @ x0).ravel()
    b[8:] -= rng.uniform(0.1, 1.0, m - 8)
    row_scale = 10.0 ** rng.uniform(-4, 4, m)
    col_scale = 10.0 ** rng.uniform(-4, 4, n)
    a_bad = sp.csc_matrix(
        sp.diags(row_scale) @ a @ sp.diags(col_scale)
    )
    problem = linear_programming_problem(
        np.full(n, -2.0) / col_scale,
        np.full(n, 2.0) / col_scale,
        rng.standard_normal(n) * col_scale,
        0.0,
        a_bad,
        b * row_scale,
        8,
    )
    criteria = dataclasses.replace(
        optimality_criteria(1e-8), kkt_matrix_pass_limit=2e4
    )
    base = pdhg_params(
        criteria, ruiz_iterations=10, pock_chambolle_alpha=1.0
    )
    plain = optimize(base, problem)
    fixed = optimize(
        dataclasses.replace(base, bound_width_rescaling=True), problem
    )
    assert (
        fixed.termination_reason
        == TerminationReason.TERMINATION_REASON_OPTIMAL
    ), fixed.termination_string
    assert (
        plain.termination_reason
        != TerminationReason.TERMINATION_REASON_OPTIMAL
    ), "plain pipeline unexpectedly solved; tighten the planted spread"
    # and the solution is the ORIGINAL problem's optimum (criteria are
    # evaluated on the unscaled problem)
    ci = fixed.iteration_stats[-1].convergence_information[0]
    assert ci.relative_l2_primal_residual < 1e-8
    assert abs(ci.relative_optimality_gap) < 1e-8
