"""Golden tiny LP/QP fixtures with analytically known optima.

Mirrors test/shared_test_qp_problems.jl of the reference so the solver
integration tests assert against the same hand-solved answers.
"""

import numpy as np

from firstorderlp_tpu import (
    QuadraticProgrammingProblem,
    linear_programming_problem,
)
import scipy.sparse as sp


def example_lp():
    """min 5x1 + 2x2 + x3 + x4 - 14 s.t. 2x1+x2+x3+2x4=12, x1+x3>=7,
    x3-x4>=1, 0<=x<=[2,4,6,3]. Optimal: x=[1,0,6,2], y=[0.5,4,0],
    value -1."""
    return linear_programming_problem(
        [0.0, 0.0, 0.0, 0.0],
        [2.0, 4.0, 6.0, 3.0],
        [5.0, 2.0, 1.0, 1.0],
        -14.0,
        [
            [2.0, 1.0, 1.0, 2.0],
            [1.0, 0.0, 1.0, 0.0],
            [0.0, 0.0, 1.0, -1.0],
        ],
        [12.0, 7.0, 1.0],
        1,
    )


def example_lp_without_bounds():
    """min -x1 s.t. -x1 >= -2. Optimal: x=2, y=[1], value -2."""
    return linear_programming_problem(
        [-np.inf],
        [np.inf],
        [-1.0],
        0.0,
        [[-1.0]],
        [-2.0],
        0,
    )


def example_qp():
    """min 2x1^2 + 0.5x2^2 - x1 - x2 s.t. x1+x2<=1, 0<=x<=1.
    Optimal: x=[0.2, 0.8], y=[0.2]."""
    return QuadraticProgrammingProblem(
        variable_lower_bound=np.array([0.0, 0.0]),
        variable_upper_bound=np.array([1.0, 1.0]),
        objective_matrix=sp.csc_matrix(np.array([[4.0, 0.0], [0.0, 1.0]])),
        objective_vector=np.array([-1.0, -1.0]),
        objective_constant=0.0,
        constraint_matrix=sp.csc_matrix(np.array([[-1.0, -1.0]])),
        right_hand_side=np.array([-1.0]),
        num_equalities=0,
    )


def example_qp2():
    """Like example_qp but objective_vector=[-1, 1].
    Optimal: x=[0.25, 0.0], y=[0.0]."""
    return QuadraticProgrammingProblem(
        variable_lower_bound=np.array([0.0, 0.0]),
        variable_upper_bound=np.array([1.0, 1.0]),
        objective_matrix=sp.csc_matrix(np.array([[4.0, 0.0], [0.0, 1.0]])),
        objective_vector=np.array([-1.0, 1.0]),
        objective_constant=0.0,
        constraint_matrix=sp.csc_matrix(np.array([[-1.0, -1.0]])),
        right_hand_side=np.array([-1.0]),
        num_equalities=0,
    )


def example_cc_lp():
    """Correlation clustering LP (triangle graph), reference l.124-153."""
    return linear_programming_problem(
        [0.0] * 6,
        [1.0] * 6,
        [-1.0, -1.0, 1.0, -1.0, 1.0, -1.0],
        4.0,
        [
            [0.0, -1.0, 1.0, 0.0, 0.0, -1.0],
            [0.0, 0.0, 0.0, -1.0, 1.0, -1.0],
            [-1.0, -1.0, 0.0, 1.0, 0.0, 0.0],
        ],
        [-1.0, -1.0, -1.0],
        0,
    )


def example_cc_star_lp():
    """Correlation clustering LP (star graph), reference l.155-174."""
    return linear_programming_problem(
        [0.0] * 6,
        [1.0] * 6,
        [-1.0, -1.0, -1.0, 1.0, 1.0, 1.0],
        3.0,
        [
            [-1.0, -1.0, 0.0, 1.0, 0.0, 0.0],
            [-1.0, 0.0, -1.0, 0.0, 1.0, 0.0],
            [0.0, -1.0, -1.0, 0.0, 0.0, 1.0],
        ],
        [-1.0, -1.0, -1.0],
        0,
    )


def example_lp_dependent_rows():
    """LP with linearly dependent rows; optimum x=[1,1,0,0], value 3."""
    return linear_programming_problem(
        [0.0] * 4,
        [np.inf] * 4,
        [1.0, 2.0, 3.0, 4.0],
        0.0,
        [
            [1.0, 1.0, 1.0, 1.0],
            [1.0, 1.0, 1.0, 1.0],
            [1.0, 0.0, 0.0, 1.0],
        ],
        [2.0, 2.0, 1.0],
        3,
    )


def example_lp_easy_primal_infeasible():
    return linear_programming_problem(
        [0.0, 0.0],
        [np.inf, np.inf],
        [1.0, 0.5],
        0.0,
        [[-1.0, -1.0]],
        [1.0],
        1,
    )


def example_lp_hard_primal_infeasible(tol: float):
    assert tol > 0.0
    return linear_programming_problem(
        [0.0] * 4,
        [np.inf] * 4,
        [1.0, 2.0, 3.0, 4.0],
        0.0,
        [
            [1.0, 1.0, 0.0, 0.0],
            [0.0, 1.0, 1.0, 0.0],
            [0.0, 0.0, 1.0, 1.0],
            [1.0, 1.0, 1.0, 1.0],
        ],
        [1.0, 1.0, 1.0, 2.0 + tol],
        4,
    )


def example_lp_dual_infeasible():
    return linear_programming_problem(
        [0.0, 0.0],
        [np.inf, np.inf],
        [-1.0, 0.4],
        0.0,
        [[1.0, -2.0]],
        [1.0],
        1,
    )
