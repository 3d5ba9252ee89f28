"""Two-sided QP -> canonical standard form transformation.

Reference semantics: src/quadratic_programming_io.jl:15-197.
- two-sided constraint rows get a slack variable and become equalities,
- "<=" rows are sign-flipped into ">=" rows,
- equality rows are permuted to the front.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import scipy.sparse as sp

from ..problem import QuadraticProgrammingProblem
from .mps import read_mps


@dataclasses.dataclass
class TwoSidedQpProblem:
    """QP with two-sided constraints lcon <= A x <= ucon.

    Mirrors reference src/quadratic_programming_io.jl:15-32.
    """

    variable_lower_bound: np.ndarray
    variable_upper_bound: np.ndarray
    constraint_lower_bound: np.ndarray
    constraint_upper_bound: np.ndarray
    constraint_matrix: sp.spmatrix
    objective_offset: float
    objective_vector: np.ndarray
    objective_matrix: sp.spmatrix


def two_sided_rows_to_slacks(qp: TwoSidedQpProblem) -> None:
    """In place: rows with distinct finite bounds get slacks.

    `l <= a'x <= u` becomes `a'x - s = 0, l <= s <= u`
    (reference l.89-131).
    """
    two_sided = np.flatnonzero(
        np.isfinite(qp.constraint_lower_bound)
        & np.isfinite(qp.constraint_upper_bound)
        & (qp.constraint_lower_bound != qp.constraint_upper_bound)
    )
    if len(two_sided) == 0:
        return

    num_rows = len(qp.constraint_lower_bound)
    k = len(two_sided)
    slack_matrix = sp.csc_matrix(
        (-np.ones(k), (two_sided, np.arange(k))), shape=(num_rows, k)
    )
    qp.variable_lower_bound = np.concatenate(
        [qp.variable_lower_bound, qp.constraint_lower_bound[two_sided]]
    )
    qp.variable_upper_bound = np.concatenate(
        [qp.variable_upper_bound, qp.constraint_upper_bound[two_sided]]
    )
    qp.objective_vector = np.concatenate([qp.objective_vector, np.zeros(k)])
    qp.constraint_matrix = sp.hstack(
        [sp.csc_matrix(qp.constraint_matrix), slack_matrix], format="csc"
    )
    qp.constraint_lower_bound = qp.constraint_lower_bound.copy()
    qp.constraint_upper_bound = qp.constraint_upper_bound.copy()
    qp.constraint_lower_bound[two_sided] = 0.0
    qp.constraint_upper_bound[two_sided] = 0.0

    new_n = len(qp.variable_lower_bound)
    qmat = sp.coo_matrix(qp.objective_matrix)
    qp.objective_matrix = sp.csc_matrix(
        (qmat.data, (qmat.row, qmat.col)), shape=(new_n, new_n)
    )


def transform_to_standard_form(
    qp: TwoSidedQpProblem,
) -> QuadraticProgrammingProblem:
    """Two-sided form -> canonical standard form (reference l.34-87).

    The input is destructively modified (slacks added in place).
    """
    two_sided_rows_to_slacks(qp)

    lcon = qp.constraint_lower_bound
    ucon = qp.constraint_upper_bound
    is_equality = lcon == ucon
    is_geq = ~is_equality & np.isfinite(lcon)
    is_leq = ~is_equality & np.isfinite(ucon)
    if np.any(is_geq & is_leq):
        raise AssertionError("two-sided rows should have been removed")
    num_equalities = int(np.sum(is_equality))
    if num_equalities + int(np.sum(is_geq)) + int(np.sum(is_leq)) != len(lcon):
        raise ValueError(
            "Not all constraints have finite bounds on at least one side."
        )

    # Flip "<=" rows to ">=" rows and permute equalities first.
    row_sign = np.where(is_leq, -1.0, 1.0)
    matrix = sp.csc_matrix(qp.constraint_matrix, copy=True)
    coo = matrix.tocoo()
    data = coo.data * row_sign[coo.row]

    new_row_to_old = np.concatenate(
        [np.flatnonzero(is_equality), np.flatnonzero(~is_equality)]
    )
    old_row_to_new = np.empty(len(lcon), dtype=np.int64)
    old_row_to_new[new_row_to_old] = np.arange(len(lcon))

    permuted = sp.csc_matrix(
        (data, (old_row_to_new[coo.row], coo.col)), shape=matrix.shape
    )

    right_hand_side = np.where(is_leq, -ucon, lcon)[new_row_to_old]

    return QuadraticProgrammingProblem(
        variable_lower_bound=qp.variable_lower_bound,
        variable_upper_bound=qp.variable_upper_bound,
        objective_matrix=sp.csc_matrix(qp.objective_matrix),
        objective_vector=qp.objective_vector,
        objective_constant=float(qp.objective_offset),
        constraint_matrix=permuted,
        right_hand_side=right_hand_side,
        num_equalities=num_equalities,
    )


def qps_reader_to_standard_form(
    filename: str, fixed_format: bool = False
) -> QuadraticProgrammingProblem:
    """Reads an .mps/.qps(.gz) file into canonical standard form.

    Reference: src/quadratic_programming_io.jl:147-197. The quadratic
    objective sections give the lower triangle; it is symmetrized here.
    """
    mps = read_mps(filename, fixed_format=fixed_format)
    if mps.objsense not in ("notset", "min"):
        raise ValueError(f"Unsupported objective sense: {mps.objsense}")

    constraint_matrix = sp.csc_matrix(
        (mps.avals, (mps.arows, mps.acols)), shape=(mps.ncon, mps.nvar)
    )

    # Symmetrize Q from the lower triangle (reference l.166-182).
    off_diag = mps.qrows != mps.qcols
    q_rows = np.concatenate([mps.qrows, mps.qcols[off_diag]])
    q_cols = np.concatenate([mps.qcols, mps.qrows[off_diag]])
    q_vals = np.concatenate([mps.qvals, mps.qvals[off_diag]])
    objective_matrix = sp.csc_matrix(
        (q_vals, (q_rows, q_cols)), shape=(mps.nvar, mps.nvar)
    )

    return transform_to_standard_form(
        TwoSidedQpProblem(
            variable_lower_bound=mps.lvar,
            variable_upper_bound=mps.uvar,
            constraint_lower_bound=mps.lcon,
            constraint_upper_bound=mps.ucon,
            constraint_matrix=constraint_matrix,
            objective_offset=mps.c0,
            objective_vector=mps.c,
            objective_matrix=objective_matrix,
        )
    )
