"""Presolve and rescaling (host-side preprocessing, runs once per solve).

Reference semantics: src/preprocess.jl. These transforms are one-shot,
O(nnz) passes over the problem data; they run on the host in numpy/scipy
before the problem is staged onto TPU (the per-iteration solver math is the
device-side hot path, see models/).
"""

from __future__ import annotations

import copy
import dataclasses
from typing import List, Optional, Tuple

import numpy as np
import scipy.sparse as sp

from .problem import (
    QuadraticProgrammingProblem,
    ScaledQpProblem,
    print_problem_details,
)


def sparse_l2_norms(matrix: sp.spmatrix, axis: int) -> np.ndarray:
    """L2 norm of each row (axis=1) or column (axis=0).

    Overflow-safe analogue of reference src/preprocess.jl:99-113 (numpy
    accumulates in float64; the explicit max-rescale of the reference is
    unnecessary here for the value ranges involved).
    """
    sq = matrix.multiply(matrix)
    return np.sqrt(np.asarray(sq.sum(axis=0 if axis == 0 else 1)).ravel())


def _col_linf(matrix: sp.spmatrix) -> np.ndarray:
    coo = matrix.tocoo()
    out = np.zeros(matrix.shape[1])
    np.maximum.at(out, coo.col, np.abs(coo.data))
    return out


def _row_linf(matrix: sp.spmatrix) -> np.ndarray:
    coo = matrix.tocoo()
    out = np.zeros(matrix.shape[0])
    np.maximum.at(out, coo.row, np.abs(coo.data))
    return out


def scale_problem(
    problem: QuadraticProgrammingProblem,
    constraint_rescaling: np.ndarray,
    variable_rescaling: np.ndarray,
) -> None:
    """Rescales `problem` in place by D = diag(variable_rescaling),
    E = diag(constraint_rescaling):

        Q <- D^-1 Q D^-1,  c <- D^-1 c,  l,u <- D l, D u,
        A <- E^-1 A D^-1,  b <- E^-1 b.

    Reference contract: src/preprocess.jl:541-573.
    """
    if np.any(constraint_rescaling <= 0) or np.any(variable_rescaling <= 0):
        raise ValueError("scaling vectors must be positive")
    inv_var = 1.0 / variable_rescaling
    inv_con = 1.0 / constraint_rescaling
    problem.objective_vector = problem.objective_vector * inv_var
    d_inv = sp.diags(inv_var)
    e_inv = sp.diags(inv_con)
    problem.objective_matrix = sp.csc_matrix(
        d_inv @ problem.objective_matrix @ d_inv
    )
    problem.variable_upper_bound = (
        problem.variable_upper_bound * variable_rescaling
    )
    problem.variable_lower_bound = (
        problem.variable_lower_bound * variable_rescaling
    )
    problem.right_hand_side = problem.right_hand_side * inv_con
    problem.constraint_matrix = sp.csc_matrix(
        e_inv @ problem.constraint_matrix @ d_inv
    )


def unscale_problem(
    problem: QuadraticProgrammingProblem,
    constraint_rescaling: np.ndarray,
    variable_rescaling: np.ndarray,
) -> None:
    """Inverse of scale_problem (reference l.575-587)."""
    scale_problem(problem, 1.0 / constraint_rescaling, 1.0 / variable_rescaling)


def l2_norm_rescaling(
    problem: QuadraticProgrammingProblem,
) -> Tuple[np.ndarray, np.ndarray]:
    """One-pass rescale by sqrt of row/col L2 norms (reference l.343-372)."""
    norm_rows = sparse_l2_norms(problem.constraint_matrix, axis=1)
    norm_cols = sparse_l2_norms(problem.constraint_matrix, axis=0)
    norm_rows[norm_rows == 0] = 1.0
    norm_cols[norm_cols == 0] = 1.0
    row_rescale = np.sqrt(norm_rows)
    col_rescale = np.sqrt(norm_cols)
    scale_problem(problem, row_rescale, col_rescale)
    return row_rescale, col_rescale


def ruiz_rescaling(
    problem: QuadraticProgrammingProblem,
    num_iterations: int,
    p: float = np.inf,
) -> Tuple[np.ndarray, np.ndarray]:
    """Iterative Ruiz equilibration of M = [Q A'; A 0].

    p = inf: divide rows/cols by sqrt of their Linf norms (both matrices
    approach unit row/col Linf norms of M). p = 2: L2 variant with target
    row norm sqrt(n/m) for LP, sqrt(n/(m+n)) for QP.
    Reference: src/preprocess.jl:374-477.
    """
    num_constraints, num_variables = problem.constraint_matrix.shape
    cum_constraint = np.ones(num_constraints)
    cum_variable = np.ones(num_variables)

    for _ in range(num_iterations):
        a = problem.constraint_matrix
        q = problem.objective_matrix
        if p == np.inf:
            variable_rescaling = np.sqrt(
                np.maximum(_col_linf(a), _col_linf(q))
            )
        elif p == 2:
            variable_rescaling = np.sqrt(
                np.sqrt(
                    sparse_l2_norms(a, axis=0) ** 2
                    + sparse_l2_norms(q, axis=0) ** 2
                )
            )
        else:
            raise ValueError("p must be 2 or inf")
        variable_rescaling[variable_rescaling == 0] = 1.0

        if num_constraints == 0:
            constraint_rescaling = np.zeros(0)
        else:
            if p == np.inf:
                constraint_rescaling = np.sqrt(_row_linf(a))
            else:
                norm_of_rows = sparse_l2_norms(a, axis=1)
                if problem.objective_matrix.nnz == 0:
                    target = np.sqrt(num_variables / num_constraints)
                else:
                    target = np.sqrt(
                        num_variables / (num_constraints + num_variables)
                    )
                constraint_rescaling = np.sqrt(norm_of_rows / target)
            constraint_rescaling[constraint_rescaling == 0] = 1.0
        scale_problem(problem, constraint_rescaling, variable_rescaling)
        cum_constraint *= constraint_rescaling
        cum_variable *= variable_rescaling

    return cum_constraint, cum_variable


def pock_chambolle_rescaling(
    problem: QuadraticProgrammingProblem, alpha: float
) -> Tuple[np.ndarray, np.ndarray]:
    """Pock-Chambolle (2011) diagonal preconditioning as data rescaling.

    Column j is divided by sqrt(sum_i |a_ij|^(2-alpha)), row i by
    sqrt(sum_j |a_ij|^alpha); guarantees ||A_scaled|| <= 1.
    Reference: src/preprocess.jl:479-539.
    """
    if not (0 <= alpha <= 2):
        raise ValueError("alpha must be in [0, 2]")
    coo = problem.constraint_matrix.tocoo()
    absdata = np.abs(coo.data)
    col_sums = np.zeros(problem.constraint_matrix.shape[1])
    np.add.at(col_sums, coo.col, absdata ** (2 - alpha))
    row_sums = np.zeros(problem.constraint_matrix.shape[0])
    np.add.at(row_sums, coo.row, absdata**alpha)

    variable_rescaling = np.sqrt(col_sums)
    constraint_rescaling = np.sqrt(row_sums)
    variable_rescaling[variable_rescaling == 0] = 1.0
    constraint_rescaling[constraint_rescaling == 0] = 1.0

    scale_problem(problem, constraint_rescaling, variable_rescaling)
    return constraint_rescaling, variable_rescaling


def bound_width_rescaling(problem: QuadraticProgrammingProblem):
    """Column scaling normalizing every two-sided bound interval to unit
    width: variable j with finite l_j < u_j gets D_jj = 1/(u_j - l_j)
    (scaled bounds D l, D u then have width 1); one-sided/free/fixed
    variables are untouched.

    NO reference counterpart - the reference's pipeline only
    equilibrates the MATRIX (Ruiz/L2/PC), which is blind to bound
    scale. On all-finite-bound problems the duality gap is a sum of
    reduced-cost x bound-width complementarity products, so a 10-decade
    bound-width spread makes the gap criterion's conditioning terrible
    even with a perfectly equilibrated A: the badly_scaled family's
    PDLP runs were gap-limited (primal/dual residuals at 1e-6/0 with
    the gap stuck at 1e-2 for 1e5 KKT passes); with this step first,
    the same instance certifies OPTIMAL in 7.7e3 passes (13x).
    """
    hi = problem.variable_upper_bound
    lo = problem.variable_lower_bound
    width = hi - lo
    var = np.where(
        np.isfinite(width) & (width > 0), 1.0 / np.where(
            np.isfinite(width) & (width > 0), width, 1.0
        ), 1.0
    )
    con = np.ones(problem.constraint_matrix.shape[0])
    scale_problem(problem, con, var)
    return con, var


def rescale_problem(
    l_inf_ruiz_iterations: int,
    l2_norm_rescaling_flag: bool,
    pock_chambolle_alpha: Optional[float],
    verbosity: int,
    original_problem: QuadraticProgrammingProblem,
    bound_width_rescaling_flag: bool = False,
) -> ScaledQpProblem:
    """Deep-copies, then applies [optional bound-width] -> Ruiz^k ->
    optional L2 -> optional PC.

    Returns a ScaledQpProblem with cumulative scaling vectors.
    Reference: src/preprocess.jl:626-687 (the bound-width step is a
    TPU-framework addition, see bound_width_rescaling).
    """
    problem = copy.deepcopy(original_problem)
    if verbosity >= 4:
        print("Problem before rescaling:")
        print_problem_details(original_problem)

    num_constraints, num_variables = problem.constraint_matrix.shape
    constraint_rescaling = np.ones(num_constraints)
    variable_rescaling = np.ones(num_variables)

    if bound_width_rescaling_flag:
        con, var = bound_width_rescaling(problem)
        constraint_rescaling *= con
        variable_rescaling *= var

    if l_inf_ruiz_iterations > 0:
        con, var = ruiz_rescaling(problem, l_inf_ruiz_iterations, np.inf)
        constraint_rescaling *= con
        variable_rescaling *= var

    if l2_norm_rescaling_flag:
        con, var = l2_norm_rescaling(problem)
        constraint_rescaling *= con
        variable_rescaling *= var

    if pock_chambolle_alpha is not None:
        con, var = pock_chambolle_rescaling(problem, pock_chambolle_alpha)
        constraint_rescaling *= con
        variable_rescaling *= var

    scaled = ScaledQpProblem(
        original_qp=original_problem,
        scaled_qp=problem,
        constraint_rescaling=constraint_rescaling,
        variable_rescaling=variable_rescaling,
    )

    if verbosity >= 3:
        if l_inf_ruiz_iterations == 0 and not l2_norm_rescaling_flag:
            print("No rescaling.")
        else:
            print(
                f"Problem after rescaling (Ruiz iterations = "
                f"{l_inf_ruiz_iterations}, l2_norm_rescaling = "
                f"{l2_norm_rescaling_flag}):"
            )
            print_problem_details(scaled.scaled_qp)

    return scaled


# ---------------------------------------------------------------------------
# Presolve
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class PresolveInfo:
    """Allows presolve to be undone (reference src/preprocess.jl:223-230)."""

    original_primal_size: int
    original_dual_size: int
    empty_rows: List[int]
    empty_columns: List[int]
    variable_lower_bound: np.ndarray
    variable_upper_bound: np.ndarray


class PrimalInfeasibleError(ValueError):
    pass


def remove_empty_rows(problem: QuadraticProgrammingProblem) -> List[int]:
    """Removes empty rows; raises if an empty row is unsatisfiable.

    Reference: src/preprocess.jl:115-144.
    """
    m = problem.constraint_matrix.shape[0]
    seen_row = np.zeros(m, dtype=bool)
    seen_row[problem.constraint_matrix.tocoo().row] = True
    empty_rows = np.flatnonzero(~seen_row)

    for row in empty_rows:
        if row >= problem.num_equalities and problem.right_hand_side[row] > 0:
            raise PrimalInfeasibleError("The problem is infeasible.")
        if row < problem.num_equalities and problem.right_hand_side[row] != 0:
            raise PrimalInfeasibleError("The problem is infeasible.")

    if len(empty_rows) > 0:
        problem.constraint_matrix = sp.csc_matrix(
            problem.constraint_matrix.tocsr()[seen_row, :]
        )
        problem.right_hand_side = problem.right_hand_side[seen_row]
        num_empty_eq = int(np.sum(empty_rows < problem.num_equalities))
        problem.num_equalities -= num_empty_eq
    return list(empty_rows)


def remove_empty_columns(problem: QuadraticProgrammingProblem) -> List[int]:
    """Removes empty columns, fixing each removed variable at its best bound
    and folding the contribution into the objective constant.

    Reference: src/preprocess.jl:146-186 (LP only).
    """
    assert problem.objective_matrix.nnz == 0
    csc = problem.constraint_matrix.tocsc()
    nnz_per_col = np.diff(csc.indptr)
    is_empty = nnz_per_col == 0
    empty_columns = np.flatnonzero(is_empty)
    if len(empty_columns) == 0:
        return []

    for col in empty_columns:
        coef = problem.objective_vector[col]
        if coef >= 0:
            problem.objective_constant += (
                problem.variable_lower_bound[col] * coef
            )
        else:
            problem.objective_constant += (
                problem.variable_upper_bound[col] * coef
            )
    keep = ~is_empty
    problem.constraint_matrix = sp.csc_matrix(csc[:, keep])
    problem.objective_vector = problem.objective_vector[keep]
    problem.variable_lower_bound = problem.variable_lower_bound[keep]
    problem.variable_upper_bound = problem.variable_upper_bound[keep]
    problem.objective_matrix = sp.csc_matrix(
        problem.objective_matrix.tocsr()[keep][:, keep]
    )
    return list(empty_columns)


def transform_bounds_into_linear_constraints(
    qp: QuadraticProgrammingProblem,
) -> None:
    """Turns finite variable bounds into linear constraints
    (reference l.188-221)."""
    finite_lower = np.flatnonzero(np.isfinite(qp.variable_lower_bound))
    finite_upper = np.flatnonzero(np.isfinite(qp.variable_upper_bound))

    k = len(finite_lower) + len(finite_upper)
    row_indices = np.arange(k)
    col_indices = np.concatenate([finite_lower, finite_upper])
    values = np.concatenate(
        [np.ones(len(finite_lower)), -np.ones(len(finite_upper))]
    )
    identity_block = sp.csc_matrix(
        (values, (row_indices, col_indices)),
        shape=(k, len(qp.variable_lower_bound)),
    )
    qp.constraint_matrix = sp.vstack(
        [sp.csc_matrix(qp.constraint_matrix), identity_block], format="csc"
    )
    qp.right_hand_side = np.concatenate(
        [
            qp.right_hand_side,
            qp.variable_lower_bound[finite_lower],
            -qp.variable_upper_bound[finite_upper],
        ]
    )
    qp.variable_lower_bound = np.full_like(qp.variable_lower_bound, -np.inf)
    qp.variable_upper_bound = np.full_like(qp.variable_upper_bound, np.inf)


def check_for_singleton_constraints(qp: QuadraticProgrammingProblem) -> None:
    nnz_by_row = np.zeros(qp.constraint_matrix.shape[0], dtype=np.int64)
    np.add.at(nnz_by_row, qp.constraint_matrix.tocoo().row, 1)
    num_single = int(np.sum(nnz_by_row == 1))
    if num_single > 0:
        print(f"{num_single} constraints involving exactly a single variable")


def presolve(
    qp: QuadraticProgrammingProblem,
    verbosity: int = 1,
    transform_bounds: bool = False,
) -> PresolveInfo:
    """Removes empty rows/columns in place; returns undo information.

    Reference: src/preprocess.jl:232-271.
    """
    saved_lower = qp.variable_lower_bound.copy()
    saved_upper = qp.variable_upper_bound.copy()
    original_dual_size, original_primal_size = qp.constraint_matrix.shape
    empty_rows = remove_empty_rows(qp)
    if qp.objective_matrix.nnz == 0:
        empty_columns = remove_empty_columns(qp)
    else:
        empty_columns = []
    if verbosity >= 1:
        check_for_singleton_constraints(qp)
    if transform_bounds:
        transform_bounds_into_linear_constraints(qp)
    return PresolveInfo(
        original_primal_size=original_primal_size,
        original_dual_size=original_dual_size,
        empty_rows=empty_rows,
        empty_columns=empty_columns,
        variable_lower_bound=saved_lower,
        variable_upper_bound=saved_upper,
    )


def recover_original_solution(
    solution: np.ndarray, empty_indices: List[int], original_size: int
) -> np.ndarray:
    """Re-inserts zeros at indices removed by presolve (reference l.288-313)."""
    nonempty = np.ones(original_size, dtype=bool)
    nonempty[np.asarray(empty_indices, dtype=np.int64)] = False
    original_solution = np.zeros(original_size)
    original_solution[nonempty] = solution[: int(np.sum(nonempty))]
    return original_solution


def undo_presolve(
    presolve_info: PresolveInfo,
    primal_solution: np.ndarray,
    dual_solution: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """Maps a solution of the presolved problem back to the original space,
    re-projecting the primal onto the original bounds (reference l.315-340).
    """
    primal = recover_original_solution(
        np.asarray(primal_solution),
        presolve_info.empty_columns,
        presolve_info.original_primal_size,
    )
    primal = np.clip(
        primal,
        presolve_info.variable_lower_bound,
        presolve_info.variable_upper_bound,
    )
    dual = recover_original_solution(
        np.asarray(dual_solution),
        presolve_info.empty_rows,
        presolve_info.original_dual_size,
    )
    return primal, dual
