"""Host-side problem representation (canonical standard form).

Canonical form (reference: src/quadratic_programming.jl:15-33):

    minimize 1/2 x' Q x + c' x + objective_constant
    s.t.  A[:num_equalities, :] x  = b[:num_equalities]
          A[num_equalities:, :] x >= b[num_equalities:]
          l <= x <= u

The host problem uses numpy vectors and scipy.sparse CSC matrices; it is the
representation used by IO, presolve and rescaling. The device (JAX) mirror
used inside the solvers lives in ops/device_problem.py.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import scipy.sparse as sp


@dataclasses.dataclass
class QuadraticProgrammingProblem:
    """Standard-form QP (see module docstring).

    Mirrors the reference struct src/quadratic_programming.jl:34-76.
    ``variable_lower_bound`` may contain -inf and ``variable_upper_bound``
    may contain +inf entries.
    """

    variable_lower_bound: np.ndarray
    variable_upper_bound: np.ndarray
    objective_matrix: sp.csc_matrix
    objective_vector: np.ndarray
    objective_constant: float
    constraint_matrix: sp.csc_matrix
    right_hand_side: np.ndarray
    num_equalities: int

    @property
    def num_variables(self) -> int:
        return len(self.objective_vector)

    @property
    def num_constraints(self) -> int:
        return len(self.right_hand_side)

    def equality_range(self):
        return range(0, self.num_equalities)

    def inequality_range(self):
        return range(self.num_equalities, self.num_constraints)


def linear_programming_problem(
    variable_lower_bound,
    variable_upper_bound,
    objective_vector,
    objective_constant,
    constraint_matrix,
    right_hand_side,
    num_equalities,
) -> QuadraticProgrammingProblem:
    """LP constructor: objective matrix is zero.

    Reference: src/quadratic_programming.jl:255-277.
    """
    variable_lower_bound = np.asarray(variable_lower_bound, dtype=np.float64)
    n = len(variable_lower_bound)
    return QuadraticProgrammingProblem(
        variable_lower_bound=variable_lower_bound,
        variable_upper_bound=np.asarray(variable_upper_bound, dtype=np.float64),
        objective_matrix=sp.csc_matrix((n, n), dtype=np.float64),
        objective_vector=np.asarray(objective_vector, dtype=np.float64),
        objective_constant=float(objective_constant),
        constraint_matrix=sp.csc_matrix(
            np.asarray(constraint_matrix, dtype=np.float64)
            if not sp.issparse(constraint_matrix)
            else constraint_matrix,
            dtype=np.float64,
        ),
        right_hand_side=np.asarray(right_hand_side, dtype=np.float64),
        num_equalities=int(num_equalities),
    )


def is_linear_programming_problem(problem: QuadraticProgrammingProblem) -> bool:
    """True iff the objective matrix is zero (reference l.282-284)."""
    return problem.objective_matrix.nnz == 0


@dataclasses.dataclass
class ScaledQpProblem:
    """Original problem, diagonally rescaled problem and the scaling vectors.

    Contract (reference src/quadratic_programming.jl:286-298):
    ``original_qp == unscale_problem(scaled_qp, constraint_rescaling,
    variable_rescaling)``.
    """

    original_qp: QuadraticProgrammingProblem
    scaled_qp: QuadraticProgrammingProblem
    constraint_rescaling: np.ndarray
    variable_rescaling: np.ndarray


class InvalidProblemError(ValueError):
    pass


def validate(p: QuadraticProgrammingProblem) -> bool:
    """Shape / NaN / Inf validation (reference src/preprocess.jl:18-84)."""
    errors = []
    if len(p.variable_lower_bound) != len(p.variable_upper_bound):
        errors.append("variable bound lengths differ")
    if len(p.variable_lower_bound) != len(p.objective_vector):
        errors.append("bounds and objective vector lengths differ")
    if p.constraint_matrix.shape[0] != len(p.right_hand_side):
        errors.append("constraint matrix rows != right hand side length")
    if p.constraint_matrix.shape[1] != len(p.objective_vector):
        errors.append("constraint matrix cols != objective vector length")
    n = len(p.objective_vector)
    if p.objective_matrix.shape != (n, n):
        errors.append("objective matrix is not square of matching size")
    if np.any(p.variable_lower_bound == np.inf):
        errors.append("variable lower bound contains +inf")
    if np.any(p.variable_upper_bound == -np.inf):
        errors.append("variable upper bound contains -inf")
    if np.any(np.isnan(p.variable_lower_bound)) or np.any(
        np.isnan(p.variable_upper_bound)
    ):
        errors.append("NaN in variable bounds")
    if not np.all(np.isfinite(p.right_hand_side)):
        errors.append("NaN or Inf in right hand side")
    if not np.all(np.isfinite(p.objective_vector)):
        errors.append("NaN or Inf in objective vector")
    if not np.all(np.isfinite(p.constraint_matrix.data)):
        errors.append("NaN or Inf in constraint matrix")
    if not np.all(np.isfinite(p.objective_matrix.data)):
        errors.append("NaN or Inf in objective matrix")
    if errors:
        raise InvalidProblemError(
            "Invalid QuadraticProgrammingProblem: " + "; ".join(errors)
        )
    return True


def get_row_l2_norms(matrix: sp.spmatrix) -> np.ndarray:
    """L2 norm of each row (reference src/quadratic_programming.jl:113-122)."""
    sq = matrix.multiply(matrix)
    return np.sqrt(np.asarray(sq.sum(axis=1)).ravel())


def get_col_l2_norms(matrix: sp.spmatrix) -> np.ndarray:
    sq = matrix.multiply(matrix)
    return np.sqrt(np.asarray(sq.sum(axis=0)).ravel())


def get_row_l_inf_norms(matrix: sp.spmatrix) -> np.ndarray:
    """Max |entry| of each row (reference l.133-142)."""
    m = matrix.shape[0]
    coo = matrix.tocoo()
    out = np.zeros(m)
    np.maximum.at(out, coo.row, np.abs(coo.data))
    return out


def get_col_l_inf_norms(matrix: sp.spmatrix) -> np.ndarray:
    n = matrix.shape[1]
    coo = matrix.tocoo()
    out = np.zeros(n)
    np.maximum.at(out, coo.col, np.abs(coo.data))
    return out


def print_problem_details(qp: QuadraticProgrammingProblem) -> None:
    """Conditioning diagnostic (reference l.159-233)."""
    a = qp.constraint_matrix
    print(
        f"  There are {a.shape[1]} variables, {a.shape[0]} constraints "
        f"(including {qp.num_equalities} equalities) and {a.nnz} nonzero "
        "coefficients."
    )
    if a.nnz > 0:
        absdata = np.abs(a.data)
        print(
            "  Absolute value of nonzero constraint matrix elements: "
            f"largest={absdata.max():f}, smallest={absdata.min():f}, "
            f"avg={absdata.mean():f}"
        )
        col_norms = get_col_l_inf_norms(a)
        row_norms = get_row_l_inf_norms(a)
        print(
            "  Constraint matrix, infinity norm: "
            f"max_col={col_norms.max():f}, min_col={col_norms.min():f}, "
            f"max_row={row_norms.max():f}, min_row={row_norms.min():f}"
        )
    if qp.objective_matrix.nnz > 0:
        qabs = np.abs(qp.objective_matrix.data)
        print(
            "  Absolute value of objective matrix elements: "
            f"largest={qabs.max():f}, smallest={qabs.min():f}, "
            f"avg={qabs.mean():f}"
        )
    cabs = np.abs(qp.objective_vector)
    if len(cabs):
        print(
            "  Absolute value of objective vector elements: "
            f"largest={cabs.max():f}, smallest={cabs.min():f}, "
            f"avg={cabs.mean():f}"
        )
    babs = np.abs(qp.right_hand_side)
    if len(babs):
        print(
            "  Absolute value of rhs vector elements: "
            f"largest={babs.max():f}, smallest={babs.min():f}, "
            f"avg={babs.mean():f}"
        )
    gaps = qp.variable_upper_bound - qp.variable_lower_bound
    finite = gaps[np.isfinite(gaps)]
    if len(finite) > 0:
        print(
            f"  Gap between upper and lower bounds: #finite={len(finite)} of "
            f"{len(gaps)}, largest={finite.max():f}, smallest={finite.min():f},"
            f" avg={finite.mean():f}"
        )
    else:
        print(
            f"  Gap between upper and lower bounds: #finite=0 of {len(gaps)}"
        )


def print_variable_and_constraint_hardness(
    qp: QuadraticProgrammingProblem,
    primal_solution: np.ndarray,
    dual_solution: np.ndarray,
) -> None:
    """Constraint/variable "hardness" diagnostic: row (col) L2 norm times
    |dual| (|primal|). Reference: quadratic_programming.jl:84-111."""
    constraint_hardness = get_row_l2_norms(qp.constraint_matrix) * np.abs(
        np.asarray(dual_solution)
    )
    variable_hardness = get_col_l2_norms(qp.constraint_matrix) * np.abs(
        np.asarray(primal_solution)
    )
    for label, h in (
        ("Constraint", constraint_hardness),
        ("Variable", variable_hardness),
    ):
        if len(h) == 0:
            print(f"{label} hardness: (empty)")
            continue
        print(
            f"{label} hardness: median_hardness={np.median(h):f}, "
            f"mean_hardness={h.mean():f}, "
            f"quantile_99={np.quantile(h, 0.99):f}, hardest={h.max():f}"
        )
