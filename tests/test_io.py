"""IO tests mirroring reference test/test_qp_io.jl."""

import gzip
import os

import numpy as np
import pytest
import scipy.sparse as sp

from firstorderlp_tpu import (
    TwoSidedQpProblem,
    qps_reader_to_standard_form,
    two_sided_rows_to_slacks,
)

DATA = os.path.join(os.path.dirname(__file__), "test_data")


def assert_problem_equal(qp, expected):
    np.testing.assert_allclose(
        qp.variable_lower_bound, expected["variable_lower_bound"]
    )
    np.testing.assert_allclose(
        qp.variable_upper_bound, expected["variable_upper_bound"]
    )
    np.testing.assert_allclose(
        qp.objective_matrix.toarray(), expected["objective_matrix"]
    )
    np.testing.assert_allclose(qp.objective_vector, expected["objective_vector"])
    assert qp.objective_constant == expected["objective_constant"]
    np.testing.assert_allclose(
        qp.constraint_matrix.toarray(), expected["constraint_matrix"]
    )
    np.testing.assert_allclose(qp.right_hand_side, expected["right_hand_side"])
    assert qp.num_equalities == expected["num_equalities"]


TRIVIAL_LP = dict(
    variable_lower_bound=[0.0, 1.0],
    variable_upper_bound=[1.0, 2.0],
    objective_matrix=np.zeros((2, 2)),
    objective_vector=[2.0, -1.0],
    objective_constant=0.0,
    constraint_matrix=[[-1.0, -1.0]],
    right_hand_side=[-3.0],
    num_equalities=0,
)

TRIVIAL_QP = dict(
    variable_lower_bound=[0.0, 1.0],
    variable_upper_bound=[1.0, 2.0],
    objective_matrix=[[2.0, 2.0], [2.0, 4.0]],
    objective_vector=[2.0, -1.0],
    objective_constant=0.0,
    constraint_matrix=[[-1.0, -1.0]],
    right_hand_side=[-3.0],
    num_equalities=0,
)


def test_read_mps_lp():
    qp = qps_reader_to_standard_form(os.path.join(DATA, "trivial_lp.mps"))
    assert_problem_equal(qp, TRIVIAL_LP)


def test_read_mps_qp():
    qp = qps_reader_to_standard_form(os.path.join(DATA, "trivial_qp.mps"))
    assert_problem_equal(qp, TRIVIAL_QP)


def test_read_mps_gz(tmp_path):
    with open(os.path.join(DATA, "trivial_qp.mps"), "rb") as f:
        contents = f.read()
    gzfile = str(tmp_path / "trivial_qp.mps.gz")
    with gzip.open(gzfile, "wb") as f:
        f.write(contents)
    qp = qps_reader_to_standard_form(gzfile)
    assert_problem_equal(qp, TRIVIAL_QP)


def test_read_fixed_format():
    # Fixed-format variant of the trivial LP, with a name containing a
    # space ("x 1" occupies field 2's columns). Fields are placed at the
    # standard fixed-format character positions 2, 5, 15, 25, 40, 50.
    def fxline(f1="", f2="", f3="", f4="", f5="", f6=""):
        return (
            " "
            + f1.ljust(3)
            + f2.ljust(10)
            + f3.ljust(10)
            + f4.ljust(15)
            + f5.ljust(10)
            + f6
        ).rstrip()

    content = "\n".join(
        [
            "NAME          trivial",
            "ROWS",
            fxline("N", "OBJ"),
            fxline("L", "con"),
            "COLUMNS",
            fxline("", "x 1", "con", "1.0", "OBJ", "2.0"),
            fxline("", "y", "con", "1.0", "OBJ", "-1.0"),
            "RHS",
            fxline("", "rhs", "con", "3.0"),
            "BOUNDS",
            fxline("LO", "bounds", "y", "1.0"),
            fxline("UP", "bounds", "y", "2.0"),
            fxline("UP", "bounds", "x 1", "1.0"),
            "ENDATA",
            "",
        ]
    )
    import tempfile

    with tempfile.NamedTemporaryFile(
        "w", suffix=".mps", delete=False
    ) as f:
        f.write(content)
        path = f.name
    qp = qps_reader_to_standard_form(path, fixed_format=True)
    assert_problem_equal(qp, TRIVIAL_LP)
    os.unlink(path)


def test_two_sided_rows_to_slacks():
    """Mirrors the reference slack-transform unit test."""
    qp = TwoSidedQpProblem(
        variable_lower_bound=np.array([-np.inf, -np.inf]),
        variable_upper_bound=np.array([np.inf, np.inf]),
        constraint_lower_bound=np.array([-3.0, -2.0]),
        constraint_upper_bound=np.array([1.0, np.inf]),
        constraint_matrix=sp.csc_matrix(
            np.array([[1.0, 1.0], [1.0, 1.0]])
        ),
        objective_offset=2.0,
        objective_vector=np.array([0.0, 1.0]),
        objective_matrix=sp.csc_matrix(np.diag([1.0, 3.0])),
    )
    two_sided_rows_to_slacks(qp)
    np.testing.assert_allclose(
        qp.variable_lower_bound, [-np.inf, -np.inf, -3.0]
    )
    np.testing.assert_allclose(qp.variable_upper_bound, [np.inf, np.inf, 1.0])
    np.testing.assert_allclose(qp.constraint_lower_bound, [0.0, -2.0])
    np.testing.assert_allclose(qp.constraint_upper_bound, [0.0, np.inf])
    np.testing.assert_allclose(
        qp.constraint_matrix.toarray(),
        [[1.0, 1.0, -1.0], [1.0, 1.0, 0.0]],
    )
    assert qp.objective_offset == 2.0
    np.testing.assert_allclose(qp.objective_vector, [0.0, 1.0, 0.0])
    np.testing.assert_allclose(
        qp.objective_matrix.toarray(), np.diag([1.0, 3.0, 0.0])
    )


def test_ranges_section():
    content = (
        "NAME ranges\n"
        "ROWS\n"
        " N obj\n"
        " L r1\n"
        " G r2\n"
        " E r3\n"
        "COLUMNS\n"
        " x r1 1.0 r2 1.0\n"
        " x r3 1.0 obj 1.0\n"
        "RHS\n"
        " rhs r1 4.0 r2 1.0\n"
        " rhs r3 2.0\n"
        "RANGES\n"
        " rng r1 2.0 r2 3.0\n"
        " rng r3 1.5\n"
        "ENDATA\n"
    )
    import tempfile

    from firstorderlp_tpu.io.mps import read_mps

    with tempfile.NamedTemporaryFile("w", suffix=".mps", delete=False) as f:
        f.write(content)
        path = f.name
    mps = read_mps(path)
    # L: [rhs-|r|, rhs]; G: [rhs, rhs+|r|]; E r>0: [rhs, rhs+r].
    np.testing.assert_allclose(mps.lcon, [2.0, 1.0, 2.0])
    np.testing.assert_allclose(mps.ucon, [4.0, 4.0, 3.5])
    os.unlink(path)


def test_objective_constant_from_rhs():
    content = (
        "NAME c0\n"
        "ROWS\n"
        " N obj\n"
        " G r1\n"
        "COLUMNS\n"
        " x r1 1.0 obj 1.0\n"
        "RHS\n"
        " rhs r1 1.0 obj 5.0\n"
        "ENDATA\n"
    )
    import tempfile

    from firstorderlp_tpu.io.mps import read_mps

    with tempfile.NamedTemporaryFile("w", suffix=".mps", delete=False) as f:
        f.write(content)
        path = f.name
    mps = read_mps(path)
    assert mps.c0 == -5.0
    os.unlink(path)
