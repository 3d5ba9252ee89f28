"""Matrix-free ADMM+CG baseline (firstorderlp_tpu/baselines.py) - the
SCS-indirect-class first-order anchor for the campaign tables."""

import numpy as np
import pytest
import scipy.sparse as sp

import firstorderlp_tpu as folp
from firstorderlp_tpu.baselines import admm_solve
from firstorderlp_tpu.solve_log import TerminationReason


def _small_lp():
    # min -2x1 - x2  s.t.  x1 + x2 = 1.5, x1 - x2 >= -1, 0 <= x <= 1
    # optimum x = (1, 0.5), obj = -2.5
    a = sp.csc_matrix(
        np.array([[1.0, 1.0], [1.0, -1.0]])
    )
    return folp.linear_programming_problem(
        np.zeros(2),
        np.ones(2),
        np.array([-2.0, -1.0]),
        0.0,
        a,
        np.array([1.5, -1.0]),
        1,
    )


def _random_lp(m, n, seed, k_eq=None):
    rng = np.random.default_rng(seed)
    k_eq = m // 3 if k_eq is None else k_eq
    a = sp.random(
        m, n, density=0.3, random_state=np.random.RandomState(seed),
        data_rvs=rng.standard_normal, format="csc",
    )
    x0 = rng.uniform(0.2, 0.8, n)
    b = np.asarray(a @ x0)
    b[k_eq:] -= rng.uniform(0.0, 0.5, m - k_eq)  # interior on ineq rows
    return folp.linear_programming_problem(
        np.zeros(n), np.ones(n), rng.standard_normal(n), 0.0, a, b, k_eq
    )


def test_admm_small_lp_optimal():
    out = admm_solve(_small_lp(), tolerance=1e-8)
    assert (
        out.termination_reason
        == TerminationReason.TERMINATION_REASON_OPTIMAL
    )
    np.testing.assert_allclose(
        out.primal_solution, [1.0, 0.5], atol=1e-5
    )
    # KKT accounting: iters + cg + checks, all positive
    assert out.cumulative_kkt_passes > out.iteration_count
    assert out.total_cg_iterations > 0


@pytest.mark.parametrize("seed", [3, 11])
def test_admm_matches_pdhg_on_random_lp(seed):
    problem = _random_lp(40, 55, seed)
    from utils import optimality_criteria, pdhg_params

    ref = folp.optimize(
        pdhg_params(optimality_criteria(1e-8)), problem
    )
    # 1e-4 = the campaign rung's tolerance. ADMM's tail on LPs is slow
    # (no strong convexity) - the reference observes the same of SCS,
    # which is the point of anchoring PDLP against this class.
    out = admm_solve(problem, tolerance=1e-4)
    assert (
        out.termination_reason
        == TerminationReason.TERMINATION_REASON_OPTIMAL
    )
    obj_ref = problem.objective_vector @ ref.primal_solution
    obj_admm = problem.objective_vector @ out.primal_solution
    assert abs(obj_ref - obj_admm) <= 2e-3 * (1 + abs(obj_ref))
    # our-convention dual: >= 0 on >=-rows, stationarity holds loosely
    k = problem.num_equalities
    assert np.all(out.dual_solution[k:] >= -1e-12)


def test_admm_qp():
    # min 1/2 x'Ix - x1  s.t. x1 + x2 >= 1, 0 <= x <= 2
    # optimum: x1 = 1, x2 = 0 -> grad = (x1 - 1, x2) + y*(-1,-1) ...
    from firstorderlp_tpu.problem import QuadraticProgrammingProblem

    problem = QuadraticProgrammingProblem(
        variable_lower_bound=np.zeros(2),
        variable_upper_bound=np.full(2, 2.0),
        objective_matrix=sp.eye(2, format="csc"),
        objective_vector=np.array([-1.0, 0.0]),
        objective_constant=0.0,
        constraint_matrix=sp.csc_matrix(np.array([[1.0, 1.0]])),
        right_hand_side=np.array([1.0]),
        num_equalities=0,
    )
    out = admm_solve(problem, tolerance=1e-8)
    assert (
        out.termination_reason
        == TerminationReason.TERMINATION_REASON_OPTIMAL
    )
    np.testing.assert_allclose(
        out.primal_solution, [1.0, 0.0], atol=1e-5
    )


def test_admm_kkt_pass_budget():
    problem = _random_lp(60, 80, 7)
    out = admm_solve(problem, tolerance=1e-12, max_kkt_passes=200)
    assert out.termination_reason in (
        TerminationReason.TERMINATION_REASON_KKT_MATRIX_PASS_LIMIT,
        TerminationReason.TERMINATION_REASON_OPTIMAL,
    )
    if (
        out.termination_reason
        == TerminationReason.TERMINATION_REASON_KKT_MATRIX_PASS_LIMIT
    ):
        # overshoot bounded by one iteration's CG work (budget is
        # checked every iteration)
        assert out.cumulative_kkt_passes <= 200 + 80 + 2


def test_admm_cli(tmp_path):
    import subprocess
    import sys
    import os
    import json

    from firstorderlp_tpu.io.mps_writer import write_mps

    repo = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    mps = tmp_path / "small.mps"
    write_mps(_small_lp(), str(mps))
    rc = subprocess.run(
        [
            sys.executable,
            os.path.join(repo, "cli", "solve_lp_external.py"),
            "--solver", "admm",
            "--output_dir", str(tmp_path),
            "--instance_path", str(mps),
            "--tolerance", "1e-8",
        ],
        capture_output=True, text=True,
    )
    assert rc.returncode == 0, rc.stderr
    with open(tmp_path / "small_summary.json") as f:
        log = json.load(f)
    assert log["termination_string"] == "OPTIMAL"
    assert (
        log["solution_stats"]["cumulative_kkt_matrix_passes"] > 0
    )
    primal = np.loadtxt(tmp_path / "small_primal.txt")
    np.testing.assert_allclose(primal, [1.0, 0.5], atol=1e-4)
