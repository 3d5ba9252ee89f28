"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

New test class with no reference counterpart (the reference is
single-threaded): asserts sharded solves agree with single-device solves
to tight tolerance (SURVEY.md section 4 "Implication for the TPU build").
"""

import jax
import numpy as np
import pytest

from firstorderlp_tpu import TerminationReason, optimize
from firstorderlp_tpu.generators import generate_pagerank_lp
from firstorderlp_tpu.parallel import (
    pad_problem,
    sharded_optimize,
    solver_mesh,
)

from fixtures import example_lp
from utils import optimality_criteria, pdhg_params, terminate_on_iteration_limit


def test_pad_problem_solves_identically():
    problem = example_lp()
    padded, m, n = pad_problem(problem, 4, 8)
    assert padded.constraint_matrix.shape == (4, 8)
    params = pdhg_params(terminate_on_iteration_limit(200))
    out_orig = optimize(params, problem)
    out_pad = optimize(params, padded)
    np.testing.assert_allclose(
        out_pad.primal_solution[:n], out_orig.primal_solution, atol=1e-12
    )
    np.testing.assert_allclose(
        out_pad.dual_solution[:m], out_orig.dual_solution, atol=1e-12
    )
    np.testing.assert_allclose(out_pad.primal_solution[n:], 0.0)
    np.testing.assert_allclose(out_pad.dual_solution[m:], 0.0)


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4)])
def test_sharded_solve_matches_single_device(mesh_shape):
    assert len(jax.devices()) >= 8, "conftest should give 8 CPU devices"
    mesh = solver_mesh(*mesh_shape)
    problem = example_lp()
    params = pdhg_params(optimality_criteria(1e-9))
    out_single = optimize(params, problem)
    out_sharded = sharded_optimize(params, problem, mesh)
    assert (
        out_sharded.termination_reason
        == TerminationReason.TERMINATION_REASON_OPTIMAL
    )
    np.testing.assert_allclose(
        out_sharded.primal_solution, out_single.primal_solution, atol=1e-7
    )
    np.testing.assert_allclose(
        out_sharded.dual_solution, out_single.dual_solution, atol=1e-7
    )


def test_sharded_pagerank_lp():
    mesh = solver_mesh(4, 2)
    problem = generate_pagerank_lp(num_nodes=64, seed=3)
    params = pdhg_params(
        optimality_criteria(1e-7), ruiz_iterations=10, pock_chambolle_alpha=1.0
    )
    out = sharded_optimize(params, problem, mesh)
    assert (
        out.termination_reason
        == TerminationReason.TERMINATION_REASON_OPTIMAL
    )
    # PageRank vector: nonnegative, sums to one.
    assert out.primal_solution.sum() == pytest.approx(1.0, abs=1e-4)
    assert out.primal_solution.min() >= -1e-8
