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


def test_ragged_buckets_shard_not_replicate():
    """Every ELL bucket must actually shard over the mesh (ragged row
    counts are padded to mesh multiples); round 1 silently replicated
    any bucket whose rows didn't divide the axis."""
    from jax.sharding import PartitionSpec as P

    from firstorderlp_tpu.models.pdhg import prepare_problem
    from firstorderlp_tpu.parallel.mesh import solver_mesh
    from firstorderlp_tpu.parallel.sharded import (
        make_placement,
        pad_problem,
    )

    problem = generate_pagerank_lp(num_nodes=301, seed=2)
    mesh = solver_mesh(4, 2)
    padded, _, _ = pad_problem(problem, 4, 2)
    params = pdhg_params(optimality_criteria(1e-4), ruiz_iterations=10)
    params.matrix_format = "ell"
    prepared = prepare_problem(params, padded)
    bundle, state = make_placement(mesh)(
        prepared.bundle, prepared.initial_state
    )
    op = bundle.scaled.constraint_matrix
    for half, axis in ((op.fwd, "dual"), (op.bwd, "primal")):
        for b in half.buckets:
            spec = b.vals.sharding.spec
            assert spec[0] == axis, (axis, spec, b.vals.shape)
            assert b.vals.shape[0] % mesh.shape[axis] == 0


def test_distributed_single_process_entry():
    """The multi-host entry point degrades gracefully to a single
    process: initialize() is a no-op and the global mesh covers the
    local (virtual) devices."""
    from firstorderlp_tpu.parallel import distributed as D

    D.initialize()
    mesh = D.global_solver_mesh(n_dual=4, n_primal=2)
    assert dict(mesh.shape) == {"dual": 4, "primal": 2}
    problem = generate_pagerank_lp(num_nodes=150, seed=0)
    params = pdhg_params(optimality_criteria(1e-6), ruiz_iterations=10)
    out = D.distributed_optimize(params, problem, n_dual=4, n_primal=2)
    single = optimize(params, problem)
    np.testing.assert_allclose(
        out.primal_solution, single.primal_solution, atol=1e-7
    )
