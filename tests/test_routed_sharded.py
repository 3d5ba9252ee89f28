"""Multi-chip routed-SpMV tests on the virtual 8-device CPU mesh.

The routed Pallas layer (ops/routed.py) is the fast single-chip path;
these tests assert its block-partitioned multi-chip form
(ops/routed_sharded.py) computes the same matvecs and that
sharded_optimize actually uses it (round 2 silently downgraded sharded
solves to the ELL layout). No reference counterpart (the reference is
single-threaded Julia); semantics reproduced are the matvec call sites
src/saddle_point.jl:1089,1106.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from firstorderlp_tpu import TerminationReason, optimize
from firstorderlp_tpu.generators import generate_pagerank_lp
from firstorderlp_tpu.ops.routed_sharded import (
    ShardedRoutedOp,
    build_sharded_routed_op,
    plan_routed_shards,
)
from firstorderlp_tpu.parallel import sharded_optimize, solver_mesh
from firstorderlp_tpu.parallel.sharded import pad_problem

from utils import optimality_criteria, pdhg_params


def _padded_random(m0, n0, density, plan, rng):
    a = sp.random(m0, n0, density=density, random_state=rng, format="csr")
    m = -(-m0 // plan.row_multiple) * plan.row_multiple
    n = -(-n0 // plan.col_multiple) * plan.col_multiple
    a.resize((m, n))
    return sp.csr_matrix(a)


import dataclasses as _dc


@pytest.mark.parametrize("tile_aligned", [False, True])
@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_matvecs_match_scipy(mesh_shape, tile_aligned):
    assert len(jax.devices()) >= 8, "conftest should give 8 CPU devices"
    mesh = solver_mesh(*mesh_shape)
    rng = np.random.default_rng(0)
    m0, n0 = 913, 1531
    plan = plan_routed_shards(m0, n0, int(0.01 * m0 * n0), mesh)
    plan = _dc.replace(plan, tile_aligned=tile_aligned)
    a = _padded_random(m0, n0, 0.01, plan, rng)
    op = build_sharded_routed_op(a, plan)
    assert op.shape == a.shape
    x = rng.standard_normal(a.shape[1]).astype(np.float32)
    y = rng.standard_normal(a.shape[0]).astype(np.float32)
    got_mv = np.asarray(op.mv(jnp.asarray(x)))
    got_rmv = np.asarray(op.rmv(jnp.asarray(y)))
    ref_mv = a @ x
    ref_rmv = a.T @ y
    scale_mv = np.max(np.abs(ref_mv)) + 1e-30
    scale_rmv = np.max(np.abs(ref_rmv)) + 1e-30
    assert np.max(np.abs(got_mv - ref_mv)) / scale_mv < 1e-5
    assert np.max(np.abs(got_rmv - ref_rmv)) / scale_rmv < 1e-5


def test_matvecs_match_under_jit():
    mesh = solver_mesh(2, 4)
    rng = np.random.default_rng(1)
    m0, n0 = 700, 450
    plan = plan_routed_shards(m0, n0, int(0.02 * m0 * n0), mesh)
    a = _padded_random(m0, n0, 0.02, plan, rng)
    op = build_sharded_routed_op(a, plan)
    x = jnp.asarray(rng.standard_normal(a.shape[1]).astype(np.float32))

    @jax.jit
    def roundtrip(op, x):
        return op.rmv(op.mv(x))

    got = np.asarray(roundtrip(op, x))
    ref = a.T @ (a @ np.asarray(x))
    assert np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-30) < 1e-4


def test_share_plan_values_only():
    mesh = solver_mesh(4, 2)
    rng = np.random.default_rng(2)
    m0, n0 = 500, 500
    plan = plan_routed_shards(m0, n0, int(0.02 * m0 * n0), mesh)
    a = _padded_random(m0, n0, 0.02, plan, rng)
    donor = build_sharded_routed_op(a, plan)
    b = sp.csr_matrix(a)
    b.data = b.data * 2.0
    op2 = build_sharded_routed_op(b, plan, share_plan_with=donor)
    assert op2.loc_e is donor.loc_e  # indices reused, not re-transferred
    x = rng.standard_normal(a.shape[1]).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(op2.mv(jnp.asarray(x))),
        2.0 * np.asarray(donor.mv(jnp.asarray(x))),
        rtol=1e-5,
        atol=1e-5,
    )


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4)])
def test_sharded_optimize_routed_matches_single_device(mesh_shape):
    mesh = solver_mesh(*mesh_shape)
    problem = generate_pagerank_lp(num_nodes=301, seed=2)
    params = pdhg_params(
        optimality_criteria(1e-5), ruiz_iterations=10,
        pock_chambolle_alpha=1.0,
    )
    params = dataclasses.replace(
        params, dtype="float32", matrix_format="routed"
    )
    out = sharded_optimize(params, problem, mesh)
    assert (
        out.termination_reason
        == TerminationReason.TERMINATION_REASON_OPTIMAL
    )
    params64 = dataclasses.replace(
        params, dtype="float64", matrix_format="auto"
    )
    single = optimize(params64, problem)
    np.testing.assert_allclose(
        out.primal_solution, single.primal_solution, atol=2e-4
    )
    np.testing.assert_allclose(
        out.dual_solution, single.dual_solution, atol=2e-4
    )


def test_sharded_optimize_builds_routed_op():
    """The sharded path must actually build the ShardedRoutedOp (round 2
    silently fell back to ELL at parallel/sharded.py)."""
    from firstorderlp_tpu.models.pdhg import prepare_problem

    mesh = solver_mesh(4, 2)
    problem = generate_pagerank_lp(num_nodes=301, seed=2)
    params = pdhg_params(optimality_criteria(1e-4), ruiz_iterations=10)
    params = dataclasses.replace(
        params, dtype="float32", matrix_format="routed"
    )
    plan = plan_routed_shards(
        problem.num_constraints,
        problem.num_variables,
        problem.constraint_matrix.nnz,
        mesh,
    )
    padded, _, _ = pad_problem(
        problem, plan.row_multiple, plan.col_multiple
    )
    prepared = prepare_problem(params, padded, _shard_plan=plan)
    scaled_op = prepared.bundle.scaled.constraint_matrix
    orig_op = prepared.bundle.original.constraint_matrix
    assert isinstance(scaled_op, ShardedRoutedOp)
    assert isinstance(orig_op, ShardedRoutedOp)
    # the original (stats) op shares the scaled op's device index planes
    assert orig_op.loc_e is scaled_op.loc_e
    # plan arrays are placed on the mesh, block per device
    assert scaled_op.vals_e.sharding.spec[:2] == ("dual", "primal")


def test_sharded_routed_requires_f32():
    mesh = solver_mesh(4, 2)
    problem = generate_pagerank_lp(num_nodes=64, seed=0)
    params = pdhg_params(optimality_criteria(1e-4))
    params = dataclasses.replace(
        params, dtype="float64", matrix_format="routed"
    )
    with pytest.raises(ValueError, match="float32"):
        sharded_optimize(params, problem, mesh)
