"""Bucketable matrix layouts: CooOp and on-device dense ("dense_onchip").

These layouts exist for the shape-bucketed benchmark-campaign protocol
(benchmarking/run_campaign.py --tpu): their pytree shapes depend only on
the (m, n, padded-nnz) bucket, never on per-instance sparsity structure,
so XLA solver programs are shared across every instance in a bucket.
Semantics they must reproduce: the reference's matvec call sites
(src/saddle_point.jl:1089,1106) - exact equality with scipy products.
"""

import dataclasses

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from firstorderlp_tpu.ops.linops import (
    build_coo_op,
    build_dense_onchip_op,
    build_dense_op,
    build_linop,
    CooOp,
)

from fixtures import example_lp, example_qp
from utils import optimality_criteria, pdhg_params


def _random_csr(m, n, density, seed):
    rng = np.random.default_rng(seed)
    a = sp.random(
        m, n, density=density, random_state=np.random.RandomState(seed),
        format="csr",
    )
    a.data = rng.standard_normal(a.nnz)
    return a


@pytest.mark.parametrize(
    "m,n,density", [(7, 5, 0.4), (64, 33, 0.1), (200, 300, 0.02)]
)
def test_coo_op_matches_scipy(m, n, density):
    a = _random_csr(m, n, density, seed=m + n)
    op = build_coo_op(a, jnp.float64)
    # padded-nnz canonicalization: power of two
    assert op.vals.shape[0] >= a.nnz
    assert op.vals.shape[0] & (op.vals.shape[0] - 1) == 0
    x = np.random.default_rng(1).standard_normal(n)
    y = np.random.default_rng(2).standard_normal(m)
    np.testing.assert_allclose(
        np.asarray(op.mv(jnp.asarray(x))), a @ x, rtol=1e-12, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(op.rmv(jnp.asarray(y))), a.T @ y, rtol=1e-12,
        atol=1e-12,
    )


def test_coo_op_duplicates_and_empty_rows():
    # duplicate entries must be summed; empty rows/cols produce zeros
    rows = np.array([0, 0, 2, 2, 2])
    cols = np.array([1, 1, 0, 3, 3])
    vals = np.array([1.0, 2.0, 5.0, 1.5, -0.5])
    a = sp.coo_matrix((vals, (rows, cols)), shape=(4, 5)).tocsr()
    op = build_coo_op(a, jnp.float64)
    x = np.arange(5, dtype=np.float64)
    y = np.arange(4, dtype=np.float64)
    np.testing.assert_allclose(np.asarray(op.mv(jnp.asarray(x))), a @ x)
    np.testing.assert_allclose(
        np.asarray(op.rmv(jnp.asarray(y))), a.T @ y
    )


def test_dense_onchip_matches_host_dense():
    a = _random_csr(50, 40, 0.1, seed=3)
    onchip = build_dense_onchip_op(a, jnp.float32)
    host = build_dense_op(a, jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(onchip.a), np.asarray(host.a)
    )


def test_build_linop_format_dispatch():
    a = _random_csr(20, 30, 0.2, seed=4)
    assert isinstance(build_linop(a, jnp.float64, "coo"), CooOp)
    op = build_linop(a, jnp.float32, "dense_onchip")
    assert op.shape == (20, 30)


@pytest.mark.parametrize("fixture", [example_lp, example_qp])
def test_solve_with_bucketable_layouts_matches_default(fixture):
    """End-to-end: the campaign layout pair (dense_onchip hot loop +
    coo stats) solves to the same optimum as the default layout."""
    from firstorderlp_tpu.models.pdhg import optimize

    problem = fixture()
    params = pdhg_params(optimality_criteria(1e-9), ruiz_iterations=10,
                         pock_chambolle_alpha=1.0)
    base = optimize(params, problem)
    bucketed = optimize(
        dataclasses.replace(
            params,
            matrix_format="dense_onchip",
            stats_matrix_format="coo",
        ),
        problem,
    )
    assert bucketed.termination_string == "OPTIMAL"
    np.testing.assert_allclose(
        np.asarray(bucketed.primal_solution),
        np.asarray(base.primal_solution),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(bucketed.dual_solution),
        np.asarray(base.dual_solution),
        atol=1e-6,
    )


def test_padded_bucket_solve_matches_unpadded():
    """pad_problem single-chip: zero-padding to a bucket shape is an
    exact no-op for the iterates (parallel/sharded.py contract, reused
    by the campaign's shape bucketing)."""
    from firstorderlp_tpu.models.pdhg import optimize
    from firstorderlp_tpu.parallel.sharded import pad_problem

    problem = example_lp()
    padded, m, n = pad_problem(problem, 8, 16)
    assert padded.constraint_matrix.shape == (8, 16)
    params = pdhg_params(optimality_criteria(1e-9), ruiz_iterations=10,
                         pock_chambolle_alpha=1.0)
    params = dataclasses.replace(
        params, matrix_format="dense_onchip", stats_matrix_format="coo"
    )
    base = optimize(params, problem)
    padded_out = optimize(params, padded)
    assert padded_out.termination_string == "OPTIMAL"
    np.testing.assert_allclose(
        np.asarray(padded_out.primal_solution)[:n],
        np.asarray(base.primal_solution),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(padded_out.dual_solution)[:m],
        np.asarray(base.dual_solution),
        atol=1e-6,
    )
    # padded variables stay exactly at their fixed-at-zero bounds
    np.testing.assert_array_equal(
        np.asarray(padded_out.primal_solution)[n:], 0.0
    )
