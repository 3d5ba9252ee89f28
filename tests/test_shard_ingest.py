"""Host-sharded ingest tests (SURVEY section 2 last mandated row).

Each process/block builds only its row shard; solutions must match the
full-problem path, and the streaming MPS loader must not materialize
the whole matrix (peak-memory assertion).
"""

import os
import tracemalloc

import numpy as np
import pytest

import firstorderlp_tpu as folp
from firstorderlp_tpu.parallel.mesh import solver_mesh
from firstorderlp_tpu.parallel.shard_ingest import (
    host_sharded_optimize,
    mps_row_shard_spec,
    problem_row_shard_spec,
)

from utils import optimality_criteria, pdhg_params


def _random_lp(m=37, n=53, k_eq=7, seed=0):
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    a = sp.random(
        m, n, density=0.15,
        random_state=np.random.RandomState(seed),
        data_rvs=rng.standard_normal, format="csc",
    )
    # ensure no empty rows (keeps the instance well-posed)
    a = sp.csc_matrix(
        a + sp.csc_matrix(
            (np.ones(m), (np.arange(m), rng.integers(0, n, m))),
            shape=(m, n),
        )
    )
    x0 = rng.uniform(-1, 1, n)
    b = np.asarray(a @ x0).ravel()
    b[k_eq:] -= rng.uniform(0.1, 1.0, m - k_eq)
    return folp.linear_programming_problem(
        np.full(n, -2.0),
        np.full(n, 2.0),
        rng.standard_normal(n),
        0.3,
        a,
        b,
        k_eq,
    )


def _params(tol=1e-6):
    return pdhg_params(
        optimality_criteria(tol),
        ruiz_iterations=10,
        pock_chambolle_alpha=1.0,
    )


def test_host_sharded_matches_full_ingest():
    problem = _random_lp()
    params = _params()
    full = folp.optimize(params, problem)
    mesh = solver_mesh(4, 1)
    spec = problem_row_shard_spec(problem)
    sharded = host_sharded_optimize(params, spec, mesh)
    assert (
        sharded.termination_reason
        == folp.TerminationReason.TERMINATION_REASON_OPTIMAL
    )
    np.testing.assert_allclose(
        sharded.primal_solution, full.primal_solution, atol=2e-4
    )
    np.testing.assert_allclose(
        sharded.dual_solution, full.dual_solution, atol=2e-4
    )


def test_host_sharded_uneven_rows_and_8_blocks():
    problem = _random_lp(m=45, n=30, k_eq=11, seed=3)
    params = _params()
    full = folp.optimize(params, problem)
    mesh = solver_mesh(8, 1)  # 45 rows -> blocks of 6, last block padded
    out = host_sharded_optimize(
        params, problem_row_shard_spec(problem), mesh
    )
    np.testing.assert_allclose(
        out.primal_solution, full.primal_solution, atol=2e-4
    )
    np.testing.assert_allclose(
        out.dual_solution, full.dual_solution, atol=2e-4
    )


def test_mps_row_shard_spec_matches_reader(tmp_path):
    from firstorderlp_tpu.io.mps_writer import write_mps

    problem = _random_lp(m=33, n=21, k_eq=5, seed=1)
    path = os.path.join(tmp_path, "inst.mps.gz")
    write_mps(problem, path)
    ref = folp.qps_reader_to_standard_form(path)
    spec = mps_row_shard_spec(path)
    assert spec.num_constraints == ref.num_constraints
    assert spec.num_variables == ref.num_variables
    assert spec.num_equalities == ref.num_equalities
    np.testing.assert_allclose(spec.right_hand_side, ref.right_hand_side)
    np.testing.assert_allclose(spec.objective_vector, ref.objective_vector)
    np.testing.assert_allclose(
        spec.variable_lower_bound, ref.variable_lower_bound
    )
    np.testing.assert_allclose(
        spec.variable_upper_bound, ref.variable_upper_bound
    )
    assert spec.objective_constant == ref.objective_constant
    # row blocks reassemble to the reference matrix
    import scipy.sparse as sp

    parts = [spec.row_loader(lo, min(lo + 9, 33)) for lo in range(0, 33, 9)]
    rows = np.concatenate([p[0] for p in parts])
    cols = np.concatenate([p[1] for p in parts])
    vals = np.concatenate([p[2] for p in parts])
    rebuilt = sp.csr_matrix((vals, (rows, cols)), shape=(33, 21))
    np.testing.assert_allclose(
        rebuilt.toarray(), ref.constraint_matrix.toarray()
    )


def test_mps_loader_memory_stays_sharded(tmp_path):
    """The loader's peak allocation for ONE block must stay well under
    the full COO size (the point of host-sharded ingest)."""
    from firstorderlp_tpu.io.mps_writer import write_mps

    problem = _random_lp(m=600, n=400, k_eq=100, seed=2)
    path = os.path.join(tmp_path, "big.mps")
    write_mps(problem, path)
    nnz = problem.constraint_matrix.nnz
    full_coo_bytes = nnz * (8 + 8 + 8)  # vals + int64 rows/cols

    spec = mps_row_shard_spec(path)
    n_blocks = 8
    m_b = -(-600 // n_blocks)
    tracemalloc.start()
    rows, cols, vals = spec.row_loader(0, m_b)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert len(vals) < nnz / 4  # one block of eight
    # python-list staging triples the block size; still far below full
    assert peak < 0.6 * full_coo_bytes, (peak, full_coo_bytes)


def test_mps_solve_via_sharded_ingest(tmp_path):
    from firstorderlp_tpu.io.mps_writer import write_mps

    problem = _random_lp(m=29, n=18, k_eq=4, seed=5)
    path = os.path.join(tmp_path, "inst.mps")
    write_mps(problem, path)
    params = _params()
    full = folp.optimize(params, folp.qps_reader_to_standard_form(path))
    out = host_sharded_optimize(
        params, mps_row_shard_spec(path), solver_mesh(4, 1)
    )
    np.testing.assert_allclose(
        out.primal_solution, full.primal_solution, atol=2e-4
    )


def test_sharded_ingest_rejects_unsupported():
    problem = _random_lp()
    spec = problem_row_shard_spec(problem)
    mesh2d = solver_mesh(2, 2)
    with pytest.raises(ValueError, match="rows only"):
        host_sharded_optimize(_params(), spec, mesh2d)
