"""Routed-SpMV operator tests (ops/routed.py).

On CPU the Pallas kernels run in interpret mode; sizes are kept small.
The layout replaces the ELL gather path for large f32 single-instance
solves on TPU (reference call sites src/saddle_point.jl:1089,1106).
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from firstorderlp_tpu.ops.routed import RoutedOp, build_routed_op
from firstorderlp_tpu.ops.linops import build_linop


def random_matrix(rng, m, n, nnz):
    r = rng.integers(0, m, nnz)
    c = rng.integers(0, n, nnz)
    d = rng.normal(size=nnz)
    a = sp.coo_matrix((d, (r, c)), shape=(m, n)).tocsr()
    a.sum_duplicates()
    return a


@pytest.mark.parametrize("tile_aligned", [False, True])
@pytest.mark.parametrize(
    "m,n,nnz",
    [(300, 500, 4000), (129, 257, 600), (50, 60, 200), (1000, 90, 5000)],
)
def test_matches_scipy(m, n, nnz, tile_aligned):
    rng = np.random.default_rng(m + n)
    a = random_matrix(rng, m, n, nnz)
    op = build_routed_op(a, group_rows=4, tile_aligned=tile_aligned)
    x = rng.normal(size=n).astype(np.float32)
    y = rng.normal(size=m).astype(np.float32)
    a32 = a.astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(op.mv(jnp.asarray(x))), a32 @ x, rtol=0,
        atol=3e-6 * max(1.0, float(np.abs(a32 @ x).max())),
    )
    np.testing.assert_allclose(
        np.asarray(op.rmv(jnp.asarray(y))), a32.T @ y, rtol=0,
        atol=3e-6 * max(1.0, float(np.abs(a32.T @ y).max())),
    )


@pytest.mark.parametrize("tile_aligned", [False, True])
def test_pathological_structures(tile_aligned):
    """Hub row/column, empty rows and columns, single entry."""
    rng = np.random.default_rng(7)
    m, n = 400, 300
    rows = np.concatenate([
        np.zeros(200, dtype=int),          # hub row 0
        rng.integers(5, 100, 300),         # rows 100..399 empty-ish
    ])
    cols = np.concatenate([
        rng.integers(0, n, 200),
        np.full(300, 7),                   # hub column 7
    ])
    d = rng.normal(size=500)
    a = sp.coo_matrix((d, (rows, cols)), shape=(m, n)).tocsr()
    a.sum_duplicates()
    op = build_routed_op(a, group_rows=2, tile_aligned=tile_aligned)
    x = rng.normal(size=n).astype(np.float32)
    y = rng.normal(size=m).astype(np.float32)
    a32 = a.astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(op.mv(jnp.asarray(x))), a32 @ x, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(op.rmv(jnp.asarray(y))), a32.T @ y, atol=1e-4
    )


def test_plan_sharing():
    """A rescaled copy (same pattern, different values) reuses the
    donor's index planes; results match scipy for both."""
    rng = np.random.default_rng(3)
    a = random_matrix(rng, 200, 300, 3000)
    op = build_routed_op(a, group_rows=4)
    d = sp.diags(rng.uniform(0.5, 2.0, 200))
    e = sp.diags(rng.uniform(0.5, 2.0, 300))
    b = sp.csr_matrix(d @ a @ e)
    op2 = build_routed_op(b, share_plan_with=op)
    assert op2.loc_e is op.loc_e  # shared device buffer, not a copy
    x = rng.normal(size=300).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(op2.mv(jnp.asarray(x))),
        b.astype(np.float32) @ x,
        atol=3e-6 * max(1.0, float(np.abs(b @ x).max())),
    )

    c = random_matrix(rng, 200, 300, 2999)  # different pattern
    with pytest.raises(ValueError, match="pattern"):
        build_routed_op(c, share_plan_with=op)


def test_dtype_preserved():
    rng = np.random.default_rng(5)
    a = random_matrix(rng, 100, 100, 900)
    op = build_routed_op(a, group_rows=2)
    x64 = jnp.asarray(rng.normal(size=100))  # f64 under x64 mode
    out = op.mv(x64)
    assert out.dtype == x64.dtype


def test_build_linop_routed_format():
    rng = np.random.default_rng(9)
    a = random_matrix(rng, 300, 300, 4000)
    op = build_linop(a, jnp.float32, format="routed")
    assert isinstance(op, RoutedOp)
    with pytest.raises(ValueError, match="f32"):
        build_linop(a, jnp.float64, format="routed")


def test_solver_with_routed_format():
    """End-to-end PDHG with matrix_format='routed' (interpret mode on
    CPU) reproduces the ELL solve on a small LP."""
    import dataclasses

    from firstorderlp_tpu.models.pdhg import optimize
    from utils import pdhg_params, terminate_on_iteration_limit

    rng = np.random.default_rng(11)
    n = 60
    a = sp.random(n, n, density=0.2, random_state=2, format="csr")
    a = a + sp.eye(n)
    from firstorderlp_tpu import linear_programming_problem

    prob = linear_programming_problem(
        np.zeros(n),
        np.full(n, 10.0),
        rng.uniform(0.5, 1.5, n),
        0.0,
        a,
        rng.uniform(0.1, 1.0, n),
        0,
    )
    params = dataclasses.replace(
        pdhg_params(terminate_on_iteration_limit(80), ruiz_iterations=10),
        dtype="float32",
        matrix_format="routed",
    )
    params_ell = dataclasses.replace(params, matrix_format="ell")
    out_r = optimize(params, prob)
    out_e = optimize(params_ell, prob)
    assert out_r.iteration_count == out_e.iteration_count
    np.testing.assert_allclose(
        out_r.primal_solution, out_e.primal_solution, atol=1e-4
    )


def test_qp_objective_matrix_routed():
    """A QP whose Q rides the routed layout solves like the ELL path."""
    import dataclasses

    from firstorderlp_tpu import QuadraticProgrammingProblem
    from firstorderlp_tpu.models.pdhg import optimize
    from utils import pdhg_params, terminate_on_iteration_limit

    rng = np.random.default_rng(21)
    n = 80
    a = sp.random(n // 2, n, density=0.2, random_state=4, format="csc")
    q = sp.eye(n, format="csc") * 0.5
    prob = QuadraticProgrammingProblem(
        variable_lower_bound=np.zeros(n),
        variable_upper_bound=np.full(n, 10.0),
        objective_matrix=q,
        objective_vector=rng.uniform(-1, 1, n),
        objective_constant=0.0,
        constraint_matrix=a.tocsc(),
        right_hand_side=rng.uniform(0.1, 0.5, n // 2),
        num_equalities=0,
    )
    params = dataclasses.replace(
        pdhg_params(terminate_on_iteration_limit(60), ruiz_iterations=10),
        dtype="float32",
        matrix_format="routed",
    )
    params_ell = dataclasses.replace(params, matrix_format="ell")
    out_r = optimize(params, prob)
    out_e = optimize(params_ell, prob)
    np.testing.assert_allclose(
        out_r.primal_solution, out_e.primal_solution, atol=1e-4
    )


@pytest.mark.parametrize("tile_aligned", [False, True])
@pytest.mark.parametrize("b2,hr,gr", [
    (1, 4, 2), (2, 2, 8), (4, 1, 4), (8, 8, 2), (2, 8, 16),
])
def test_geometry_sweep(b2, hr, gr, tile_aligned):
    """Plan correctness across strip/group geometries (tile padding,
    group padding, chunk routing all shift with these)."""
    rng = np.random.default_rng(b2 * 100 + hr * 10 + gr)
    a = random_matrix(rng, 700, 500, 6000)
    op = build_routed_op(
        a, group_rows=gr, b2=b2, hr=hr, tile_aligned=tile_aligned
    )
    x = rng.normal(size=500).astype(np.float32)
    y = rng.normal(size=700).astype(np.float32)
    a32 = a.astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(op.mv(jnp.asarray(x))), a32 @ x,
        atol=3e-6 * max(1.0, float(np.abs(a32 @ x).max())),
    )
    np.testing.assert_allclose(
        np.asarray(op.rmv(jnp.asarray(y))), a32.T @ y,
        atol=3e-6 * max(1.0, float(np.abs(a32.T @ y).max())),
    )


@pytest.mark.parametrize("tile_aligned", [False, True])
def test_fused_dual_and_stats_match_composed(tile_aligned):
    """mv_dual_step / rmv_stats == the composed mv/rmv + XLA ops."""
    rng = np.random.default_rng(31)
    a = random_matrix(rng, 300, 400, 4000)
    op = build_routed_op(a, group_rows=4, tile_aligned=tile_aligned)
    a32 = a.astype(np.float32)
    z = rng.normal(size=400).astype(np.float32)
    y = rng.normal(size=300).astype(np.float32)
    b = rng.normal(size=300).astype(np.float32)
    eq = (rng.random(300) < 0.4).astype(np.float32)
    sigma = 0.37
    yn, yns, dy2 = op.mv_dual_step(
        jnp.asarray(z),
        op.pad_dual_strips(jnp.asarray(y)),
        op.pad_dual_strips(jnp.asarray(b)),
        op.pad_dual_strips(jnp.asarray(eq)),
        sigma,
    )
    cand = y + sigma * (b - a32 @ z)
    want_yn = np.where(eq != 0, cand, np.maximum(cand, 0.0))
    np.testing.assert_allclose(np.asarray(yn), want_yn, atol=2e-5)
    np.testing.assert_allclose(
        float(dy2), float(np.sum((want_yn - y) ** 2)), rtol=2e-5
    )
    dx = rng.normal(size=400).astype(np.float32)
    atyold = rng.normal(size=400).astype(np.float32)
    aty, inter, dx2 = op.rmv_stats(
        yns,
        op.pad_primal_strips(jnp.asarray(dx)),
        op.pad_primal_strips(jnp.asarray(atyold)),
    )
    want_aty = a32.T @ want_yn
    np.testing.assert_allclose(np.asarray(aty), want_aty, atol=2e-4)
    np.testing.assert_allclose(
        float(inter), float(np.sum(dx * (want_aty - atyold))), rtol=2e-3
    )
    np.testing.assert_allclose(
        float(dx2), float(np.sum(dx * dx)), rtol=2e-5
    )


def test_auto_geometry_cost_model():
    """The picker minimizes the calibrated cost model: measured-winning
    picks at the probe sizes, and the MXU term (linear in strip width)
    keeps it from widening strips without bound at MIPLIB scale
    (probe_kkt_pass.py sweep: 128-wide strips measured 1.76x slower
    than 32-wide at 4M nnz)."""
    from firstorderlp_tpu.generators import generate_pagerank_lp
    from firstorderlp_tpu.ops.routed import auto_geometry

    p = generate_pagerank_lp(num_nodes=20000, seed=0)
    a = p.constraint_matrix
    m, n = a.shape
    assert auto_geometry(m, n, a.nnz, matrix=a) == (32, 32)
    # Estimate-only form (the sharded planner's path) agrees here.
    assert auto_geometry(m, n, a.nnz) == (32, 32)
    # A 500k-square PageRank-like pattern must NOT pick 128-wide strips
    # (the old <=5%-padding rule did; measured 9.04 vs 5.14 ms).
    b2, hr = auto_geometry(500_000, 500_000, 4_000_000)
    assert max(b2, hr) <= 64
    # Tiny matrices clamp to the matrix size.
    t = sp.random(50, 70, density=0.1, format="csr", random_state=0)
    assert auto_geometry(50, 70, t.nnz, matrix=t) == (1, 1)


def test_kernel_compiler_params_threshold():
    """Plans whose g intermediate exceeds the default 16 MiB scoped-VMEM
    budget get a raised per-kernel limit (the promotion of g to VMEM
    otherwise fails compilation past ~3.7M nnz); small plans keep the
    default (None)."""
    from firstorderlp_tpu.ops.routed import _kernel_compiler_params

    assert _kernel_compiler_params(1 << 20) is None
    big = _kernel_compiler_params(32 << 20)
    assert big is not None and big.vmem_limit_bytes == (40 << 20)
    capped = _kernel_compiler_params(1 << 30)
    assert capped.vmem_limit_bytes == (100 << 20)
