"""Sharded (multi-chip) solves: problem padding + pytree placement.

Strategy: the solver code is already pure jnp on pytrees, so multi-chip
execution is expressed entirely through shardings - every x-like vector is
placed P("primal"), every y-like vector P("dual"), the dense constraint
matrix P("dual", "primal"), scalars replicated. GSPMD then partitions the
whole jitted segment, inserting psum/all-gather collectives for the
matvecs, reductions and trust-region sorts.

Problems are zero-padded so every sharded dimension divides the mesh:
padding adds fixed-at-zero variables (l = u = 0, c = 0) and always-satisfied
trailing inequality rows (all-zero coefficients, rhs 0); both are exact
no-ops for every quantity the solver computes (residuals, norms, restarts,
trust regions), so the padded solve produces the same iterates.
"""

from __future__ import annotations

import copy
import dataclasses
from typing import Tuple

import jax
import numpy as np
import scipy.sparse as sp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..problem import QuadraticProgrammingProblem
from ..saddle_point import SaddlePointOutput


def _round_up(x: int, multiple: int) -> int:
    return -(-x // multiple) * multiple


def pad_problem(
    problem: QuadraticProgrammingProblem,
    row_multiple: int,
    col_multiple: int,
) -> Tuple[QuadraticProgrammingProblem, int, int]:
    """Pads to (m', n') divisible by the mesh axes. Returns the padded
    problem and the original (m, n) for slicing results back."""
    m, n = problem.constraint_matrix.shape
    new_m = max(_round_up(m, row_multiple), row_multiple)
    new_n = max(_round_up(n, col_multiple), col_multiple)
    if (new_m, new_n) == (m, n):
        return copy.deepcopy(problem), m, n

    a = sp.csc_matrix(problem.constraint_matrix)
    a = sp.csc_matrix(
        sp.vstack(
            [
                sp.hstack([a, sp.csc_matrix((m, new_n - n))]),
                sp.csc_matrix((new_m - m, new_n)),
            ]
        )
    )
    q = sp.csc_matrix(problem.objective_matrix)
    q = sp.csc_matrix(
        sp.vstack(
            [
                sp.hstack([q, sp.csc_matrix((n, new_n - n))]),
                sp.csc_matrix((new_n - n, new_n)),
            ]
        )
    )
    padded = QuadraticProgrammingProblem(
        variable_lower_bound=np.concatenate(
            [problem.variable_lower_bound, np.zeros(new_n - n)]
        ),
        variable_upper_bound=np.concatenate(
            [problem.variable_upper_bound, np.zeros(new_n - n)]
        ),
        objective_matrix=q,
        objective_vector=np.concatenate(
            [problem.objective_vector, np.zeros(new_n - n)]
        ),
        objective_constant=problem.objective_constant,
        constraint_matrix=a,
        right_hand_side=np.concatenate(
            [problem.right_hand_side, np.zeros(new_m - m)]
        ),
        num_equalities=problem.num_equalities,
    )
    return padded, m, n


def _put(x, mesh: Mesh, spec: P):
    return jax.device_put(x, NamedSharding(mesh, spec))


def _place_linop(op, mesh: Mesh, row_spec: P, col_spec: P):
    from ..ops.linops import DenseOp, SparseOp, EllHalf, EllBucket
    from ..ops.routed import RoutedOp
    from ..ops.routed_sharded import ShardedRoutedOp

    if op is None:
        return None
    if isinstance(op, ShardedRoutedOp):
        return op  # block plans were placed on the mesh at build time
    if isinstance(op, RoutedOp):
        raise TypeError(
            "single-device RoutedOp cannot be mesh-sharded; build with a "
            "RoutedShardPlan (sharded_optimize does this automatically)"
        )
    if isinstance(op, DenseOp):
        return DenseOp(
            a=_put(
                op.a,
                mesh,
                P(
                    row_spec[0] if len(row_spec) else None,
                    col_spec[0] if len(col_spec) else None,
                ),
            )
        )
    if isinstance(op, SparseOp):
        # ELL planes: shard the row dimension of each orientation; the
        # gathered operand (x for fwd, y for bwd) is all-gathered by
        # GSPMD and the per-bucket outputs stay sharded by rows.
        #
        # Ragged buckets (row counts that don't divide the mesh axis -
        # the common case for real matrices) are PADDED to the next
        # multiple with zero rows so every bucket shards: padded rows
        # produce concat entries that inv_perm never references, and
        # inv_perm is remapped for the shifted bucket offsets. Without
        # this, most of A silently degraded to per-chip replication.
        def place_half(half: EllHalf, axis):
            axis_size = mesh.shape.get(axis, 1) if axis else 1
            old_sizes = [int(b.cols.shape[0]) for b in half.buckets]
            new_sizes = [
                _round_up(s, axis_size) if axis else s for s in old_sizes
            ]
            old_offsets = np.concatenate(
                [[0], np.cumsum(old_sizes)]
            ).astype(np.int64)
            new_offsets = np.concatenate(
                [[0], np.cumsum(new_sizes)]
            ).astype(np.int64)
            shifts = new_offsets[:-1] - old_offsets[:-1]

            inv = np.asarray(half.inv_perm).astype(np.int64)
            bucket_of = (
                np.searchsorted(old_offsets[1:], inv, side="right")
            )
            new_inv = (inv + shifts[bucket_of]).astype(np.int32)

            def pad_bucket(b, old, new):
                if old == new:
                    return b
                pad = ((0, new - old), (0, 0))
                return EllBucket(
                    cols=np.pad(np.asarray(b.cols), pad),
                    vals=np.pad(np.asarray(b.vals), pad),
                )

            padded = [
                pad_bucket(b, o, s)
                for b, o, s in zip(half.buckets, old_sizes, new_sizes)
            ]

            def bucket_spec():
                return P(axis, None) if axis else P(None, None)

            def perm_spec():
                size = len(inv)
                if axis and size % axis_size == 0:
                    return P(axis)
                return P()

            return EllHalf(
                buckets=tuple(
                    EllBucket(
                        cols=_put(b.cols, mesh, bucket_spec()),
                        vals=_put(b.vals, mesh, bucket_spec()),
                    )
                    for b in padded
                ),
                inv_perm=_put(new_inv, mesh, perm_spec()),
            )

        row_axis = row_spec[0] if len(row_spec) else None
        col_axis = col_spec[0] if len(col_spec) else None
        return SparseOp(
            fwd=place_half(op.fwd, row_axis),
            bwd=place_half(op.bwd, col_axis),
            num_rows=op.num_rows,
            num_cols=op.num_cols,
        )
    raise TypeError(f"unknown linop {type(op)!r}")


def make_placement(mesh: Mesh):
    """Returns a placement hook for optimize(): shards the device bundle
    and the initial solver state over `mesh`."""
    primal = P("primal") if "primal" in mesh.axis_names else P()
    dual = P("dual") if "dual" in mesh.axis_names else P()
    replicated = P()

    def place_qp(qp):
        return dataclasses.replace(
            qp,
            variable_lower_bound=_put(qp.variable_lower_bound, mesh, primal),
            variable_upper_bound=_put(qp.variable_upper_bound, mesh, primal),
            objective_vector=_put(qp.objective_vector, mesh, primal),
            objective_constant=_put(qp.objective_constant, mesh, replicated),
            right_hand_side=_put(qp.right_hand_side, mesh, dual),
            is_equality=_put(qp.is_equality, mesh, dual),
            constraint_matrix=_place_linop(
                qp.constraint_matrix, mesh, dual, primal
            ),
            objective_matrix=_place_linop(
                qp.objective_matrix, mesh, primal, primal
            ),
        )

    def placement(bundle, state):
        bundle = dataclasses.replace(
            bundle,
            scaled=place_qp(bundle.scaled),
            original=place_qp(bundle.original),
            constraint_rescaling=_put(bundle.constraint_rescaling, mesh, dual),
            variable_rescaling=_put(bundle.variable_rescaling, mesh, primal),
        )

        n = bundle.scaled.num_variables

        def spec_for_leaf(leaf):
            if getattr(leaf, "ndim", None) == 1:
                if leaf.shape[0] == n:
                    return primal
                return dual
            return replicated

        state = jax.tree_util.tree_map(
            lambda leaf: _put(leaf, mesh, spec_for_leaf(leaf)), state
        )
        return bundle, state

    return placement


def sharded_optimize(
    params, problem: QuadraticProgrammingProblem, mesh: Mesh
) -> SaddlePointOutput:
    """Multi-chip solve: pads the problem to the mesh, shards all pytrees,
    and runs the standard segment loop under GSPMD.

    When the routed conditions hit (explicit matrix_format="routed", or
    "auto" with an f32 solve and nnz >= ROUTED_NNZ_THRESHOLD on TPU),
    the constraint operator is built block-partitioned over the mesh
    (ops/routed_sharded.py) so multi-chip solves run the fast Pallas
    kernels per shard instead of falling back to the ELL layout."""
    import jax

    from ..models import mirror_prox as _mp
    from ..models import pdhg as _pdhg
    from ..ops.linops import ROUTED_NNZ_THRESHOLD
    from ..ops.routed_sharded import plan_routed_shards

    row_multiple = mesh.shape.get("dual", 1)
    col_multiple = mesh.shape.get("primal", 1)
    shard_plan = None
    nnz = problem.constraint_matrix.nnz
    use_routed = params.dtype == "float32" and (
        params.matrix_format == "routed"
        or (
            params.matrix_format == "auto"
            and nnz >= ROUTED_NNZ_THRESHOLD
            and jax.default_backend() == "tpu"
        )
    )
    if use_routed:
        shard_plan = plan_routed_shards(
            problem.num_constraints, problem.num_variables, nnz, mesh
        )
        # the strip grid must divide exactly across the mesh so vector
        # shard boundaries align with the block plans (no resharding
        # collectives around the matvecs).
        row_multiple = shard_plan.row_multiple
        col_multiple = shard_plan.col_multiple
    elif params.matrix_format == "routed":
        raise ValueError(
            "matrix_format='routed' requires dtype='float32' "
            "(the MXU has no f64)"
        )
    padded, m, n = pad_problem(problem, row_multiple, col_multiple)
    placement = make_placement(mesh)
    if isinstance(params, _pdhg.PdhgParameters):
        output = _pdhg.optimize(
            params, padded, _placement=placement, _shard_plan=shard_plan
        )
    elif isinstance(params, _mp.MirrorProxParameters):
        output = _mp.optimize(
            params, padded, _placement=placement, _shard_plan=shard_plan
        )
    else:
        raise TypeError(f"Unknown parameter type: {type(params)!r}")

    return SaddlePointOutput(
        primal_solution=np.asarray(output.primal_solution)[:n],
        dual_solution=np.asarray(output.dual_solution)[:m],
        termination_reason=output.termination_reason,
        termination_string=output.termination_string,
        iteration_count=output.iteration_count,
        iteration_stats=output.iteration_stats,
    )
