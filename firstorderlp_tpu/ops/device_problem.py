"""Device (JAX pytree) mirror of the host problem representation.

The solvers operate on immutable DeviceQp pytrees; a DeviceScaledQp bundles
the scaled problem (solver iterations) with the original problem and the
cumulative rescaling vectors (termination stats are always evaluated on the
unscaled original problem, reference src/iteration_stats_utils.jl:413-451).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..problem import QuadraticProgrammingProblem, ScaledQpProblem
from .linops import LinOp, build_linop, matvec, rmatvec


class DeviceQpCache(NamedTuple):
    """Norms of c and b of the original problem, cached once per solve
    (reference src/termination.jl:140-158). Kept as data (not static
    config) so vmapped batch solves can carry per-instance values."""

    l_inf_norm_primal_linear_objective: jax.Array
    l_inf_norm_primal_right_hand_side: jax.Array
    l2_norm_primal_linear_objective: jax.Array
    l2_norm_primal_right_hand_side: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DeviceQp:
    variable_lower_bound: jax.Array  # (n,)
    variable_upper_bound: jax.Array  # (n,)
    objective_vector: jax.Array  # (n,)
    objective_constant: jax.Array  # scalar
    right_hand_side: jax.Array  # (m,)
    is_equality: jax.Array  # (m,) bool; equality rows come first
    constraint_matrix: LinOp
    objective_matrix: Optional[LinOp]  # None for LPs (static)

    @property
    def num_variables(self) -> int:
        return self.variable_lower_bound.shape[-1]

    @property
    def num_constraints(self) -> int:
        return self.right_hand_side.shape[-1]

    @property
    def is_lp(self) -> bool:
        return self.objective_matrix is None

    # --- basic oracles -----------------------------------------------------

    def ax(self, x: jax.Array) -> jax.Array:
        return matvec(self.constraint_matrix, x)

    def aty(self, y: jax.Array) -> jax.Array:
        return rmatvec(self.constraint_matrix, y)

    def qx(self, x: jax.Array) -> jax.Array:
        if self.objective_matrix is None:
            return jnp.zeros_like(x)
        return matvec(self.objective_matrix, x)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DeviceScaledQp:
    scaled: DeviceQp
    original: DeviceQp
    constraint_rescaling: jax.Array  # (m,)
    variable_rescaling: jax.Array  # (n,)
    qp_cache: DeviceQpCache


def to_device(
    problem: QuadraticProgrammingProblem,
    dtype=jnp.float64,
    format: str = "auto",
    convert=None,
    share_from: "DeviceQp | None" = None,
    shard_plan=None,
) -> DeviceQp:
    """`convert` maps host arrays to leaves (default jnp.asarray); pass
    np.asarray to build a host-side mirror (used by batched stacking so
    the fleet transfers once after stacking, not once per instance).

    share_from: a DeviceQp over the same sparsity pattern (the scaled
    copy); when its constraint operator is routed, the new op reuses the
    donor's device index planes and transfers only values (host->device
    transfer dominates ingest on tunneled backends).

    shard_plan: RoutedShardPlan for multi-chip solves; applies to the
    CONSTRAINT matrix only (a quadratic objective's ('primal','primal')
    block structure does not fit the ('dual','primal') mesh and stays on
    the GSPMD-sharded ELL/dense layouts)."""
    if convert is None:
        convert = jnp.asarray
    np_dtype = np.dtype(jnp.dtype(dtype).name)
    m = problem.num_constraints
    is_equality = np.zeros(m, dtype=bool)
    is_equality[: problem.num_equalities] = True
    objective_matrix = (
        None
        if problem.objective_matrix.nnz == 0
        else build_linop(
            problem.objective_matrix, dtype, format, convert=convert
        )
    )

    def vec(v):
        return convert(np.asarray(v, np_dtype))

    constraint_op = None
    if share_from is not None and convert is jnp.asarray:
        from .routed import RoutedOp, build_routed_op
        from .routed_sharded import (
            RoutedShardPlan,
            ShardedRoutedOp,
            build_sharded_routed_op,
        )

        donor = share_from.constraint_matrix
        if isinstance(donor, RoutedOp) and jnp.dtype(dtype) == jnp.float32:
            try:
                constraint_op = build_routed_op(
                    problem.constraint_matrix, share_plan_with=donor
                )
            except ValueError:
                constraint_op = None  # pattern mismatch: build fresh
        elif isinstance(donor, ShardedRoutedOp) and (
            jnp.dtype(dtype) == jnp.float32
        ):
            try:
                constraint_op = build_sharded_routed_op(
                    problem.constraint_matrix,
                    RoutedShardPlan(
                        mesh=donor.mesh,
                        b2=donor.b2,
                        hr=donor.hr,
                        group_rows=donor.group_rows,
                    ),
                    share_plan_with=donor,
                )
            except ValueError:
                constraint_op = None  # plan mismatch: build fresh
    if constraint_op is None:
        constraint_op = build_linop(
            problem.constraint_matrix,
            dtype,
            format,
            convert=convert,
            shard_plan=shard_plan,
        )

    return DeviceQp(
        variable_lower_bound=vec(problem.variable_lower_bound),
        variable_upper_bound=vec(problem.variable_upper_bound),
        objective_vector=vec(problem.objective_vector),
        objective_constant=convert(
            np.asarray(problem.objective_constant, np_dtype)
        ),
        right_hand_side=vec(problem.right_hand_side),
        is_equality=convert(is_equality),
        constraint_matrix=constraint_op,
        objective_matrix=objective_matrix,
    )


def to_device_scaled(
    scaled_problem: ScaledQpProblem,
    dtype=jnp.float64,
    format: str = "auto",
    convert=None,
    stats_dtype=None,
    shard_plan=None,
    stats_format=None,
) -> DeviceScaledQp:
    """`stats_dtype` (default: `dtype`) is the precision of the ORIGINAL
    problem copy, the rescaling vectors and the norm cache - i.e. of the
    termination/stats evaluation. Split precision (dtype=float32,
    stats_dtype=float64) runs the hot loop at TPU-native fp32 while
    residuals/gaps are measured in f64 (emulated, but only every
    termination_evaluation_frequency iterations): unscaling promotes the
    iterates because the rescaling vectors are f64.

    `stats_format` (default: `format`) is the matrix layout of the
    ORIGINAL copy. The shape-bucketed campaign protocol pairs a
    "dense_onchip" f32 scaled layout (MXU hot loop) with a "coo" f64
    original (XLA's emulated-f64 dot_general materializes limb-plane
    temps - 12 GB at 16k x 16k - while gather+segment-sum f64 costs
    O(nnz))."""
    if convert is None:
        convert = jnp.asarray
    if stats_dtype is None:
        stats_dtype = dtype
    if stats_format is None:
        stats_format = format
    np_dtype = np.dtype(jnp.dtype(stats_dtype).name)
    c = np.asarray(scaled_problem.original_qp.objective_vector, np.float64)
    b = np.asarray(scaled_problem.original_qp.right_hand_side, np.float64)
    qp_cache = DeviceQpCache(
        l_inf_norm_primal_linear_objective=convert(
            np.asarray(np.max(np.abs(c)) if c.size else 0.0, np_dtype)
        ),
        l_inf_norm_primal_right_hand_side=convert(
            np.asarray(np.max(np.abs(b)) if b.size else 0.0, np_dtype)
        ),
        l2_norm_primal_linear_objective=convert(
            np.asarray(np.linalg.norm(c), np_dtype)
        ),
        l2_norm_primal_right_hand_side=convert(
            np.asarray(np.linalg.norm(b), np_dtype)
        ),
    )
    scaled_qp_device = to_device(
        scaled_problem.scaled_qp, dtype, format, convert,
        shard_plan=shard_plan,
    )
    return DeviceScaledQp(
        scaled=scaled_qp_device,
        original=to_device(
            scaled_problem.original_qp,
            stats_dtype,
            stats_format,
            convert,
            share_from=scaled_qp_device,
            shard_plan=shard_plan,
        ),
        constraint_rescaling=convert(
            np.asarray(scaled_problem.constraint_rescaling, np_dtype)
        ),
        variable_rescaling=convert(
            np.asarray(scaled_problem.variable_rescaling, np_dtype)
        ),
        qp_cache=qp_cache,
    )
